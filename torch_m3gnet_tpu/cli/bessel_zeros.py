"""Print the spherical-Bessel zeros table.

Parity with the reference's offline generator
(/root/reference/scripts/search_spherical_bessel_zeros.py:9-30), which emits
the hard-coded table in interaction.py. Here zeros are regenerated numerically
at first use (ops/basis.py); this CLI prints them for inspection.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--l-max", type=int, default=10)
    ap.add_argument("--n-max", type=int, default=10)
    args = ap.parse_args()

    from torch_m3gnet_tpu.ops.basis import spherical_bessel_zeros

    z = spherical_bessel_zeros(args.l_max, args.n_max)
    print(json.dumps(z.tolist()))


if __name__ == "__main__":
    main()

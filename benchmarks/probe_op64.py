"""Operating-point probe: is 64 graphs now faster per item than 32?

The fused factorized-stage default (round 5) shifted per-step cost
structure; this paired probe times the E/F/S step at the 32- and 64-graph
points back-to-back (alternating order, contention-filtered best) and
prints per-item rates. Adopt a new bench operating point only on a clear
(>15%) win — the headline metric is items/s/chip, and round 3 already
moved 8 -> 32 on the same grounds.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.quiet_ab import quiet_ab  # noqa: E402


def main(budget_s: float = 600.0) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/m3g_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model

    pot = build_model(M3GNetConfig())
    fns = {}
    items = {}
    for n in (32, 64):
        batch = build_batch(n_graphs=n)
        items[f"g{n}"] = int(np.asarray(batch.edge_mask).sum()) + int(
            np.asarray(batch.triplet_mask).sum()
        )
        if n == 32:
            params = pot.init(jax.random.PRNGKey(0), batch)

        def step(p, b, pot=pot):
            out = pot.apply(p, b)
            return out.energy, out.forces, out.stress

        fns[f"g{n}"] = (jax.jit(step), (params, batch))
        print(f"[probe] compiled g{n}", file=sys.stderr, flush=True)

    # quiet filter keys on the BASE (32-graph) variant: the two variants
    # have different intrinsic costs, so a min()-based filter would always
    # key on the cheap one and admit contended windows (review finding).
    report = quiet_ab(fns, budget_s=budget_s, quiet_ms=1.4, iters=6,
                      quiet_on="base")
    for name, v in report["variants"].items():
        v["items"] = items[name]
        v["best_rate_Bps"] = round(items[name] / v["best_ms"] / 1e6, 3)
        if v["quiet_median_ms"]:
            v["quiet_rate_Bps"] = round(
                items[name] / v["quiet_median_ms"] / 1e6, 3
            )
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 600.0)

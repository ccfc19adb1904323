"""A/B: fused factorized-stage Pallas kernels vs the XLA fm stage.

Both variants run fm layout + fuse_gated_second; the candidate adds
fused_factorized="on". Paired round-robin protocol at the 32-graph bench
point; prints one JSON object. NOTE: since round 5 the kernels are the
DEFAULT (fused_factorized="auto" on TPU+fm) — the decisive evidence came
from the contention-filtered protocol in benchmarks/quiet_ab.py, which
supersedes this fixed-length A/B inside contention epochs
(docs/benchmark.md round 5).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.abutil import paired_compare  # noqa: E402


def main(n_graphs: int = 32, windows: int = 40) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/m3g_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model

    batch = build_batch(n_graphs=n_graphs)
    variants = {
        # "off" pinned explicitly: the default is "auto" (-> on for TPU+fm)
        # since round 5, which would silently make both variants fused
        "xla_stage": M3GNetConfig(
            threebody_mode="factorized", layout="fm", fused_factorized="off"
        ),
        "fused_stage": M3GNetConfig(
            threebody_mode="factorized", layout="fm", fused_factorized="on"
        ),
    }
    fns = {}
    params = None
    for name, cfg in variants.items():
        pot = build_model(cfg)
        if params is None:
            params = pot.init(jax.random.PRNGKey(0), batch)

        def step(params, batch, pot=pot):
            out = pot.apply(params, batch)
            return out.energy, out.forces, out.stress

        fns[name] = (jax.jit(step), (params, batch))
        print(f"[ab] compiled {name}", file=sys.stderr, flush=True)

    results = paired_compare(fns, windows=windows, iters=8, idle_s=1.5,
                             verbose=True)
    print(json.dumps({
        "graphs": n_graphs,
        "results": results,
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 32,
        int(sys.argv[2]) if len(sys.argv) > 2 else 40,
    )

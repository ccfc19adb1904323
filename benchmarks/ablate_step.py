"""Stage attribution for the headline step by ablation on the real chip.

The shared-tunnel chip's ``jax.profiler`` emits deterministic cost-model
times (identical totals across captures — not measurements), so the real
per-stage breakdown is obtained by *ablation*: time model variants with
stages removed, interleaved idle-then-burst (see :mod:`abutil`), and
difference the medians.

Variants (default 32-graph bench batch):
  full        E+F+S step, f32, factorized three-body (the bench step — on
              TPU this resolves to the fm layout, the round-4+ default)
  conv_only   three-body stage dropped (skip_threebody)
  nb0         num_blocks=0: geometry + featurization + readout + VJP head
  energy_fwd  forward energy only (no force/stress VJP)
  em          full step in the entity-major layout (the contrast direction
              flipped in round 5: fm IS the default, em is the variant)
  bf16        compute_dtype=bfloat16

(The O(T) gather path is not a variant here: at the 32-graph operating point
it does not fit the time budget, and its contrast vs the factorized stage is
already recorded in docs/benchmark.md round-2/3 notes at 8 graphs.)

Derived bins: triplet stage = full - conv_only; conv blocks =
conv_only - nb0; fixed = nb0. Prints one JSON object.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.abutil import paired_compare  # noqa: E402


def main(n_graphs: int = 32) -> None:
    import jax

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.models.m3gnet import M3GNetPotential

    batch = build_batch(n_graphs=n_graphs)
    edges = int(np.asarray(batch.edge_mask).sum())
    triplets = int(np.asarray(batch.triplet_mask).sum())

    def make(kw=None, model_kw=None, energy_only=False):
        pot = build_model(M3GNetConfig(**(kw or {})))
        if model_kw:
            pot = M3GNetPotential(pot.model.clone(**model_kw))
        params = pot.init(jax.random.PRNGKey(0), batch)
        if energy_only:
            model = pot.model

            @jax.jit
            def step(params, batch):
                from torch_m3gnet_tpu.models.m3gnet import (
                    edge_vectors,
                    edge_vectors_fm,
                )

                # match the model's layout (fm is the TPU default since r4)
                ev = edge_vectors_fm if model.layout == "fm" else edge_vectors
                rv = ev(batch, jnp_pos(batch))
                total, _ = model.apply(params, batch, rv)
                return total

        else:

            @jax.jit
            def step(params, batch):
                out = pot.apply(params, batch)
                return out.energy, out.forces, out.stress

        return step, params

    def jnp_pos(b):
        import jax.numpy as jnp

        return jnp.asarray(b.positions)

    variants = {
        "full": dict(),
        "conv_only": dict(model_kw={"skip_threebody": True}),
        "nb0": dict(kw={"num_blocks": 0}),
        "energy_fwd": dict(energy_only=True),
        "em": dict(kw={"layout": "em", "threebody_mode": "factorized"}),
        "bf16": dict(kw={"compute_dtype": "bfloat16"}),
    }

    fns = {}
    for name, spec in variants.items():
        step, params = make(**spec)
        fns[name] = (step, (params, batch))
        print(f"[ablate] compiled {name}", file=sys.stderr, flush=True)

    results = paired_compare(fns, windows=14, iters=8, idle_s=1.5)
    med = {k: v["median_ms"] for k, v in results.items()}
    report = {
        "edges": edges,
        "triplets": triplets,
        "graphs": n_graphs,
        "device": str(jax.devices()[0]),
        "results": results,
        "derived_median_ms": {
            "triplet_stage": round(med["full"] - med["conv_only"], 4),
            "conv_blocks": round(med["conv_only"] - med["nb0"], 4),
            "fixed_geometry_readout": round(med["nb0"], 4),
            "force_stress_vjp": round(med["full"] - med["energy_fwd"], 4),
            "em_ratio": results["em"]["ratio_vs_first"],
            "bf16_ratio": results["bf16"]["ratio_vs_first"],
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)

"""On-chip microbenchmark: fused Pallas triplet stage vs XLA path.

Compares, at MPF scale (same workload as bench.py):
  1. the full potential step (E+F+S) with fused_triplets off vs on,
  2. the isolated triplet stage (forward and forward+VJP).

The chip is behind a shared tunnel; each timing takes the best of several
windows. Run: python benchmarks/bench_fused_triplet.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def best_of(fn, *args, iters=20, windows=5):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def main():
    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.ops.pallas_fused_triplet import (
        fused_triplet_gate_sum,
        reference_triplet_gate_sum,
    )

    batch = build_batch()
    E, T = batch.num_edges, batch.num_triplets
    ln = 9
    print(f"device={jax.devices()[0]}  E={E} T={T} ln={ln}")

    # --- isolated stage ---------------------------------------------------
    rng = np.random.default_rng(0)
    basis = jnp.asarray(
        (rng.standard_normal((ln, T)) * np.asarray(batch.triplet_mask)).astype(
            np.float32
        )
    )
    gate = jnp.asarray(rng.uniform(0, 1, (ln, E)).astype(np.float32))
    e1 = jnp.asarray(batch.triplet_e1, jnp.int32)
    e2 = jnp.asarray(batch.triplet_e2, jnp.int32)

    fused = jax.jit(lambda b, g: fused_triplet_gate_sum(b, g, e1, e2, E))
    xla = jax.jit(lambda b, g: reference_triplet_gate_sum(b, g, e1, e2, E))

    np.testing.assert_allclose(
        np.asarray(fused(basis, gate)), np.asarray(xla(basis, gate)),
        atol=2e-3, rtol=1e-4,
    )
    t_fused = best_of(fused, basis, gate)
    t_xla = best_of(xla, basis, gate)
    print(f"isolated fwd:        fused {t_fused*1e3:7.3f} ms   "
          f"xla {t_xla*1e3:7.3f} ms   ({t_xla/t_fused:.2f}x)")

    w = jnp.asarray(rng.standard_normal((ln, E)).astype(np.float32))
    fused_g = jax.jit(
        jax.grad(lambda b, g: jnp.sum(fused_triplet_gate_sum(b, g, e1, e2, E) * w),
                 argnums=(0, 1))
    )
    xla_g = jax.jit(
        jax.grad(lambda b, g: jnp.sum(reference_triplet_gate_sum(b, g, e1, e2, E) * w),
                 argnums=(0, 1))
    )
    t_fused = best_of(fused_g, basis, gate)
    t_xla = best_of(xla_g, basis, gate)
    print(f"isolated fwd+vjp:    fused {t_fused*1e3:7.3f} ms   "
          f"xla {t_xla*1e3:7.3f} ms   ({t_xla/t_fused:.2f}x)")

    # --- full model step --------------------------------------------------
    for mode in ("off", "on"):
        pot = build_model(M3GNetConfig(fused_triplets=mode))
        params = pot.init(jax.random.PRNGKey(0), batch)

        @jax.jit
        def step(params, batch):
            out = pot.apply(params, batch)
            return out.energy, out.forces, out.stress

        dt = best_of(step, params, batch)
        rate = (int(np.asarray(batch.edge_mask).sum())
                + int(np.asarray(batch.triplet_mask).sum())) / dt
        print(f"full E/F/S step [fused_triplets={mode}]: {dt*1e3:7.3f} ms  "
              f"({rate/1e6:.1f}M items/s)")


if __name__ == "__main__":
    main()

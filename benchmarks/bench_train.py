"""Full training-step throughput: loss + grad-of-grad + Adam update.

The headline ``bench.py`` measures potential *evaluation* (E/F/S). Training
additionally differentiates through the force/stress computation (second-
order) and applies the optimizer; this benchmark times that full update on
the same 32-graph workload and prints one JSON line with items/s and the
train:eval step ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/m3g_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import optax

    from bench import BASELINE_RATE, build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train.loop import loss_and_metrics, make_optimizer

    config = M3GNetConfig()
    batch = build_batch(n_graphs=32)
    rng = np.random.default_rng(0)
    # synthetic targets so the full E+F+S loss is exercised
    nb = batch.num_graphs
    batch = batch.replace(
        energy=(-3.0 * np.asarray(batch.n_node)).astype(np.float32),
        forces=(0.1 * rng.standard_normal((batch.num_nodes, 3))).astype(np.float32),
        stress=(0.01 * rng.standard_normal((nb, 6))).astype(np.float32),
    )
    real_edges = int(np.asarray(batch.edge_mask).sum())
    real_triplets = int(np.asarray(batch.triplet_mask).sum())

    pot = build_model(config)
    params = pot.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(config)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            loss, metrics = loss_and_metrics(pot, p, batch, config)
            return loss, metrics

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    params, opt_state, loss = train_step(params, opt_state, batch)
    jax.block_until_ready(loss)

    windows = []
    deadline = time.time() + 240.0
    while len(windows) < 8 or (time.time() < deadline and len(windows) < 60):
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = train_step(params, opt_state, batch)
        jax.block_until_ready(loss)
        windows.append((time.perf_counter() - t0) / iters)
        time.sleep(2.0)
    dt = min(windows)

    rate = (real_edges + real_triplets) / dt
    print(
        json.dumps(
            {
                "metric": "edges+triplets/sec/chip (train step: E/F/S loss + grad-of-grad + Adam)",
                "value": round(rate, 1),
                "unit": "items/s",
                "vs_eval_baseline": round(rate / BASELINE_RATE, 3),
                "detail": {
                    "edges": real_edges,
                    "triplets": real_triplets,
                    "graphs": 32,
                    "step_ms": round(dt * 1e3, 3),
                    "loss": float(loss),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

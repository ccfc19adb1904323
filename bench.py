"""Headline benchmark: edges+triplets processed per second per chip.

Workload: full potential evaluation (energy + forces + stress via jax.grad,
f32, default 227k-param M3GNet) on an MPF-scale padded batch of perturbed
fcc-Cu supercells, jit-compiled, steady-state timed on the real chip.

The batch is the throughput-optimal operating point (32 x 108-atom cells,
~147k edges + ~1.06M triplets): the round-1/2 8-cell batch finishes in
~0.4 ms where fixed per-step costs dominate; at 4x the graphs the step is
only ~2.5x longer (measured round 3), so items/s/chip — the metric — rises
~1.6x. The baseline stays the round-1 number at its own operating point:
vs_baseline therefore tracks end-to-end chip throughput on the task, which
is what a production trainer sees.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``BASELINE_RATE`` is the round-1 XLA-segment-sum implementation on one v5e
chip (the reference publishes no numbers — SURVEY.md §6); vs_baseline tracks
speedups across rounds against that fixed point.

The detail object carries the disaggregated numbers (ADVICE r3):
- ``same_op_rate`` / ``vs_baseline_same_op``: the 8-graph operating point the
  round-1 baseline was measured at, so round-over-round kernel-level
  improvement is separated from the ~1.9x batch-size scaling in the headline;
- ``train_*``: full training-step throughput (loss + grad-of-grad + Adam
  update at the 32-graph point) and the train:eval step-time ratio — a
  training framework bench that only times inference is half a number.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 measured rate (edges+triplets)/s, one v5e chip, XLA segment_sum path
# (36,706 edges + 264,384 triplets in 1.973 ms incl. forces+stress).
BASELINE_RATE = 152_582_832.7


def build_batch(n_graphs: int = 8, n_cells: int = 3, seed: int = 0):
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.data.structure import Structure

    rng = np.random.default_rng(seed)
    a = 3.62
    base = Structure.from_frac_coords(
        np.eye(3) * a,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29, 29, 29, 29],
    ).supercell((n_cells, n_cells, n_cells))
    structures = [
        Structure(
            base.lattice,
            base.cart_coords + 0.05 * rng.standard_normal(base.cart_coords.shape),
            base.atomic_numbers,
        )
        for _ in range(n_graphs)
    ]
    return pack_structures(structures, 5.0, 4.0, pad_multiple=512)


def _best_window(run_burst, budget_s: float, iters: int, min_windows: int = 6,
                 max_windows: int = 90, extend_if_above_s: float | None = None,
                 extend_budget_s: float = 0.0) -> float:
    """Idle-then-burst timing protocol (docs/benchmark.md): the shared-tunnel
    chip sees minute-scale contention epochs (up to ~50x) and throttles
    sustained submission ~10x, so spread short bursts over the budget and
    take the best per-iteration time.

    ``extend_if_above_s``: when every window of the base budget stays above
    this per-iteration floor (a known-quiet reference time x margin), the
    run landed inside a contention epoch — keep sampling for up to
    ``extend_budget_s`` more in the hope of a quiet gap, stopping early the
    moment a window beats the floor (round-5 protocol note: a 45-minute
    epoch yielded exactly one quiet window)."""
    import jax

    windows = []

    def one_window(idle_s: float):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run_burst()
        jax.block_until_ready(out)
        windows.append((time.perf_counter() - t0) / iters)
        time.sleep(idle_s)

    deadline = time.time() + budget_s
    while len(windows) < min_windows or (
        time.time() < deadline and len(windows) < max_windows
    ):
        one_window(2.0)
    if extend_if_above_s is not None and min(windows) > extend_if_above_s:
        hard = time.time() + extend_budget_s
        while time.time() < hard and min(windows) > extend_if_above_s:
            one_window(1.5)
    return min(windows)


def _items(batch) -> int:
    return int(np.asarray(batch.edge_mask).sum()) + int(
        np.asarray(batch.triplet_mask).sum()
    )


def main() -> None:
    import os

    import jax

    # Persistent compile cache: TPU compiles go through a remote service
    # (1-5 min); caching makes repeat bench runs start in seconds.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/m3g_jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model

    batch = build_batch(n_graphs=32)
    real_edges = int(np.asarray(batch.edge_mask).sum())
    real_triplets = int(np.asarray(batch.triplet_mask).sum())

    pot = build_model(M3GNetConfig())
    params = pot.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def step(params, batch):
        out = pot.apply(params, batch)
        return out.energy, out.forces, out.stress

    # --- headline: E/F/S eval at the 32-graph operating point -------------
    jax.block_until_ready(step(params, batch))  # compile + warmup
    # quiet floor ~0.89-0.93 ms (rounds 4-5); 1.25 ms = floor x ~1.35 margin
    dt = _best_window(lambda: step(params, batch), budget_s=240.0, iters=8,
                      min_windows=8, extend_if_above_s=1.25e-3,
                      extend_budget_s=360.0)
    rate = (real_edges + real_triplets) / dt
    vs = rate / BASELINE_RATE if BASELINE_RATE else 1.0

    # --- same-operating-point rate (8 graphs, where round 1 measured) ------
    batch8 = build_batch(n_graphs=8)
    jax.block_until_ready(step(params, batch8))
    dt8 = _best_window(lambda: step(params, batch8), budget_s=60.0, iters=16)
    rate8 = _items(batch8) / dt8

    # --- training-step throughput (loss + grad-of-grad + Adam update) ------
    import tempfile

    import jax.numpy as jnp

    from torch_m3gnet_tpu.train.loop import Trainer

    rng = np.random.default_rng(7)
    nb = batch.positions.shape[0]
    train_batch = batch.replace(
        energy=(-3.5 * np.asarray(batch.n_node)).astype(np.float32),
        forces=rng.standard_normal((nb, 3)).astype(np.float32) * 0.1,
        stress=rng.standard_normal((batch.lattice.shape[0], 6)).astype(np.float32)
        * 0.01,
    )
    trainer = Trainer(
        pot, M3GNetConfig(batch_size=32), log_dir=tempfile.mkdtemp()
    )
    state = trainer.init_state(jax.random.PRNGKey(0), train_batch)
    lr = jnp.asarray(1e-3)

    def train_burst():
        nonlocal state
        state, metrics = trainer.train_step(state, train_batch, lr)
        return state.params

    jax.block_until_ready(train_burst())  # compile + warmup
    # train quiet floor ~2.07 ms (round 4)
    dt_train = _best_window(train_burst, budget_s=120.0, iters=8,
                            extend_if_above_s=2.8e-3, extend_budget_s=240.0)
    train_rate = (real_edges + real_triplets) / dt_train

    print(
        json.dumps(
            {
                "metric": "edges+triplets/sec/chip (fwd+forces+stress, f32)",
                "value": round(rate, 1),
                "unit": "items/s",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "edges": real_edges,
                    "triplets": real_triplets,
                    "graphs": int(np.asarray(batch.graph_mask).sum()),
                    "step_ms": round(dt * 1e3, 3),
                    "same_op_rate": round(rate8, 1),
                    "vs_baseline_same_op": round(rate8 / BASELINE_RATE, 3),
                    "same_op_step_ms": round(dt8 * 1e3, 3),
                    "train_step_ms": round(dt_train * 1e3, 3),
                    "train_rate": round(train_rate, 1),
                    "train_to_eval_ratio": round(dt_train / dt, 3),
                    "layout": pot.model.layout,
                    "fused_factorized_stage": bool(
                        pot.model.fused_factorized_stage
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

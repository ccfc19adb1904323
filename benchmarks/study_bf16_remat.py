"""Training-quality and memory/perf study: bf16 compute and triplet remat.

Protocol (self-consistent teacher-student, no external datasets in this image):
a frozen random default-size M3GNet produces E/F/S targets for perturbed
fcc-Cu supercells; a fresh model is trained on them under each option set, and
the converged train-set force RMSE / energy MAE quantify the accuracy cost of
the option (the task is noise-free, so residual error isolates the numerics).

Run: python benchmarks/study_bf16_remat.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def make_data(n=8, cells=2, seed=0):
    from torch_m3gnet_tpu.data.graph import graph_from_structure
    from torch_m3gnet_tpu.data.structure import Structure

    rng = np.random.default_rng(seed)
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    ).supercell((cells, cells, cells))
    structures = [
        Structure(
            base.lattice,
            base.cart_coords + 0.06 * rng.standard_normal(base.cart_coords.shape),
            base.atomic_numbers,
        )
        for _ in range(n)
    ]
    return [graph_from_structure(s, 5.0, 4.0) for s in structures]


def teacher_targets(graphs, config):
    from torch_m3gnet_tpu.data.graph import batch_graphs, pad_batch, round_up
    from torch_m3gnet_tpu.models import build_model

    pot = build_model(config)
    out = []
    params = None
    for g in graphs:
        b = pad_batch(
            g,
            round_up(g.num_nodes + 1, 128),
            round_up(g.num_edges + 1, 128),
            round_up(g.num_triplets + 1, 128),
            1,
        )
        if params is None:
            params = pot.init(jax.random.PRNGKey(7), b)
        o = pot.apply(params, b)
        n = g.num_nodes
        out.append(
            g.replace(
                energy=np.asarray(o.energy[:1]),
                forces=np.asarray(o.forces[:n]),
                stress=np.asarray(o.stress[:1]),
            )
        )
    return out


def run_case(name, config, graphs, steps=400):
    from torch_m3gnet_tpu.data.graph import batch_graphs, pad_batch, round_up
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train import Trainer

    cat = batch_graphs(graphs)
    batch = pad_batch(
        cat,
        round_up(cat.num_nodes + 1, 128),
        round_up(cat.num_edges + 1, 128),
        round_up(cat.num_triplets + 1, 128),
        cat.num_graphs,
    )
    pot = build_model(config)
    trainer = Trainer(pot, config)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # warm up + time steady-state steps
    state, m = trainer.train_step(state, batch, config.learning_rate)
    jax.block_until_ready(m["loss"])
    best_dt = 1e9
    t_all0 = time.time()
    for i in range(steps):
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, batch, config.learning_rate)
        jax.block_until_ready(m["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    metrics = trainer.evaluate(state.params, [batch])
    print(
        f"{name:26s} loss={float(m['loss']):.3e}  "
        f"F_rmse={metrics['forces_rmse']:.4e} eV/A  "
        f"E_mae={metrics['energy_mae']:.4e} eV/atom  "
        f"best_step={best_dt*1e3:.2f} ms  wall={time.time()-t_all0:.0f}s"
    )
    return metrics


def main():
    from torch_m3gnet_tpu.config import M3GNetConfig

    base = M3GNetConfig(learning_rate=2e-3, stress_weight=0.0)
    graphs = teacher_targets(make_data(), base)
    print(f"device={jax.devices()[0]}")
    r_f32 = run_case("f32", base, graphs)
    r_bf16 = run_case("bf16 compute", base.replace(compute_dtype="bfloat16"), graphs)
    r_remat = run_case("f32 + remat_triplets", base.replace(remat_triplets=True), graphs)
    r_hi = run_case("f32 highest matmul", base.replace(matmul_precision="highest"), graphs)
    print(
        "\nbf16 force-RMSE penalty vs f32: "
        f"{r_bf16['forces_rmse'] / max(r_f32['forces_rmse'], 1e-12):.2f}x"
    )


if __name__ == "__main__":
    main()

"""Training-dynamics parity vs the LIVE torch reference (VERDICT r4 #1).

Forward/E/F/S parity with mapped weights was pinned at machine epsilon in
round 4 (benchmarks/parity_vs_reference.py --weights-parity); this harness
closes the remaining accuracy-parity gap: do the two stacks *optimize* the
same way?

Protocol (all f64, CPU, corrected-chi mode on both sides):

1. Build the reference's real ``LitM3GNet`` (litmodule.py:27-192 executed
   unmodified via utils/reference_shims.install_training_shims) at f64 from a
   fixed torch seed, and map its init state dict into our flax tree
   (benchmarks/parity_vs_reference.map_reference_state_dict) — identical init.
2. Train BOTH stacks full-batch on the committed synthetic-mlearn fixture
   (tests/fixtures/synthetic_mlearn_Cu) for N epochs with identical
   hyperparameters: the reference side runs its own ``_loss_fn``
   (litmodule.py:123-166) + ``configure_optimizers`` (real torch
   Adam(eps=1e-7) + CosineAnnealingLR stepped per epoch,
   litmodule.py:168-183); ours runs Trainer.train_step (train/loop.py).
   One batch per epoch makes per-step == per-epoch, so data order is moot.
   Each step feeds torch's *actual* scheduler lr into our step and separately
   checks it against our closed-form cosine (train/loop.py:112-117).
3. Compare per-step loss trajectories (E/F/S components), final parameters,
   and final test-set E/F/S MAEs.

Result (recorded round 5, benchmarks/train_dynamics_r05.json): the two
optimization trajectories agree at machine epsilon — per-step loss relative
deltas ~3e-16 over 60 steps, final parameters to ~1e-16, identical final test
MAEs. The stacks are not just forward-parity equal; they are the same
optimization process. tests/test_train_dynamics.py pins a shorter run.

(Found and fixed en route: ``map_reference_state_dict`` must deep-copy —
``tensor.numpy()`` views live torch parameter storage and JAX's CPU
device_put is zero-copy for aligned f64, so mapped flax params silently
tracked torch ``optimizer.step()`` mutations.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "fixtures", "synthetic_mlearn_Cu")


def run(steps: int = 60, lr: float = 1e-3, decay_steps: int = 100,
        verbose: bool = True) -> dict:
    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from benchmarks.parity_vs_reference import map_reference_state_dict
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import batch_graphs, graph_from_structure, pad_batch
    from torch_m3gnet_tpu.data.io import load_mlearn_json
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train.elemental import fit_elemental_energies
    from torch_m3gnet_tpu.train.loop import Trainer, TrainState, cosine_annealing_lr
    from torch_m3gnet_tpu.utils.reference_shims import (
        build_reference_litmodule,
        reference_blackboard_batched,
    )

    cfg = M3GNetConfig(
        l_max=2, n_max=3, embedding_dim=16, num_blocks=2,
        cutoff=4.0, threebody_cutoff=3.0,
        learning_rate=lr, decay_steps=decay_steps, stress_weight=0.1,
        fused_triplets="off",
    )
    assert steps <= decay_steps, (
        "keep steps <= decay_steps: past T_max torch's recursive "
        "CosineAnnealingLR diverges from the closed form"
    )

    def load(split):
        structs = load_mlearn_json(os.path.join(FIXTURE, f"{split}.json"))
        return [
            graph_from_structure(s, cfg.cutoff, cfg.threebody_cutoff, dtype=np.float64)
            for s in structs
        ]

    train_graphs, test_graphs = load("training"), load("test")
    elemental, scale = fit_elemental_energies(train_graphs, cfg.num_types)

    # --- reference stack: the real LitM3GNet at f64, fixed seed -------------
    lit = build_reference_litmodule(cfg, elemental, scale, seed=0)
    # nn/featurizer.py:91 allocates forward-time temporaries at the *current*
    # default dtype, so the whole training loop runs under f64 default —
    # restored at the end (this run() executes inside the shared pytest
    # process; leaking an f64 default would silently change later torch code).
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        return _run_inner(
            torch, jax, jnp, cfg, lit, steps, verbose,
            train_graphs, test_graphs, elemental, scale,
        )
    finally:
        torch.set_default_dtype(prev_dtype)


def _run_inner(torch, jax, jnp, cfg, lit, steps, verbose,
               train_graphs, test_graphs, elemental, scale):
    from benchmarks.parity_vs_reference import map_reference_state_dict
    from torch_m3gnet_tpu.data.graph import batch_graphs, pad_batch
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train.loop import Trainer, TrainState, cosine_annealing_lr
    from torch_m3gnet_tpu.utils.reference_shims import reference_blackboard_batched

    sd = {k: v.detach().cpu().numpy() for k, v in lit.model.state_dict().items()}
    (optimizer,), (scheduler,) = lit.configure_optimizers()

    bb_train = reference_blackboard_batched(train_graphs, cfg.threebody_cutoff)
    bb_test = reference_blackboard_batched(test_graphs, cfg.threebody_cutoff)
    n_train, n_test = len(train_graphs), len(test_graphs)

    def fresh(bb):
        # _loss_fn mutates the blackboard and Gradient toggles requires_grad
        # on pos (nn/gradient.py:27,37) — give every step fresh leaves.
        return {k: (v.clone() if torch.is_tensor(v) and v.is_floating_point() else v)
                for k, v in bb.items()}

    # --- our stack: identical mapped init -----------------------------------
    pot = build_model(
        cfg, elemental_energies=list(map(float, elemental)), energy_scale=scale,
        matmul_precision="highest", stress_mode="virial",
    )
    mapped = map_reference_state_dict(sd, cfg.num_blocks)
    params = {"params": jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), mapped)}

    trainer = Trainer(pot, cfg, log_dir="/tmp/train_dynamics_logs")
    state = TrainState(params=params, opt_state=trainer.opt.init(params))

    def pad1(graphs):
        cat = batch_graphs(graphs)
        return pad_batch(cat, cat.num_nodes + 1, cat.num_edges + 1,
                         cat.num_triplets + 1, cat.num_graphs + 1)

    batch_train, batch_test = pad1(train_graphs), pad1(test_graphs)

    # --- identical-schedule training loop ------------------------------------
    rows = []
    max_rel = {"loss": 0.0, "energy_loss": 0.0, "forces_loss": 0.0,
               "stresses_loss": 0.0}
    max_lr_err = 0.0
    for epoch in range(steps):
        lr_t = float(optimizer.param_groups[0]["lr"])
        lr_ours = cosine_annealing_lr(epoch, cfg.learning_rate, cfg.decay_steps,
                                      cfg.decay_alpha)
        max_lr_err = max(max_lr_err, abs(lr_t - lr_ours) / lr_t)

        metrics_t = lit._loss_fn(fresh(bb_train), n_train)
        optimizer.zero_grad()
        metrics_t["loss"].backward()
        optimizer.step()
        scheduler.step()

        state, metrics_j = trainer.train_step(state, batch_train, jnp.asarray(lr_t))

        row = {"epoch": epoch, "lr": lr_t}
        for k in max_rel:
            a = float(metrics_t[k].detach())
            b = float(metrics_j[k])
            rel = abs(a - b) / max(abs(a), 1e-300)
            max_rel[k] = max(max_rel[k], rel)
            row[f"{k}_ref"], row[f"{k}_ours"], row[f"{k}_rel"] = a, b, rel
        rows.append(row)
        if verbose and (epoch < 3 or (epoch + 1) % 10 == 0):
            print(f"step {epoch:3d}  lr={lr_t:.6f}  "
                  f"loss ref={row['loss_ref']:.12e} ours={row['loss_ours']:.12e} "
                  f"rel={row['loss_rel']:.3e}")

    # --- final parameter agreement -------------------------------------------
    sd_final = {k: v.detach().cpu().numpy() for k, v in lit.model.state_dict().items()}
    mapped_final = map_reference_state_dict(sd_final, cfg.num_blocks)
    p_rel = 0.0
    flat_ours = jax.tree_util.tree_leaves_with_path(state.params["params"])
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree.map(jnp.asarray, mapped_final)))
    for path, ours in flat_ours:
        ref = flat_ref[path]
        denom = max(float(jnp.abs(ref).max()), 1e-12)
        p_rel = max(p_rel, float(jnp.abs(ours - ref).max()) / denom)

    # --- final test metrics (grad stays on: forces need autograd) -------------
    metrics_t_test = lit._loss_fn(fresh(bb_test), n_test)
    metrics_j_test = trainer.eval_step(state.params, batch_test)
    final = {}
    for k in ("energy_mae", "forces_mae", "stresses_mae", "loss"):
        final[f"{k}_ref"] = float(metrics_t_test[k].detach())
        final[f"{k}_ours"] = float(metrics_j_test[k])

    result = {
        "steps": steps,
        "max_rel": max_rel,
        "max_lr_closed_form_rel_err": max_lr_err,
        "final_param_max_rel": p_rel,
        "final_test": final,
        "first_step_loss_rel": rows[0]["loss_rel"],
        "last_step_loss_rel": rows[-1]["loss_rel"],
        "rows": rows,
    }
    if verbose:
        print(json.dumps({k: v for k, v in result.items() if k != "rows"},
                         indent=2))
    return result


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--decay-steps", type=int, default=100)
    ap.add_argument("--out", default=None, help="write full JSON (incl. rows)")
    args = ap.parse_args()
    result = run(args.steps, args.lr, args.decay_steps)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print("wrote", args.out)
    ok = (result["max_rel"]["loss"] < 1e-10
          and result["first_step_loss_rel"] < 1e-12
          and result["final_param_max_rel"] < 1e-10)
    print("train-dynamics parity:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

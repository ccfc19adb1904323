"""Stage attribution for the TRAIN step (VERDICT r4 #4).

bench.py's headline is the E/F/S *evaluation* step; production throughput is
the training step: loss + grad-of-grad through the force/stress VJP + Adam.
BENCH_r04 recorded train 2.067 ms vs eval 0.926 ms (2.23x). This benchmark
attributes that gap by ablation (the tunnel profiler is a cost model — see
docs/benchmark.md), timing jitted train-step variants with pieces removed,
interleaved idle-then-burst with order alternation (:mod:`abutil`):

  full       E+F+S loss, value_and_grad, Adam update (the production step)
  eval       E/F/S evaluation only (bench.py's step; no param grad)
  ef         E+F loss (stress term omitted — its grad-of-grad ablated)
  e_only     energy-only loss: FIRST-order training (no grad-of-grad at all)
  no_adam    full loss/grads, optimizer replaced by a trivial axpy
  remat      full with remat_triplets=True (recompute vs store in the bwd)

(Buffer donation is not a variant: the timing loop re-feeds the same arrays,
which donation invalidates; at 227k params the update traffic is ~1 MB/step
— noise at HBM bandwidth.)

Derived bins (median ms):
  grad-of-grad through forces = full - e_only - (force fwd cost ~ eval - e_fwd)
  stress second-order         = full - ef
  optimizer                   = full - no_adam
  train:eval                  = full / eval

Prints one JSON object.
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
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/m3g_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import optax

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train.loop import make_optimizer

    config = M3GNetConfig()
    batch = build_batch(n_graphs=n_graphs)
    rng = np.random.default_rng(0)
    nb = batch.num_graphs
    batch = batch.replace(
        energy=(-3.0 * np.asarray(batch.n_node)).astype(np.float32),
        forces=(0.1 * rng.standard_normal((batch.num_nodes, 3))).astype(np.float32),
        stress=(0.01 * rng.standard_normal((nb, 6))).astype(np.float32),
    )
    edges = int(np.asarray(batch.edge_mask).sum())
    triplets = int(np.asarray(batch.triplet_mask).sum())

    tx = make_optimizer(config)

    def masked_mse(pred, target, mask):
        diff = (pred - target) ** 2 * mask
        denom = jnp.maximum(mask.sum() * (pred.size / mask.size), 1.0)
        return diff.sum() / denom

    # The batch MUST flow through the jitted step as a traced ARGUMENT, never
    # a closure: closed-over numpy arrays become XLA constants and the whole
    # geometry/basis pipeline (a pure function of the batch) constant-folds
    # at compile time — a first draft of this benchmark timed "train" steps
    # faster than eval that way.
    def make_loss(pot, use_f, use_s):
        def loss_fn(p, b):
            out = pot.apply(p, b)
            gmask = jnp.asarray(b.graph_mask, jnp.float32)
            n_node = jnp.maximum(jnp.asarray(b.n_node), 1).astype(jnp.float32)
            loss = config.energy_weight * masked_mse(
                out.energy / n_node, jnp.asarray(b.energy) / n_node, gmask
            )
            if use_f:
                nmask = jnp.asarray(b.node_mask, jnp.float32)[:, None]
                loss = loss + config.force_weight * masked_mse(
                    out.forces, jnp.asarray(b.forces), nmask
                )
            if use_s:
                loss = loss + config.stress_weight * masked_mse(
                    out.stress, jnp.asarray(b.stress), gmask[:, None]
                )
            return loss

        return loss_fn

    def make_energy_only_loss(pot):
        # first-order: energy through the model forward only (no E/F/S head)
        from torch_m3gnet_tpu.models.m3gnet import edge_vectors, edge_vectors_fm

        model = pot.model
        ev = edge_vectors_fm if model.layout == "fm" else edge_vectors

        def loss_fn(p, b):
            rv = ev(b, jnp.asarray(b.positions))
            total, _ = model.apply(p, b, rv)
            gmask = jnp.asarray(b.graph_mask, jnp.float32)
            n_node = jnp.maximum(jnp.asarray(b.n_node), 1).astype(jnp.float32)
            return masked_mse(
                total / n_node, jnp.asarray(b.energy) / n_node, gmask
            )

        return loss_fn

    def make_step(loss_fn, adam=True):
        def step(params, opt_state, batch_):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch_)
            )(params)
            if adam:
                updates, opt_state2 = tx.update(grads, opt_state, params)
                params2 = optax.apply_updates(params, updates)
            else:
                # trivial axpy stand-in: grads consumed, Adam math ablated
                params2 = jax.tree.map(lambda p, g: p - 1e-9 * g, params, grads)
                opt_state2 = opt_state
            return params2, opt_state2, loss

        return jax.jit(step)

    pot = build_model(config)
    params0 = pot.init(jax.random.PRNGKey(0), batch)
    opt0 = tx.init(params0)

    pot_remat = build_model(config.replace(remat_triplets=True))

    @jax.jit
    def eval_step(params, opt_state, batch_):
        out = pot.apply(params, batch_)
        return params, opt_state, out.energy.sum() + out.forces.sum() + out.stress.sum()

    fns = {
        "full": (make_step(make_loss(pot, True, True)), None),
        "eval": (eval_step, None),
        "ef": (make_step(make_loss(pot, True, False)), None),
        "e_only": (make_step(make_energy_only_loss(pot)), None),
        "no_adam": (make_step(make_loss(pot, True, True), adam=False), None),
        "remat": (make_step(make_loss(pot_remat, True, True)), None),
    }

    compiled = {}
    for name, (step, _) in fns.items():
        compiled[name] = (step, (params0, opt0, batch))
        print(f"[ablate_train] compiled {name}", file=sys.stderr, flush=True)

    results = paired_compare(compiled, windows=14, iters=6, idle_s=1.5)
    med = {k: v["median_ms"] for k, v in results.items()}
    report = {
        "edges": edges,
        "triplets": triplets,
        "graphs": n_graphs,
        "device": str(jax.devices()[0]),
        "results": results,
        "derived_median_ms": {
            "train_vs_eval_ratio": round(med["full"] / med["eval"], 3),
            "second_order_total": round(med["full"] - med["e_only"], 4),
            "stress_second_order": round(med["full"] - med["ef"], 4),
            "adam_math": round(med["full"] - med["no_adam"], 4),
            "remat_ratio": results["remat"]["ratio_vs_first"],
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)

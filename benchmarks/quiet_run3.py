"""Round-5 combined quiet-window sweep: fused-stage fate + train ablation.

One variant set so every quiet window informs BOTH open questions
(VERDICT r4 #4/#5): eval and train steps with the fused factorized-stage
kernels on/off, plus the first-order (energy-only) and remat train
variants. Appends rows to the pooled file for cross-run analysis
(quiet_ab.pooled_report).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.quiet_ab import quiet_ab  # noqa: E402


def main(budget_s: float, rows_out: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/m3g_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.models.m3gnet import edge_vectors, edge_vectors_fm
    from torch_m3gnet_tpu.train.loop import Trainer

    batch = build_batch(n_graphs=32)
    rng = np.random.default_rng(7)
    train_batch = batch.replace(
        energy=(-3.5 * np.asarray(batch.n_node)).astype(np.float32),
        forces=(0.1 * rng.standard_normal((batch.num_nodes, 3))).astype(np.float32),
        stress=(0.01 * rng.standard_normal((batch.num_graphs, 6))).astype(np.float32),
    )
    lr = jnp.asarray(1e-3)
    fns = {}

    def add_eval(name, cfg):
        pot = build_model(cfg)
        params = pot.init(jax.random.PRNGKey(0), batch)

        def step(p, b, pot=pot):
            out = pot.apply(p, b)
            return out.energy, out.forces, out.stress

        fns[name] = (jax.jit(step), (params, batch))

    def add_train(name, cfg):
        pot = build_model(cfg)
        trainer = Trainer(pot, cfg, log_dir=tempfile.mkdtemp())
        state = trainer.init_state(jax.random.PRNGKey(0), train_batch)
        fns[name] = (trainer.train_step, (state, train_batch, lr))

    def add_train_first_order(name, cfg):
        # energy-only loss straight through the model forward: no
        # force/stress VJP in the loss, so the param grad is FIRST order
        pot = build_model(cfg)
        model = pot.model
        ev = edge_vectors_fm if model.layout == "fm" else edge_vectors

        def loss_fn(p, b):
            rv = ev(b, jnp.asarray(b.positions))
            total, _ = model.apply(p, b, rv)
            n_node = jnp.maximum(jnp.asarray(b.n_node), 1).astype(jnp.float32)
            gmask = jnp.asarray(b.graph_mask, jnp.float32)
            d = (total / n_node - jnp.asarray(b.energy) / n_node) ** 2 * gmask
            return d.sum() / jnp.maximum(gmask.sum(), 1.0)

        @jax.jit
        def step(params, b):
            # return the grads too: a discarded grad output would let XLA
            # dead-code-eliminate the whole backward pass and this variant
            # would time a forward-only evaluation (review finding)
            loss, grads = jax.value_and_grad(lambda p: loss_fn(p, b))(params)
            return loss, grads

        params = pot.init(jax.random.PRNGKey(0), train_batch)
        fns[name] = (step, (params, train_batch))

    # fused_factorized defaults to "auto" (-> ON for TPU+fm) since the
    # round-5 flip: the XLA baseline must pin "off" explicitly or this A/B
    # silently compares fused vs fused. (The recorded round-5 evidence runs
    # predate the flip and measured the true contrast.)
    base = M3GNetConfig(fused_factorized="off")
    fused = M3GNetConfig(fused_factorized="on", layout="fm",
                         threebody_mode="factorized")
    add_eval("eval_xla", base)
    add_eval("eval_fused", fused)
    add_train("train_xla", base)
    add_train("train_fused", fused)
    add_train_first_order("train_e1st", base)
    add_train("train_remat", M3GNetConfig(remat_triplets=True))
    for n in fns:
        print(f"[run3] compiled {n}", file=sys.stderr, flush=True)

    report = quiet_ab(fns, budget_s=budget_s, quiet_ms=1.4, rows_out=rows_out)
    report["device"] = str(jax.devices()[0])
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(
        float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0,
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/quiet_run3_rows.jsonl",
    )

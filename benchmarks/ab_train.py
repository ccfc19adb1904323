"""A/B the full TRAINING step (loss + grad-of-grad + Adam) across precision
and remat variants at the bench operating point. Paired alternating-order
round-robin (abutil); prints one JSON object."""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.abutil import paired_compare  # noqa: E402


def main(n_graphs: int = 32, windows: int = 40) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/m3g_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train.loop import Trainer

    batch = build_batch(n_graphs=n_graphs)
    rng = np.random.default_rng(7)
    nb = batch.positions.shape[0]
    train_batch = batch.replace(
        energy=(-3.5 * np.asarray(batch.n_node)).astype(np.float32),
        forces=rng.standard_normal((nb, 3)).astype(np.float32) * 0.1,
        stress=rng.standard_normal((batch.lattice.shape[0], 6)).astype(np.float32)
        * 0.01,
    )

    variants = {
        "f32": M3GNetConfig(batch_size=n_graphs),
        "bf16": M3GNetConfig(batch_size=n_graphs, compute_dtype="bfloat16"),
        "f32_remat": M3GNetConfig(batch_size=n_graphs, remat_triplets=True),
        "bf16_remat": M3GNetConfig(
            batch_size=n_graphs, compute_dtype="bfloat16", remat_triplets=True
        ),
    }
    fns = {}
    lr = jnp.asarray(1e-3)
    for name, cfg in variants.items():
        pot = build_model(cfg)
        trainer = Trainer(pot, cfg, log_dir=tempfile.mkdtemp())
        state = trainer.init_state(jax.random.PRNGKey(0), train_batch)
        # time the Trainer's own jitted step directly (a second jit wrapper
        # measured ~50x slower through the tunnel — dispatch pathology)
        fns[name] = (trainer.train_step, (state, train_batch, lr))
        print(f"[ab] compiled {name}", file=sys.stderr, flush=True)

    results = paired_compare(fns, windows=windows, iters=6, idle_s=1.5,
                             verbose=True)
    print(json.dumps({
        "graphs": n_graphs, "results": results,
        "device": str(jax.devices()[0]),
    }, indent=1))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 32,
        int(sys.argv[2]) if len(sys.argv) > 2 else 40,
    )

"""Worker process for the 2-process jax.distributed smoke test.

Launched by tests/test_distributed.py with JAX_PLATFORMS=cpu and the axon
site dir stripped from PYTHONPATH (the plugin's sitecustomize imports jax at
interpreter startup, freezing the platform choice before any script code
runs). Runs one REAL data-parallel training step over a 2-process global
mesh: torch_m3gnet_tpu.parallel.distributed.initialize + global_mesh +
host_local_to_global + DataParallel.train_step.
"""

import sys

import numpy as np


def main() -> int:
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from torch_m3gnet_tpu.parallel.distributed import (
        global_mesh,
        host_local_to_global,
        initialize,
    )

    initialize(coordinator_address=coordinator, num_processes=n_proc, process_id=pid)

    import jax

    assert jax.process_count() == n_proc, jax.process_count()
    mesh = global_mesh("dp")
    assert mesh.devices.size == n_proc * len(jax.local_devices())

    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.data.structure import Structure
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.parallel import DataParallel, shard_stack

    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )

    def shard(seed):
        r = np.random.default_rng(seed)
        s = Structure(
            base.lattice,
            base.cart_coords + 0.03 * r.standard_normal((4, 3)),
            base.atomic_numbers,
        )
        b = pack_structures(
            [s], 4.5, 4.0, max_nodes=16, max_edges=256, max_triplets=2048, max_graphs=1
        )
        return b.replace(
            energy=np.full(b.num_graphs, -14.0, dtype=np.float32),
            forces=np.zeros((b.num_nodes, 3), dtype=np.float32),
            stress=np.zeros((b.num_graphs, 6), dtype=np.float32),
        )

    # host-local shards: each process contributes different data
    local = [shard(100 * pid + i) for i in range(len(jax.local_devices()))]
    stacked_local = shard_stack(local)
    global_batch = host_local_to_global(mesh, stacked_local)

    cfg = M3GNetConfig(
        l_max=2, n_max=2, embedding_dim=8, num_blocks=1, fused_triplets="off"
    )
    pot = build_model(cfg)
    dp = DataParallel(pot, cfg, mesh)
    # identical seed on every process -> replicated params
    state = dp.init_state(jax.random.PRNGKey(0), stacked_local)
    state, metrics = dp.train_step(state, global_batch, 1e-3)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"DIST_OK pid={pid} procs={jax.process_count()} loss={loss:.8f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

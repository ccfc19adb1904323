"""Multi-host initialization helpers.

The reference has no distributed support; here multi-host runs use JAX's
standard bootstrap: every host calls :func:`initialize`, then builds a global
mesh over ``jax.devices()`` (all hosts' chips). Data loading stays host-local:
each host feeds only the dp shards that live on its own chips
(``jax.local_devices()``); :func:`host_local_to_global` assembles the global
sharded batch from those per-host pieces.

Smoke-tested with a real 2-process ``jax.distributed`` CPU job (gloo
collectives) in tests/test_distributed.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or standard env vars.

    Env fallbacks: COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID (also the
    TPU pod runtime auto-detects when no args are given).
    """
    kwargs = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    npr = num_processes or os.environ.get("NUM_PROCESSES")
    if npr:
        kwargs["num_processes"] = int(npr)
    pid = process_id if process_id is not None else os.environ.get("PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_name: str = "dp"):
    """1-D mesh over every chip in the job (all hosts)."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


def host_local_to_global(mesh, batch, axis_name: str = "dp"):
    """Assemble a globally-sharded batch from each host's local dp shards.

    Every host passes the stacked batch for ITS OWN devices (leading axis =
    len(jax.local_devices())); the result is one global jax.Array pytree whose
    leading axis spans all hosts' devices — ready for the shard_map'd
    DataParallel step functions.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, batch)

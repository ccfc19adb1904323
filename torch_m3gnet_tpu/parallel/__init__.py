from torch_m3gnet_tpu.parallel.mesh import make_mesh
from torch_m3gnet_tpu.parallel.dp import (
    DataParallel,
    shard_stack,
    unshard,
)
from torch_m3gnet_tpu.parallel.graph_shard import (
    GraphParallelPotential,
    GraphParallelTrainer,
    halo_stats,
    partition_graph,
    stack_partitions,
)

__all__ = [
    "make_mesh",
    "DataParallel",
    "shard_stack",
    "unshard",
    "GraphParallelPotential",
    "GraphParallelTrainer",
    "halo_stats",
    "partition_graph",
    "stack_partitions",
]

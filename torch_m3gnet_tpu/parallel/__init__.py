from torch_m3gnet_tpu.parallel.mesh import make_mesh
from torch_m3gnet_tpu.parallel.dp import (
    DataParallel,
    shard_stack,
    unshard,
)

__all__ = ["make_mesh", "DataParallel", "shard_stack", "unshard"]

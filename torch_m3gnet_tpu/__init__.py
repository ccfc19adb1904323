"""torch_m3gnet_tpu: a TPU-native (JAX/XLA/Pallas) framework for M3GNet-family
universal interatomic potentials.

Built from scratch with the capability surface of the reference
``lan496/torch-m3gnet`` (PyTorch+PyG), re-designed TPU-first:

- immutable, statically-shaped padded :class:`~torch_m3gnet_tpu.data.graph.GraphBatch`
  pytrees instead of a mutable PyG blackboard graph,
- pure-functional model built on ``flax.linen`` with all aggregation as
  (Pallas-accelerated) segment ops,
- energies, forces and stresses via ``jax.grad`` through the jitted model,
- data/graph-level parallelism over a ``jax.sharding.Mesh``.
"""

from torch_m3gnet_tpu.config import M3GNetConfig

__version__ = "0.1.0"

__all__ = ["M3GNetConfig", "__version__"]

from torch_m3gnet_tpu.models.ensemble import EnsemblePotential, stack_params
from torch_m3gnet_tpu.models.layers import GatedMLP
from torch_m3gnet_tpu.models.m3gnet import (
    M3GNet,
    M3GNetPotential,
    PotentialOutput,
    build_model,
    edge_vectors,
)

__all__ = ["EnsemblePotential", "GatedMLP", "M3GNet", "M3GNetPotential", "PotentialOutput", "build_model", "stack_params"]

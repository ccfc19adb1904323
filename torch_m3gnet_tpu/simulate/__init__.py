from torch_m3gnet_tpu.simulate.relax import FireConfig, relax_structures

__all__ = ["FireConfig", "relax_structures"]

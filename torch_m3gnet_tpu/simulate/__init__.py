from torch_m3gnet_tpu.simulate.md import MDConfig, MDResult, run_md
from torch_m3gnet_tpu.simulate.relax import FireConfig, relax_structures

__all__ = ["FireConfig", "relax_structures", "MDConfig", "MDResult", "run_md"]

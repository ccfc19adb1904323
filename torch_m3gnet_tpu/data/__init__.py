from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.data.graph import GraphBatch, graph_from_structure, batch_graphs
from torch_m3gnet_tpu.data.neighborlist import neighbor_list_pbc
from torch_m3gnet_tpu.data.triplets import compute_threebody

__all__ = [
    "Structure",
    "GraphBatch",
    "graph_from_structure",
    "batch_graphs",
    "neighbor_list_pbc",
    "compute_threebody",
]

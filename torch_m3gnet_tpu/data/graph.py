"""Immutable, statically-shaped crystal-graph batches.

TPU-first redesign of the reference's mutable PyG ``MaterialGraph`` blackboard
(/root/reference/src/torch_m3gnet/data/material_graph.py:14-165): instead of a
``Data`` object that every layer mutates in place, a :class:`GraphBatch` is a
frozen pytree of padded arrays with explicit validity masks. All shapes are
static so the whole model jits once per bucket; PyG's ``__inc__`` index
offsetting (material_graph.py:122-130) happens once at pack time in
:func:`batch_graphs`.

Index/mask conventions:
- padded nodes/edges/triplets have index 0 entries and mask 0; every scatter
  multiplies by the mask so padding contributes exactly zero,
- padded edges get distance ``cutoff`` (not 0) downstream so r-division is safe,
- padded graphs get the identity lattice (volume 1) so stress division is safe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from flax import struct

from torch_m3gnet_tpu.data.neighborlist import neighbor_list_pbc
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.data.triplets import compute_threebody


@struct.dataclass
class GraphBatch:
    """A batch of periodic crystal graphs as one padded pytree.

    Shapes: N = padded nodes, E = padded edges, T = padded triplets,
    B = padded graphs. ``Array`` entries may be numpy (host) or jax arrays.
    """

    # nodes
    positions: np.ndarray  # (N, 3) f32 cartesian, Angstrom
    atom_types: np.ndarray  # (N,) i32, 0-indexed Z
    node_graph: np.ndarray  # (N,) i32 graph id of each node
    node_mask: np.ndarray  # (N,) bool

    # edges: r_ij = pos[dst] + shift @ lattice[graph] - pos[src]
    edge_src: np.ndarray  # (E,) i32
    edge_dst: np.ndarray  # (E,) i32
    edge_cell_shift: np.ndarray  # (E, 3) f32 integer-valued
    edge_mask: np.ndarray  # (E,) bool

    # triplets: ordered pairs of edges sharing a source node
    triplet_e1: np.ndarray  # (T,) i32 edge id of i->j
    triplet_e2: np.ndarray  # (T,) i32 edge id of i->k
    triplet_mask: np.ndarray  # (T,) bool

    # graphs
    lattice: np.ndarray  # (B, 3, 3) f32 row-wise
    graph_mask: np.ndarray  # (B,) bool
    n_node: np.ndarray  # (B,) i32 real nodes per graph

    # optional targets
    energy: Optional[np.ndarray] = None  # (B,) f32 total energy, eV
    forces: Optional[np.ndarray] = None  # (N, 3) f32 eV/Angstrom
    stress: Optional[np.ndarray] = None  # (B, 6) f32 Voigt [xx,yy,zz,yz,zx,xy], eV/A^3

    # hoisted indexing: node k = edge_dst[triplet_e2], precomputed at pack
    # time (an XLA int gather at T scale costs ~8 ms/step on v5e otherwise)
    triplet_node_k: Optional[np.ndarray] = None  # (T,) i32

    # graph-parallel halo plan (set by parallel.graph_shard.partition_graph;
    # see ops/halo.py). When present, edge_dst / triplet_node_k hold
    # *extended-local* ids in [0, nps + H).
    halo_send_idx: Optional[np.ndarray] = None  # (n_offsets*Hp,) i32 per shard
    halo_recv_idx: Optional[np.ndarray] = None  # (H,) i32 per shard

    # static metadata (not traced)
    # ring offsets of the halo plan (one ppermute each; shard-invariant)
    halo_offsets: tuple = struct.field(pytree_node=False, default=())
    num_graphs_real: int = struct.field(pytree_node=False, default=0)

    @property
    def num_nodes(self) -> int:
        return int(self.positions.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.edge_src.shape[0])

    @property
    def num_triplets(self) -> int:
        return int(self.triplet_e1.shape[0])

    @property
    def num_graphs(self) -> int:
        return int(self.lattice.shape[0])


def graph_from_structure(
    structure: Structure,
    cutoff: float,
    threebody_cutoff: float,
    dtype=np.float32,
) -> GraphBatch:
    """Build a single (unpadded) graph from a crystal structure.

    Mirrors ``MaterialGraph.from_structure``
    (/root/reference/src/torch_m3gnet/data/material_graph.py:132-165): full PBC
    neighbor list at ``cutoff``, triplets among edges within
    ``threebody_cutoff``, 0-indexed atomic numbers.
    """
    if threebody_cutoff > cutoff:
        raise ValueError("threebody_cutoff must be <= cutoff")
    edge_index, shift, dist = neighbor_list_pbc(
        structure.lattice, structure.cart_coords, cutoff
    )
    n = len(structure)
    tei, _, _ = compute_threebody(n, edge_index, dist, threebody_cutoff)

    props = structure.properties
    energy = props.get("energy")
    forces = props.get("forces")
    stress = props.get("stress")
    if forces is not None:
        # catch stale per-atom targets early (e.g. a forces array carried
        # across a cell-size change) — downstream it would surface only as a
        # shape mismatch deep inside batch stacking
        fsize = np.asarray(forces).size
        if fsize != 3 * n:
            raise ValueError(
                f"forces target has {fsize // 3 if fsize % 3 == 0 else fsize / 3} "
                f"rows for a {n}-atom structure"
            )

    return GraphBatch(
        positions=structure.cart_coords.astype(dtype),
        atom_types=(structure.atomic_numbers - 1).astype(np.int32),
        node_graph=np.zeros(n, dtype=np.int32),
        node_mask=np.ones(n, dtype=bool),
        edge_src=edge_index[0].astype(np.int32),
        edge_dst=edge_index[1].astype(np.int32),
        edge_cell_shift=shift.astype(dtype),
        edge_mask=np.ones(edge_index.shape[1], dtype=bool),
        triplet_e1=tei[0].astype(np.int32),
        triplet_e2=tei[1].astype(np.int32),
        triplet_mask=np.ones(tei.shape[1], dtype=bool),
        triplet_node_k=edge_index[1][tei[1]].astype(np.int32),
        lattice=structure.lattice.astype(dtype)[None],
        graph_mask=np.ones(1, dtype=bool),
        n_node=np.array([n], dtype=np.int32),
        energy=None if energy is None else np.asarray([energy], dtype=dtype),
        forces=None if forces is None else np.asarray(forces, dtype=dtype),
        stress=None
        if stress is None
        else np.asarray(stress, dtype=dtype).reshape(1, 6),
        num_graphs_real=1,
    )


def _all_or_none(graphs: Sequence[GraphBatch], attr: str) -> bool:
    vals = [getattr(g, attr) is not None for g in graphs]
    if all(vals):
        return True
    if not any(vals):
        return False
    raise ValueError(f"Inconsistent presence of target '{attr}' across graphs")


def batch_graphs(graphs: Sequence[GraphBatch]) -> GraphBatch:
    """Concatenate graphs into one batch, offsetting edge/triplet indices.

    The index bookkeeping matches PyG's ``__inc__`` semantics
    (material_graph.py:122-130): edge endpoints offset by the node count,
    triplet edge ids offset by the edge count of preceding graphs.
    """
    node_off = 0
    edge_off = 0
    graph_off = 0
    cols: dict[str, list] = {k: [] for k in (
        "positions", "atom_types", "node_graph", "node_mask",
        "edge_src", "edge_dst", "edge_cell_shift", "edge_mask",
        "triplet_e1", "triplet_e2", "triplet_mask", "triplet_node_k",
        "lattice", "graph_mask", "n_node", "energy", "forces", "stress",
    )}
    has_e = _all_or_none(graphs, "energy")
    has_f = _all_or_none(graphs, "forces")
    has_s = _all_or_none(graphs, "stress")

    for g in graphs:
        cols["positions"].append(g.positions)
        cols["atom_types"].append(g.atom_types)
        cols["node_graph"].append(g.node_graph + graph_off)
        cols["node_mask"].append(g.node_mask)
        cols["edge_src"].append(g.edge_src + node_off)
        cols["edge_dst"].append(g.edge_dst + node_off)
        cols["edge_cell_shift"].append(g.edge_cell_shift)
        cols["edge_mask"].append(g.edge_mask)
        cols["triplet_e1"].append(g.triplet_e1 + edge_off)
        cols["triplet_e2"].append(g.triplet_e2 + edge_off)
        cols["triplet_mask"].append(g.triplet_mask)
        cols["triplet_node_k"].append(
            (g.triplet_node_k if g.triplet_node_k is not None
             else np.asarray(g.edge_dst)[np.asarray(g.triplet_e2)]) + node_off
        )
        cols["lattice"].append(g.lattice)
        cols["graph_mask"].append(g.graph_mask)
        cols["n_node"].append(g.n_node)
        if has_e:
            cols["energy"].append(g.energy)
        if has_f:
            cols["forces"].append(g.forces)
        if has_s:
            cols["stress"].append(g.stress)
        node_off += g.num_nodes
        edge_off += g.num_edges
        graph_off += g.num_graphs

    cat = {k: (np.concatenate(v) if v else None) for k, v in cols.items()}
    return GraphBatch(
        **{k: v for k, v in cat.items()},
        num_graphs_real=sum(g.num_graphs_real for g in graphs),
    )


def cast_batch(batch: GraphBatch, dtype) -> GraphBatch:
    """Cast the floating-point fields of a batch (e.g. to f64 for FD tests)."""
    import numpy as _np

    def cast(a):
        if a is not None and _np.issubdtype(_np.asarray(a).dtype, _np.floating):
            return _np.asarray(a, dtype=dtype)
        return a

    return GraphBatch(
        positions=cast(batch.positions),
        atom_types=batch.atom_types,
        node_graph=batch.node_graph,
        node_mask=batch.node_mask,
        edge_src=batch.edge_src,
        edge_dst=batch.edge_dst,
        edge_cell_shift=cast(batch.edge_cell_shift),
        edge_mask=batch.edge_mask,
        triplet_e1=batch.triplet_e1,
        triplet_e2=batch.triplet_e2,
        triplet_mask=batch.triplet_mask,
        triplet_node_k=batch.triplet_node_k,
        halo_send_idx=batch.halo_send_idx,
        halo_recv_idx=batch.halo_recv_idx,
        halo_offsets=batch.halo_offsets,
        lattice=cast(batch.lattice),
        graph_mask=batch.graph_mask,
        n_node=batch.n_node,
        energy=cast(batch.energy),
        forces=cast(batch.forces),
        stress=cast(batch.stress),
        num_graphs_real=batch.num_graphs_real,
    )


def triplet_counts(batch: GraphBatch) -> tuple[np.ndarray, np.ndarray]:
    """Per-node / per-edge triplet counts, recovered from the batch arrays.

    Schema parity with the reference's ``num_triplet_i`` / ``num_triplet_ij``
    graph attributes (/root/reference/src/torch_m3gnet/data/material_graph.py:
    91-106 and :196-254) — unused by the model in both codebases, so they are
    derived on demand instead of being carried as pytree fields:

    - ``num_triplet_i[n]``  = triplets whose center (source) node is n
      (= d*(d-1) for full neighbor lists within the 3-body cutoff);
    - ``num_triplet_ij[e]`` = triplets whose FIRST edge is e (the reference's
      convention: d(src)-1 for edges within the 3-body cutoff, 0 otherwise).

    Padded triplets are excluded; shapes are the (padded) N and E.
    """
    e1 = np.asarray(batch.triplet_e1)[np.asarray(batch.triplet_mask, bool)]
    num_edges = np.asarray(batch.edge_src).shape[-1]
    num_nodes = np.asarray(batch.positions).shape[-2]
    num_triplet_ij = np.bincount(e1, minlength=num_edges)
    num_triplet_i = np.bincount(
        np.asarray(batch.edge_src)[e1], minlength=num_nodes
    )
    return num_triplet_i, num_triplet_ij


def round_up(x: int, multiple: int) -> int:
    if multiple <= 1:
        return max(x, 1)
    return max(multiple, ((x + multiple - 1) // multiple) * multiple)


def pad_batch(
    batch: GraphBatch,
    max_nodes: int,
    max_edges: int,
    max_triplets: int,
    max_graphs: int,
) -> GraphBatch:
    """Pad a concatenated batch to static bucket sizes with zeroed masks."""
    n, e, t, b = batch.num_nodes, batch.num_edges, batch.num_triplets, batch.num_graphs
    if n > max_nodes or e > max_edges or t > max_triplets or b > max_graphs:
        raise ValueError(
            f"batch ({n} nodes, {e} edges, {t} triplets, {b} graphs) exceeds bucket "
            f"({max_nodes}, {max_edges}, {max_triplets}, {max_graphs})"
        )
    pn, pe, pt, pb = max_nodes - n, max_edges - e, max_triplets - t, max_graphs - b

    def pad0(a, count, axis=0):
        if count == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, count)
        return np.pad(a, widths)

    lattice = pad0(batch.lattice, pb)
    if pb:
        lattice[b:] = np.eye(3, dtype=lattice.dtype)

    def pad_last(a, count, value):
        """Pad an index field with ``value`` so sorted ids STAY sorted —
        the Pallas sorted-segment kernels rely on monotone ids; padded rows
        carry masked-zero data so their target segment is mathematically
        irrelevant."""
        if count == 0:
            return a
        return np.concatenate([a, np.full(count, value, dtype=a.dtype)])

    return GraphBatch(
        positions=pad0(batch.positions, pn),
        atom_types=pad0(batch.atom_types, pn),
        node_graph=pad_last(batch.node_graph, pn, max_graphs - 1),
        node_mask=pad0(batch.node_mask, pn),
        edge_src=pad_last(batch.edge_src, pe, max_nodes - 1),
        edge_dst=pad0(batch.edge_dst, pe),
        edge_cell_shift=pad0(batch.edge_cell_shift, pe),
        edge_mask=pad0(batch.edge_mask, pe),
        triplet_e1=pad_last(batch.triplet_e1, pt, max_edges - 1),
        triplet_e2=pad0(batch.triplet_e2, pt),
        triplet_mask=pad0(batch.triplet_mask, pt),
        triplet_node_k=None
        if batch.triplet_node_k is None
        else pad0(batch.triplet_node_k, pt),
        lattice=lattice,
        graph_mask=pad0(batch.graph_mask, pb),
        n_node=pad0(batch.n_node, pb),
        energy=None if batch.energy is None else pad0(batch.energy, pb),
        forces=None if batch.forces is None else pad0(batch.forces, pn),
        stress=None if batch.stress is None else pad0(batch.stress, pb),
        num_graphs_real=batch.num_graphs_real,
    )


def pack_structures(
    structures: Sequence[Structure],
    cutoff: float,
    threebody_cutoff: float,
    max_nodes: int | None = None,
    max_edges: int | None = None,
    max_triplets: int | None = None,
    max_graphs: int | None = None,
    pad_multiple: int = 128,
    dtype=np.float32,
) -> GraphBatch:
    """Structures -> graphs -> concatenated -> padded batch in one call."""
    graphs = [graph_from_structure(s, cutoff, threebody_cutoff, dtype=dtype) for s in structures]
    cat = batch_graphs(graphs)
    return pad_batch(
        cat,
        max_nodes or round_up(cat.num_nodes + 1, pad_multiple),
        max_edges or round_up(cat.num_edges + 1, pad_multiple),
        max_triplets or round_up(cat.num_triplets + 1, pad_multiple),
        max_graphs or cat.num_graphs,
    )

"""Vectorized three-body (triplet) index enumeration (host side, numpy).

Capability parity with the reference's ``compute_threebody``
(/root/reference/src/torch_m3gnet/data/material_graph.py:196-254), which is a
pure-Python O(T) triple loop re-implementing the original m3gnet Cython
``_threebody_indices.pyx``. Here the enumeration is fully vectorized
(O(T) numpy, no Python loop) and the source-grouping invariant is *explicit*:
edges are sorted by source node before pair expansion instead of assuming
provider ordering and inferring degrees from in-degree bincounts
(the fragile invariant flagged at material_graph.py:229-248).

A triplet t = (e1, e2) is an **ordered** pair of distinct edges sharing a
source node i, both within ``threebody_cutoff``:
edge_index[:, e1] = [i, j], edge_index[:, e2] = [i, k] -> triplet (i; j, k),
with the angle measured at i. Per node of 3-body degree d there are d*(d-1)
triplets.
"""

from __future__ import annotations

import numpy as np


def compute_threebody(
    num_nodes: int,
    edge_index: np.ndarray,
    distances: np.ndarray,
    threebody_cutoff: float,
    use_native: bool | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Enumerate ordered same-source edge pairs within the 3-body cutoff.

    Dispatches to the C++ enumerator (native/neighbor.cpp: m3g_threebody,
    ~40x the vectorized numpy path at T~600k — the dominant host cost of
    MD/relaxation neighbor-list rebuilds) when the toolchain is available;
    identical output order either way. ``use_native=False`` forces numpy.

    Args:
        num_nodes: N.
        edge_index: (2, E) int rows [src, dst].
        distances: (E,) edge lengths.
        threebody_cutoff: inclusive cutoff selecting edges that participate.

    Returns:
        (triplet_edge_index, num_triplet_i, num_triplet_ij):
        triplet_edge_index (2, T) int64 — rows [e1, e2], indices into the FULL
        edge list; num_triplet_i (N,) — triplets per node (= d*(d-1));
        num_triplet_ij (E,) — triplets per edge as e1 (= d(src)-1 for
        participating edges, 0 otherwise).
    """
    edge_index = np.asarray(edge_index)
    distances = np.asarray(distances)
    num_edges = edge_index.shape[1]

    if use_native is None or use_native:
        from torch_m3gnet_tpu import native

        if native.native_available():
            return native.threebody_native(
                num_nodes, edge_index, distances, threebody_cutoff
            )
        if use_native:
            raise RuntimeError("native threebody requested but unavailable")

    valid = distances <= threebody_cutoff
    valid_ids = np.nonzero(valid)[0]  # indices into the full edge list
    vsrc = edge_index[0, valid_ids]

    # Explicit grouping: stable-sort participating edges by source node.
    order = np.argsort(vsrc, kind="stable")
    valid_ids = valid_ids[order]
    vsrc = vsrc[order]

    deg = np.bincount(vsrc, minlength=num_nodes).astype(np.int64)
    num_triplet_i = deg * (deg - 1)
    total = int(num_triplet_i.sum())

    num_triplet_ij = np.zeros(num_edges, dtype=np.int64)
    num_triplet_ij[valid_ids] = deg[vsrc] - 1

    if total == 0:
        return np.zeros((2, 0), dtype=np.int64), num_triplet_i, num_triplet_ij

    # Vectorized ordered-pair expansion. For a node of degree d, local pair
    # p in [0, d*(d-1)) maps to (j, k) = (p // (d-1), q + (q >= p // (d-1)))
    # with q = p % (d-1) — i.e. k runs over all slots except j.
    node_of_t = np.repeat(np.arange(num_nodes), num_triplet_i)  # (T,)
    t_starts = np.cumsum(num_triplet_i) - num_triplet_i  # (N,)
    p = np.arange(total) - t_starts[node_of_t]  # local pair index
    d_t = deg[node_of_t]
    j = p // (d_t - 1)
    q = p % (d_t - 1)
    k = q + (q >= j)

    e_starts = np.cumsum(deg) - deg  # first participating-edge slot per node
    base = e_starts[node_of_t]
    e1 = valid_ids[base + j]
    e2 = valid_ids[base + k]

    return np.stack([e1, e2]).astype(np.int64), num_triplet_i, num_triplet_ij

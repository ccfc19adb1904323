"""PBC neighbor list (host side, vectorized numpy).

TPU-native replacement for the reference's pymatgen-backed
``get_all_neighbors_with_cell_shifts``
(/root/reference/src/torch_m3gnet/data/material_graph.py:168-193): a *full*
(directed, both i->j and j->i) neighbor list with integer periodic-image
shifts, returned **sorted by source node** so triplet enumeration can rely on
explicit source-contiguous grouping (the reference depends on this ordering
implicitly; we make it a guaranteed invariant).

Algorithm: bounded periodic-image search. The number of images required along
lattice direction ``a_i`` is ``ceil(cutoff / h_i)`` where ``h_i`` is the
interplanar spacing of the {a_j, a_k} plane family; distances are then computed
for all (i, j, image) combinations in chunks (O(N^2 * images) but fully
vectorized — fine for the dataset-scale structures this path serves; huge
supercells use the cell-list path in ``neighborlist_cpp``).
"""

from __future__ import annotations

import numpy as np


def _image_bounds(lattice: np.ndarray, cutoff: float) -> np.ndarray:
    """Number of periodic images needed per lattice direction.

    ``h_i = 1 / |row_i(inv(A)^T)|`` is the spacing between lattice planes
    orthogonal to reciprocal vector ``b_i``; any neighbor within ``cutoff`` of
    an atom in the home cell lies within ``ceil(cutoff / h_i)`` images (+1 for
    atoms sitting anywhere inside the cell).
    """
    recip = np.linalg.inv(lattice).T  # rows are b_i with a_i . b_j = delta_ij
    h = 1.0 / np.linalg.norm(recip, axis=1)
    return np.ceil(cutoff / h).astype(np.int64) + 1


def neighbor_list_pbc(
    lattice: np.ndarray,
    cart_coords: np.ndarray,
    cutoff: float,
    chunk_size: int = 4_000_000,
    use_native: bool | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full directed neighbor list under periodic boundary conditions.

    Args:
        lattice: (3, 3) row-wise lattice matrix.
        cart_coords: (N, 3) cartesian positions (need not be wrapped).
        cutoff: inclusive distance cutoff.
        chunk_size: max number of candidate pairs per vectorized block.

    Returns:
        (edge_index, edge_cell_shift, distances):
        edge_index (2, E) int64 rows [src, dst], sorted by src (stable);
        edge_cell_shift (E, 3) int64 with r_ij = pos[dst] + shift @ lattice - pos[src];
        distances (E,) float64.
    """
    lattice = np.asarray(lattice, dtype=np.float64)
    pos = np.asarray(cart_coords, dtype=np.float64)
    n = pos.shape[0]

    # The C++ cell-list path is O(N); the vectorized numpy path is O(N^2 * S)
    # but has lower constant overhead for tiny cells. Auto-switch at 48 atoms.
    if use_native is None:
        use_native = n >= 48
    if use_native:
        from torch_m3gnet_tpu import native

        if native.native_available():
            return native.neighbor_list_native(lattice, pos, cutoff)
    if n == 0:
        return (
            np.zeros((2, 0), dtype=np.int64),
            np.zeros((0, 3), dtype=np.int64),
            np.zeros((0,), dtype=np.float64),
        )

    nmax = _image_bounds(lattice, cutoff)
    ranges = [np.arange(-m, m + 1) for m in nmax]
    shifts = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1).reshape(-1, 3)
    shift_cart = shifts @ lattice  # (S, 3)
    s = shifts.shape[0]

    srcs, dsts, shs, dists = [], [], [], []
    # Chunk over source atoms to bound peak memory at ~chunk_size pairs.
    rows_per_chunk = max(1, chunk_size // (n * s))
    for i0 in range(0, n, rows_per_chunk):
        i1 = min(n, i0 + rows_per_chunk)
        # diff[a, j, t] = pos[j] + shift[t] - pos[i0+a]
        diff = (
            pos[None, :, None, :] + shift_cart[None, None, :, :] - pos[i0:i1, None, None, :]
        )  # (A, N, S, 3)
        d = np.sqrt(np.sum(diff * diff, axis=-1))  # (A, N, S)
        mask = d <= cutoff
        # drop self-pairs in the home cell (distance exactly 0)
        mask &= d > 1e-8
        a_idx, j_idx, t_idx = np.nonzero(mask)
        srcs.append(a_idx + i0)
        dsts.append(j_idx)
        shs.append(shifts[t_idx])
        dists.append(d[a_idx, j_idx, t_idx])

    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    sh = np.concatenate(shs)
    dist = np.concatenate(dists)

    # Deterministic order: by (src, dst, shift) — src-major grouping guaranteed.
    order = np.lexsort((sh[:, 2], sh[:, 1], sh[:, 0], dst, src))
    edge_index = np.stack([src[order], dst[order]])
    return edge_index, sh[order].astype(np.int64), dist[order]

"""Graph construction tests.

Carries over the reference's analytic checks
(/root/reference/tests/test_data.py:10-23): fcc gives 12 neighbors and
12*11 = 132 triplets per atom, bcc gives 8 and 8*7 = 56; plus new invariants
for the padded/batched representation the reference has no counterpart for.
"""

import numpy as np
import pytest

from tests.conftest import first_nn_cutoff
from torch_m3gnet_tpu.data.graph import (
    batch_graphs,
    graph_from_structure,
    pad_batch,
    pack_structures,
)
from torch_m3gnet_tpu.data.neighborlist import neighbor_list_pbc
from torch_m3gnet_tpu.data.triplets import compute_threebody


def test_fcc_neighbor_and_triplet_counts(al_fcc):
    cutoff = first_nn_cutoff(al_fcc)
    edge_index, shift, dist = neighbor_list_pbc(al_fcc.lattice, al_fcc.cart_coords, cutoff)
    n = len(al_fcc)
    assert edge_index.shape[1] == 12 * n
    tei, n_t_i, n_t_ij = compute_threebody(n, edge_index, dist, cutoff)
    assert tei.shape[1] == 132 * n
    np.testing.assert_array_equal(n_t_i, np.full(n, 132))
    np.testing.assert_array_equal(n_t_ij, np.full(12 * n, 11))


def test_bcc_neighbor_and_triplet_counts(na_bcc):
    cutoff = first_nn_cutoff(na_bcc)
    edge_index, shift, dist = neighbor_list_pbc(na_bcc.lattice, na_bcc.cart_coords, cutoff)
    n = len(na_bcc)
    assert edge_index.shape[1] == 8 * n
    tei, n_t_i, _ = compute_threebody(n, edge_index, dist, cutoff)
    assert tei.shape[1] == 56 * n
    np.testing.assert_array_equal(n_t_i, np.full(n, 56))


def test_neighbor_list_is_symmetric_and_consistent(tio2_rutile):
    """Full directed list: for every i->j @ s there is j->i @ -s, same distance."""
    s = tio2_rutile
    edge_index, shift, dist = neighbor_list_pbc(s.lattice, s.cart_coords, 4.0)
    fwd = {
        (int(a), int(b), tuple(v)): d
        for a, b, v, d in zip(edge_index[0], edge_index[1], shift, dist)
    }
    for (a, b, v), d in fwd.items():
        back = (b, a, tuple(-x for x in v))
        assert back in fwd
        assert abs(fwd[back] - d) < 1e-10
    # distances agree with explicit reconstruction
    r = (
        s.cart_coords[edge_index[1]]
        + shift @ s.lattice
        - s.cart_coords[edge_index[0]]
    )
    np.testing.assert_allclose(np.linalg.norm(r, axis=1), dist, atol=1e-10)


def test_neighbor_list_sorted_by_source(al_fcc):
    edge_index, _, _ = neighbor_list_pbc(al_fcc.lattice, al_fcc.cart_coords, 5.0)
    assert (np.diff(edge_index[0]) >= 0).all()


def test_triplets_share_source_node(tio2_rutile):
    s = tio2_rutile
    edge_index, _, dist = neighbor_list_pbc(s.lattice, s.cart_coords, 4.0)
    tei, _, _ = compute_threebody(len(s), edge_index, dist, 3.0)
    assert tei.shape[1] > 0
    np.testing.assert_array_equal(edge_index[0, tei[0]], edge_index[0, tei[1]])
    assert (tei[0] != tei[1]).all()
    # every triplet edge is within the 3-body cutoff
    assert (dist[tei[0]] <= 3.0).all()
    assert (dist[tei[1]] <= 3.0).all()


def test_batching_offsets(al_fcc, na_bcc):
    cutoff = 4.1
    g1 = graph_from_structure(al_fcc, cutoff, cutoff)
    g2 = graph_from_structure(na_bcc, cutoff, cutoff)
    cat = batch_graphs([g1, g2])
    assert cat.num_nodes == g1.num_nodes + g2.num_nodes
    assert cat.num_graphs == 2
    np.testing.assert_array_equal(
        cat.node_graph, [0] * g1.num_nodes + [1] * g2.num_nodes
    )
    # second graph's edges point at second graph's nodes
    assert (cat.edge_src[g1.num_edges :] >= g1.num_nodes).all()
    assert (cat.triplet_e1[g1.num_triplets :] >= g1.num_edges).all()
    # offset indices still reproduce each edge's distance
    lat = cat.lattice[cat.node_graph[cat.edge_src]]
    r = (
        cat.positions[cat.edge_dst]
        + np.einsum("ep,epq->eq", cat.edge_cell_shift, lat)
        - cat.positions[cat.edge_src]
    )
    d = np.linalg.norm(r, axis=1)
    assert (d <= cutoff + 1e-5).all()
    assert (d > 1e-6).all()


def test_padding(al_fcc, na_bcc):
    cutoff = 4.1
    cat = batch_graphs(
        [
            graph_from_structure(al_fcc, cutoff, cutoff),
            graph_from_structure(na_bcc, cutoff, cutoff),
        ]
    )
    p = pad_batch(cat, 64, 512, 4096, 4)
    assert p.num_nodes == 64 and p.num_edges == 512
    assert p.node_mask.sum() == cat.num_nodes
    assert p.edge_mask.sum() == cat.num_edges
    assert p.triplet_mask.sum() == cat.num_triplets
    assert p.graph_mask.sum() == 2
    np.testing.assert_array_equal(p.lattice[2], np.eye(3))
    with pytest.raises(ValueError):
        pad_batch(cat, 2, 512, 4096, 4)


def test_pack_structures_shapes(al_fcc, na_bcc, tio2_rutile):
    b = pack_structures([al_fcc, na_bcc, tio2_rutile], 5.0, 4.0, pad_multiple=128)
    assert b.num_nodes % 128 == 0
    assert b.num_edges % 128 == 0
    assert b.num_graphs_real == 3


def test_native_threebody_matches_numpy(al_fcc, na_bcc, tio2_rutile):
    """C++ enumerator (native/neighbor.cpp m3g_threebody) emits byte-identical
    triplet indices/counts to the vectorized numpy path on real crystals."""
    import pytest

    from torch_m3gnet_tpu import native
    from torch_m3gnet_tpu.data.neighborlist import neighbor_list_pbc
    from torch_m3gnet_tpu.data.triplets import compute_threebody

    if not native.native_available():
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    structures = [al_fcc, na_bcc, tio2_rutile, al_fcc.supercell((3, 3, 2))]
    for s in structures:
        pos = s.cart_coords + 0.03 * rng.standard_normal(s.cart_coords.shape)
        ei, _, dist = neighbor_list_pbc(s.lattice, pos, 5.0)
        a = compute_threebody(len(s), ei, dist, 4.0, use_native=True)
        b = compute_threebody(len(s), ei, dist, 4.0, use_native=False)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_triplet_counts_helper(al_fcc, na_bcc):
    """triplet_counts recovers the reference's num_triplet_i/num_triplet_ij
    schema attributes (material_graph.py:91-106) from a (padded) batch:
    analytic d*(d-1) per node and d-1 per in-cutoff edge."""
    from torch_m3gnet_tpu.data.graph import (
        batch_graphs,
        graph_from_structure,
        pad_batch,
        triplet_counts,
    )

    # first shells: fcc-Al a=4.05 -> 2.86 A (12 nbrs); bcc-Na a=4.29 ->
    # 3.72 A (8 nbrs); cutoffs chosen just above each
    g = batch_graphs(
        [
            graph_from_structure(al_fcc, 3.0, 3.0),
            graph_from_structure(na_bcc, 3.8, 3.8),
        ]
    )
    padded = pad_batch(g, g.num_nodes + 3, g.num_edges + 5, g.num_triplets + 7, 2)
    n_i, n_ij = triplet_counts(padded)
    np.testing.assert_array_equal(n_i[:4], np.full(4, 12 * 11))
    np.testing.assert_array_equal(n_i[4:6], np.full(2, 8 * 7))
    assert n_i[6:].sum() == 0  # padded nodes carry no triplets
    e = np.asarray(padded.edge_mask, bool)
    assert set(n_ij[e][: 4 * 12].tolist()) == {11}  # fcc edges: d-1 = 11
    assert set(n_ij[e][4 * 12 :].tolist()) == {7}  # bcc edges: d-1 = 7
    assert n_ij[~e].sum() == 0

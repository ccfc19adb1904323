"""Bucket ladder tests: heterogeneous-size datasets pad efficiently."""

import numpy as np

from torch_m3gnet_tpu.data.dataset import (
    BucketLadder,
    BucketSpec,
    ladder_batch_iterator,
)
from torch_m3gnet_tpu.data.graph import graph_from_structure
from torch_m3gnet_tpu.data.structure import Structure


def _graphs():
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    rng = np.random.default_rng(0)
    out = []
    for reps in [1, 1, 1, 1, 2, 2, 2, 2, 3, 3]:
        s = base.supercell((reps, 1, 1))
        s = Structure(
            s.lattice,
            s.cart_coords + 0.03 * rng.standard_normal(s.cart_coords.shape),
            s.atomic_numbers,
        )
        out.append(graph_from_structure(s, 4.5, 4.0))
    return out


def test_ladder_covers_all_and_beats_single_bucket():
    graphs = _graphs()
    bs = 2
    ladder = BucketLadder.build(graphs, bs, num_classes=3, pad_multiple=8)
    seen = 0
    for batch in ladder_batch_iterator(graphs, bs, ladder):
        seen += int(batch.graph_mask.sum())
        # every batch fits its bucket exactly (no overflow raised) and masks
        # are consistent
        assert batch.triplet_mask.sum() <= batch.num_triplets
    assert seen == len(graphs)

    eff_ladder = ladder.padding_efficiency(graphs, bs)
    single = BucketSpec.for_batches(graphs, bs, pad_multiple=8)
    slots = -(-len(graphs) // bs) * single.max_triplets
    eff_single = sum(g.num_triplets for g in graphs) / slots
    assert eff_ladder > eff_single

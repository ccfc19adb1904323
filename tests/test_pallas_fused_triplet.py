"""Fused triplet-stage kernel correctness (interpret mode on CPU).

The kernel computes out[:, e1[t]] += basis[:, t] * gate[:, e2[t]] with both
T-scale gathers window-local (triplet enumeration invariant: both edges of a
triplet share a source node and edges are sorted by source). Forward and the
custom-VJP backward are checked against the pure-XLA contraction on (a) real
triplet index structure from a crystal graph and (b) synthetic worst-ish-case
windows spanning several chunks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _real_indices():
    """Triplet indices from an actual crystal graph (batch-padded)."""
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.data.structure import Structure

    rng = np.random.default_rng(0)
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    ).supercell((2, 2, 2))
    s = Structure(
        base.lattice,
        base.cart_coords + 0.05 * rng.standard_normal(base.cart_coords.shape),
        base.atomic_numbers,
    )
    batch = pack_structures([s, s], 5.0, 4.0, pad_multiple=256)
    return (
        np.asarray(batch.triplet_e1),
        np.asarray(batch.triplet_e2),
        batch.num_edges,
        np.asarray(batch.triplet_mask),
    )


def _check(e1, e2, num_edges, mask, ln=9, seed=0):
    from jax.experimental.pallas import tpu as pltpu

    from torch_m3gnet_tpu.ops.pallas_fused_triplet import (
        fused_triplet_gate_sum,
        reference_triplet_gate_sum,
    )

    rng = np.random.default_rng(seed)
    t = len(e1)
    basis = (rng.standard_normal((ln, t)) * mask).astype(np.float32)
    gate = rng.uniform(0, 1, (ln, num_edges)).astype(np.float32)
    e1j = jnp.asarray(e1, jnp.int32)
    e2j = jnp.asarray(e2, jnp.int32)

    want = reference_triplet_gate_sum(
        jnp.asarray(basis), jnp.asarray(gate), e1j, e2j, num_edges
    )
    with pltpu.force_tpu_interpret_mode():
        got = fused_triplet_gate_sum(
            jnp.asarray(basis), jnp.asarray(gate), e1j, e2j, num_edges
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)

    # backward: d(sum(out * w))/d(basis, gate) must match XLA's autodiff
    w = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))

    def loss_ref(b, g):
        return jnp.sum(reference_triplet_gate_sum(b, g, e1j, e2j, num_edges) * w)

    def loss_ker(b, g):
        return jnp.sum(fused_triplet_gate_sum(b, g, e1j, e2j, num_edges) * w)

    db_ref, dg_ref = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(basis), jnp.asarray(gate)
    )
    with pltpu.force_tpu_interpret_mode():
        db, dg = jax.grad(loss_ker, argnums=(0, 1))(
            jnp.asarray(basis), jnp.asarray(gate)
        )
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref), atol=2e-4, rtol=1e-4)


def test_real_graph_indices():
    e1, e2, num_edges, mask = _real_indices()
    _check(e1, e2, num_edges, mask)


def test_synthetic_multichunk_windows():
    # Segments hand-built so single tiles span multiple gate/output chunks:
    # node degrees vary 1..64, so edge windows per T-tile range widely.
    rng = np.random.default_rng(3)
    degs = rng.integers(1, 65, 300)
    e1_parts, e2_parts = [], []
    e_off = 0
    for d in degs:
        # all ordered pairs of this node's d edges (matching compute_threebody)
        ids = np.arange(e_off, e_off + d)
        a, b = np.meshgrid(ids, ids, indexing="ij")
        keep = a != b
        e1_parts.append(a[keep])
        e2_parts.append(b[keep])
        e_off += d
    e1 = np.concatenate(e1_parts).astype(np.int32)
    e2 = np.concatenate(e2_parts).astype(np.int32)
    order = np.argsort(e1, kind="stable")
    e1, e2 = e1[order], e2[order]
    num_edges = e_off
    mask = np.ones(len(e1), dtype=np.float32)
    _check(e1, e2, num_edges, mask, ln=6, seed=4)


def test_padding_tail_is_ignored():
    # padded triplets: e1 = num_edges - 1 (sorted), e2 = 0, zero basis rows
    e1 = np.concatenate([np.repeat(np.arange(40), 6), np.full(700, 99)]).astype(
        np.int32
    )
    e2 = np.concatenate(
        [np.repeat(np.arange(40), 6) + 1, np.zeros(700)]
    ).astype(np.int32)
    mask = np.concatenate([np.ones(240), np.zeros(700)]).astype(np.float32)
    _check(e1, e2, 100, mask, ln=4, seed=5)


def test_windowed_path_matches_resident():
    """Force the DMA-windowed path (used when gate/out exceed the VMEM
    residency budget) and check it against the resident path."""
    import torch_m3gnet_tpu.ops.pallas_fused_triplet as ft

    e1, e2, num_edges, mask = _real_indices()
    old = ft.VMEM_RESIDENT_BYTES
    ft.VMEM_RESIDENT_BYTES = 0
    try:
        _check(e1, e2, num_edges, mask, seed=9)
    finally:
        ft.VMEM_RESIDENT_BYTES = old

"""Pallas TPU kernel: sorted-segment sum via MXU one-hot contraction.

The triplet->edge and edge->node aggregations are segment sums with SORTED
segment ids (guaranteed by the neighbor-list/triplet enumeration invariants).
This kernel tiles the M rows sequentially; for each tile it builds the 0/1
segment-membership matrix on the fly with ``broadcasted_iota`` comparisons and
contracts it against the data tile on the MXU:

    out[e_base : e_base + EB] += onehot(seg - e_base) @ data_tile

Edge ranges spanned by consecutive tiles can overlap; the TPU grid executes
sequentially, so read-modify-write accumulation into the HBM output is safe.
Per-tile edge spans are data-dependent, so the span bounds are precomputed
host-side-free in jnp and passed via scalar prefetch.

The backward of a segment sum is a gather (d_data = g[seg]), provided through
``jax.custom_vjp`` with XLA's gather.

This is the SpMM-style kernel path called out in the north star; the XLA
``segment_sum`` remains the default (it is already near bandwidth for these
shapes) — enable with ``ops.segment.enable_pallas()``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TM = 512  # rows per tile
EB = 512  # output segments per accumulation chunk


def _kernel(lo_ref, hi_ref, seg_ref, data_ref, out_ref, scratch, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    lo = lo_ref[i]
    hi = hi_ref[i]
    nch = (hi - lo) // EB + 1

    segs = seg_ref[:, 0].reshape(1, TM)  # (1, TM) int32
    data = data_ref[:]  # (TM, F)
    # MXU ingests bf16: split f32 data into exactly-representable bf16
    # high/low halves so two matmuls reproduce full f32 products (the 0/1
    # one-hot matrix is exact in bf16 already).
    data_hi = data.astype(jnp.bfloat16).astype(jnp.float32)
    data_lo = data - data_hi

    def chunk(c, _):
        e_base = lo + c * EB
        load = pltpu.make_async_copy(
            out_ref.at[pl.ds(e_base, EB), :], scratch, sem
        )
        load.start()
        rows = jax.lax.broadcasted_iota(jnp.int32, (EB, TM), 0) + e_base
        onehot = (rows == segs).astype(jnp.float32)
        dn = (((1,), (0,)), ((), ()))
        partial = jax.lax.dot_general(
            onehot, data_hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            onehot, data_lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        load.wait()
        scratch[:] = scratch[:] + partial.astype(scratch.dtype)
        store = pltpu.make_async_copy(
            scratch, out_ref.at[pl.ds(e_base, EB), :], sem
        )
        store.start()
        store.wait()
        return 0

    jax.lax.fori_loop(0, nch, chunk, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sorted_segment_sum(data: jnp.ndarray, seg: jnp.ndarray, num_segments: int):
    """Segment sum for sorted int32 ``seg``; data (M, F) f32 -> (num_segments, F)."""
    return _forward(data, seg, num_segments)


def _forward(data, seg, num_segments):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, f = data.shape
    m_pad = -(-m // TM) * TM
    e_pad = -(-num_segments // EB) * EB + EB  # slack so every chunk window fits
    if m_pad != m:
        data = jnp.pad(data, ((0, m_pad - m), (0, 0)))
        seg = jnp.concatenate(
            [seg, jnp.full((m_pad - m,), seg[-1], dtype=seg.dtype)]
        )
    n_tiles = m_pad // TM
    seg2 = seg.reshape(-1, 1).astype(jnp.int32)
    lo = seg[:: TM].astype(jnp.int32)
    hi = seg[TM - 1 :: TM].astype(jnp.int32)

    zeros = jnp.zeros((e_pad, f), dtype=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TM, 1), lambda i, lo, hi: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, f), lambda i, lo, hi: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # zero-initialized output alias
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((EB, f), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(lo_ref, hi_ref, seg_ref, data_ref, init_ref, out_ref, scratch, sem):
        _kernel(lo_ref, hi_ref, seg_ref, data_ref, out_ref, scratch, sem)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, f), jnp.float32),
        input_output_aliases={4: 0},  # zeros input (arg index after prefetch) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lo, hi, seg2, data.astype(jnp.float32), zeros)
    return out[:num_segments].astype(data.dtype)


def _fwd(data, seg, num_segments):
    return _forward(data, seg, num_segments), seg


def _bwd(num_segments, seg, g):
    return jnp.take(g, seg, axis=0), None


sorted_segment_sum.defvjp(_fwd, _bwd)


def pallas_segment_sum(data, segment_ids, num_segments):
    """Dispatch hook used by ops.segment.segment_sum; None = fall back.

    TPU HBM DMA slices need the minor dim aligned to the 128-lane tiling, so
    the kernel serves 128-multiple feature widths; narrow features fall back
    to XLA's segment_sum (which is near-bandwidth for those anyway).
    """
    if data.ndim != 2 or data.shape[1] % 128 != 0:
        return None
    if data.dtype not in (jnp.float32, np.float32):
        return None
    return sorted_segment_sum(data, segment_ids, num_segments)

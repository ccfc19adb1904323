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

This is the SpMM-style kernel path called out in the north star. Measured on
one v5e chip, ISOLATED, the v2 kernel beats XLA's segment_sum 3.0x at
(M=1.88M, F=9) and 1.5-2.3x at other model shapes. INSIDE the full model,
however, XLA fuses the preceding elementwise multiply into its scatter while a
pallas_call forces the (T, F) operand to materialize (lane-padded 128/F-fold
in HBM), which costs more than the scatter win — so the XLA path stays the
default and the kernel is opt-in (``ops.segment.enable_pallas()``) for
workloads where the segment input is already materialized.
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


TM2 = 1024  # rows per tile (v2 kernel)
EB2 = 512  # output window per chunk (multiple of 128 for aligned HBM DMA)


def _kernel_t(lo_ref, hi_ref, seg_ref, data_ref, out_ref, scratch, sem):
    """Transposed-output variant: accumulates into out (F, E_pad).

    Works for ANY feature width F: the output minor dim is the segment axis,
    so DMA windows [:, e_base : e_base+EB2] are 128-aligned by construction
    (e_base = 128-aligned tile floor + c*EB2).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    lo = lo_ref[i]  # already 128-aligned
    hi = hi_ref[i]
    nch = (hi - lo) // EB2 + 1

    segs = seg_ref[:, 0]  # (TM2,) int32
    data = data_ref[:]  # (TM2, F)
    data_hi = data.astype(jnp.bfloat16).astype(jnp.float32)
    data_lo = data - data_hi

    def chunk(c, _):
        # lo is pre-aligned to 128 and EB2 is a multiple of 128; tell Mosaic.
        e_base = pl.multiple_of(lo + c * EB2, 128)
        load = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(e_base, EB2)], scratch, sem
        )
        load.start()
        cols = jax.lax.broadcasted_iota(jnp.int32, (TM2, EB2), 1) + e_base
        onehot = (segs[:, None] == cols).astype(jnp.float32)  # (TM2, EB2)
        dn = (((0,), (0,)), ((), ()))  # contract the TM2 axis -> (F, EB2)
        partial = jax.lax.dot_general(
            data_hi, onehot, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            data_lo, onehot, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        load.wait()
        scratch[:] = scratch[:] + partial
        store = pltpu.make_async_copy(
            scratch, out_ref.at[:, pl.ds(e_base, EB2)], sem
        )
        store.start()
        store.wait()
        return 0

    jax.lax.fori_loop(0, nch, chunk, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sorted_segment_sum_any(data: jnp.ndarray, seg: jnp.ndarray, num_segments: int):
    """Sorted segment sum for ANY feature width; data (M, F) -> (num_segments, F).

    Internally accumulates into a transposed (F, E) buffer so every HBM DMA
    window is lane-aligned regardless of F; one E-scale transpose at the end.
    """
    return _forward_t(data, seg, num_segments)


def _forward_t(data, seg, num_segments):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, f = data.shape
    m_pad = -(-m // TM2) * TM2
    f_pad = -(-f // 8) * 8  # sublane alignment for the (F, E) DMA windows
    e_pad = -(-num_segments // EB2) * EB2 + 2 * EB2
    if m_pad != m or f_pad != f:
        data = jnp.pad(data, ((0, m_pad - m), (0, f_pad - f)))
    if m_pad != m:
        seg = jnp.concatenate(
            [seg, jnp.full((m_pad - m,), seg[-1], dtype=seg.dtype)]
        )
    n_tiles = m_pad // TM2
    seg2 = seg.reshape(-1, 1).astype(jnp.int32)
    lo = (seg[::TM2].astype(jnp.int32) // 128) * 128
    hi = seg[TM2 - 1 :: TM2].astype(jnp.int32)

    zeros = jnp.zeros((f_pad, e_pad), dtype=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TM2, 1), lambda i, lo, hi: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM2, f_pad), lambda i, lo, hi: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((f_pad, EB2), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(lo_ref, hi_ref, seg_ref, data_ref, init_ref, out_ref, scratch, sem):
        _kernel_t(lo_ref, hi_ref, seg_ref, data_ref, out_ref, scratch, sem)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_pad, e_pad), jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lo, hi, seg2, data.astype(jnp.float32), zeros)
    return out[:f, :num_segments].T.astype(data.dtype)


def _fwd_t(data, seg, num_segments):
    return _forward_t(data, seg, num_segments), seg


def _bwd_t(num_segments, seg, g):
    return jnp.take(g, seg, axis=0), None


sorted_segment_sum_any.defvjp(_fwd_t, _bwd_t)


def pallas_segment_sum(data, segment_ids, num_segments):
    """Dispatch hook used by ops.segment.segment_sum; None = fall back.

    Uses the transposed-output v2 kernel (any feature width). Measured on
    v5e: 3.0x XLA at (1.88M rows, F=9) and 1.5x at (261k rows, F=64).
    Only valid for SORTED segment ids (the dispatcher enforces the flag).
    """
    if data.ndim != 2:
        return None
    if data.dtype not in (jnp.float32, np.float32):
        return None
    return sorted_segment_sum_any(data, segment_ids, num_segments)

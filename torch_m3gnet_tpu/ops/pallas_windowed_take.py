"""Windowed Pallas TPU gather/scatter for triplet-scale geometry access.

The round-2 profile of the headline step (benchmarks/profile_step.py) showed
that the four T-scale geometry reads feeding the three-body basis —

    vij = r_vec[e1],  vik = r_vec[e2],  rij = dist[e1],  rik = dist[e2]
    (reference semantics: /root/reference/src/torch_m3gnet/nn/invariant.py
     via interaction.py:187-202)

and, worse, their gradient transposes (scatter-adds back to edge vectors on
the force/stress path) dominate the whole potential evaluation: XLA lowers
narrow-row gathers and every scatter-add to latency-bound row-at-a-time
loops (~7-14 ns/row), costing ~12 ms/step in backward scatters plus ~4 ms in
forward gathers at MPF scale (264k triplets) — 4x the cost of all the MXU
work in the model combined.

Both directions have the same *window locality* the fused triplet kernel
(ops/pallas_fused_triplet.py) exploits: triplets are enumerated per source
node and edges are sorted by source node, so any tile of TT consecutive
triplets touches a short contiguous edge-id window. This module packages
that trick as a standalone, differentiable-to-all-orders op pair on
feature-major data:

    windowed_take_fm(data_fm (F, E), idx (T,))      -> (F, T)    gather
    windowed_scatter_fm(vals_fm (F, T), idx, E)     -> (F, E)    segment-add

- gather:  out[:, t]  = data[:, idx[t]]      = onehot(idx) MXU contraction
- scatter: out[:, e] += sum_{t: idx[t]=e} vals[:, t]   (MXU, window-local)

They are mutual transposes, so each one's custom VJP is the other — the op
family is closed under differentiation (force-loss training needs
grad-of-grad through these, reference nn/gradient.py:33).

``idx`` need not be sorted: per-tile windows are [min, max] of the actual
ids, so e2 (window-local but unsorted) works as-is; pathological ids only
degrade performance (the window covers everything), never correctness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from torch_m3gnet_tpu.ops.pallas_fused_triplet import (
    VMEM_RESIDENT_BYTES,
    _gather_res,
    _gather_window,
    _match_vma,
    _pad_fm,
    _scatter_res,
    _scatter_window,
    _vma,
)

TT = 512  # triplets (index rows) per tile
CHUNK = 256  # edge-window chunk (multiple of 128)


def _prep_idx(idx):
    """Pad T to a tile multiple and compute per-tile [lo, hi] windows."""
    t = idx.shape[0]
    t_pad = -(-t // TT) * TT
    if t_pad != t:
        idx = jnp.concatenate([idx, jnp.full((t_pad - t,), idx[-1], idx.dtype)])
    idx = idx.astype(jnp.int32)
    tiles = idx.reshape(t_pad // TT, TT)
    lo = (jnp.min(tiles, axis=1) // 128) * 128
    hi = jnp.max(tiles, axis=1)
    return idx, lo, hi, t_pad // TT, t_pad


def _take_kernel_res(lo_ref, hi_ref, idx_ref, data_ref, out_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    out_ref[:] = _gather_res(idx_ref[:, 0], lo_ref[i], hi_ref[i], data_ref, CHUNK)


def _take_kernel_win(lo_ref, hi_ref, idx_ref, data_ref, out_ref, scratch, sem):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    out_ref[:] = _gather_window(
        idx_ref[:, 0], lo_ref[i], hi_ref[i], data_ref, scratch, sem, CHUNK
    )


def _scatter_kernel_res(lo_ref, hi_ref, idx_ref, vals_ref, out_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    _scatter_res(idx_ref[:, 0], lo_ref[i], hi_ref[i], vals_ref[:], out_ref, CHUNK)


def _scatter_kernel_win(
    lo_ref, hi_ref, idx_ref, vals_ref, init_ref, out_ref, scratch, sem
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    _scatter_window(
        idx_ref[:, 0], lo_ref[i], hi_ref[i], vals_ref[:], out_ref, scratch, sem, CHUNK
    )


@jax.custom_vjp
def windowed_take_fm(data_fm: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[:, t] = data_fm[:, idx[t]] — (F, E) x (T,) -> (F, T), exact f32.

    Tile-windowed MXU gather; VJP is :func:`windowed_scatter_fm`.
    """
    return _take_impl(data_fm, idx)


def _take_impl(data_fm, idx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, e = data_fm.shape
    t = idx.shape[0]
    fp = -(-f // 8) * 8
    e_pad = -(-e // CHUNK) * CHUNK + CHUNK
    vma = _vma(data_fm, idx)
    idx, lo, hi, n_tiles, t_pad = _prep_idx(_match_vma(idx, vma))
    data_p = _pad_fm(_match_vma(data_fm, vma).astype(jnp.float32), fp, e_pad)

    if fp * e_pad * 4 <= VMEM_RESIDENT_BYTES:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((fp, e_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (fp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            _take_kernel_res,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((fp, t_pad), jnp.float32, vma=vma),
        )(lo, hi, idx.reshape(-1, 1), data_p)
        return out[:f, :t]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((fp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((fp, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _take_kernel_win,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((fp, t_pad), jnp.float32, vma=vma),
    )(lo, hi, idx.reshape(-1, 1), data_p)
    return out[:f, :t]


def _take_vjp_fwd(data_fm, idx):
    return windowed_take_fm(data_fm, idx), (idx, data_fm.shape[1])


def _take_vjp_bwd(res, g):
    idx, e = res
    return windowed_scatter_fm(g, idx, e), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def windowed_scatter_fm(
    vals_fm: jnp.ndarray, idx: jnp.ndarray, num_edges: int
) -> jnp.ndarray:
    """out[:, e] = sum_{t: idx[t]=e} vals_fm[:, t] — (F, T) -> (F, num_edges).

    Tile-windowed MXU segment-add; VJP is :func:`windowed_take_fm`.
    """
    return _scatter_impl(vals_fm, idx, num_edges)


def _scatter_impl(vals_fm, idx, num_edges):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, t = vals_fm.shape
    fp = -(-f // 8) * 8
    e_pad = -(-num_edges // CHUNK) * CHUNK + CHUNK
    vma = _vma(vals_fm, idx)
    idx, lo, hi, n_tiles, t_pad = _prep_idx(_match_vma(idx, vma))
    # Zero the tail so padded index rows (replicated idx[-1]) contribute 0.
    vals_p = _pad_fm(_match_vma(vals_fm, vma).astype(jnp.float32), fp, t_pad)

    if fp * e_pad * 4 <= VMEM_RESIDENT_BYTES:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((fp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (fp, e_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            _scatter_kernel_res,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((fp, e_pad), jnp.float32, vma=vma),
        )(lo, hi, idx.reshape(-1, 1), vals_p)
        return out[:f, :num_edges]

    zeros = _match_vma(jnp.zeros((fp, e_pad), jnp.float32), vma)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zero-initialized out alias
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((fp, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _scatter_kernel_win,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((fp, e_pad), jnp.float32, vma=vma),
        input_output_aliases={4: 0},  # zeros (2 prefetch + 3rd operand) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lo, hi, idx.reshape(-1, 1), vals_p, zeros)
    return out[:f, :num_edges]


def _scatter_vjp_fwd(vals_fm, idx, num_edges):
    return windowed_scatter_fm(vals_fm, idx, num_edges), idx


def _scatter_vjp_bwd(num_edges, idx, g):
    return windowed_take_fm(g, idx), None


windowed_take_fm.defvjp(_take_vjp_fwd, _take_vjp_bwd)
windowed_scatter_fm.defvjp(_scatter_vjp_fwd, _scatter_vjp_bwd)


def reference_take_fm(data_fm, idx):
    """Pure-XLA reference (for tests)."""
    return jnp.take(data_fm, idx, axis=1)


def reference_scatter_fm(vals_fm, idx, num_edges):
    """Pure-XLA reference (for tests)."""
    return jax.vmap(
        lambda row: jax.ops.segment_sum(row, idx, num_segments=num_edges)
    )(vals_fm)

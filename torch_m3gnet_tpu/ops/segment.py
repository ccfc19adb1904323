"""Segment aggregation ops — the TPU replacement for torch-scatter.

The reference offloads every aggregation (triplet->edge, edge->node,
node->graph) to torch-scatter's CUDA ``scatter_sum``
(/root/reference/src/torch_m3gnet/nn/interaction.py:212, nn/conv.py:82,
nn/readout.py:49, nn/gradient.py:41). Here the portable path is XLA's
``jax.ops.segment_sum`` (which lowers to efficient on-device scatter); the
Pallas kernel in :mod:`torch_m3gnet_tpu.ops.pallas_segment` can be swapped in
behind this same function for sorted-index workloads.

All call sites pass masked data (padding rows pre-multiplied by 0) and static
``num_segments``, so shapes stay XLA-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BACKEND = "xla"  # flipped to "pallas" by enable_pallas() once kernels land


def enable_pallas(on: bool = True) -> None:
    global _BACKEND
    _BACKEND = "pallas" if on else "xla"


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sum ``data`` rows into ``num_segments`` buckets by ``segment_ids``.

    Args:
        data: (M, ...) values; padding rows must already be zeroed.
        segment_ids: (M,) int32 in [0, num_segments).
        num_segments: static output size.
        indices_are_sorted: enables faster lowering when ids are
            non-decreasing (true for edge->node sums thanks to the
            source-sorted neighbor-list invariant).
    """
    if _BACKEND == "pallas" and indices_are_sorted:
        from torch_m3gnet_tpu.ops.pallas_segment import pallas_segment_sum

        out = pallas_segment_sum(data, segment_ids, num_segments)
        if out is not None:
            return out
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


@jax.custom_vjp
def take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather with a segment-sum backward.

    JAX's default transpose of gather lowers to an XLA scatter-add that TPU
    executes ~350x slower than ``segment_sum`` at graph scale (measured:
    17.4 ms vs 0.05 ms for 1.88M rows); this wrapper swaps the cotangent
    computation to the fast path. Semantics match ``x[idx]`` for row indices.
    """
    return jnp.take(x, idx, axis=0)


def _take_fwd(x, idx):
    return jnp.take(x, idx, axis=0), (idx, x.shape[0])


def _take_bwd(res, g):
    idx, n = res
    dx = jax.ops.segment_sum(g, idx, num_segments=n)
    return dx, None


take.defvjp(_take_fwd, _take_bwd)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
) -> jnp.ndarray:
    total = segment_sum(data, segment_ids, num_segments)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments)
    return total / jnp.maximum(count, 1.0).reshape((-1,) + (1,) * (data.ndim - 1))


# ---------------------------------------------------------------------------
# Feature-major variants: arrays carried as (F, M) so the huge entity axis
# sits on the 128 TPU lanes. XLA assigns row-major {1,0} layouts to gather /
# scatter outputs, so the entity-major (M, F) forms put the narrow feature
# axis on lanes — a 128/F-fold physical blowup (42x for F=3, 4.7x for F=27)
# in HBM footprint and traffic for every gather/scatter boundary in the
# model. take_fm / segment_sum_fm are a custom-VJP pair closed under
# differentiation (each is the other's transpose), so force training
# (grad-of-grad) stays in feature-major form to all orders.
# ---------------------------------------------------------------------------


def _scatter_add_fm(data_fm, seg, num_segments, indices_are_sorted):
    out = jnp.zeros((data_fm.shape[0], num_segments), dtype=data_fm.dtype)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(0,),
        inserted_window_dims=(1,),
        scatter_dims_to_operand_dims=(1,),
    )
    return jax.lax.scatter_add(
        out,
        seg.astype(jnp.int32)[:, None],
        data_fm,
        dnums,
        indices_are_sorted=indices_are_sorted,
        unique_indices=False,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_fm(
    data_fm: jnp.ndarray,
    seg: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Feature-major segment sum: (F, M) rows summed into (F, num_segments)."""
    return _scatter_add_fm(data_fm, seg, num_segments, indices_are_sorted)


def _ssfm_fwd(data_fm, seg, num_segments, indices_are_sorted):
    return segment_sum_fm(data_fm, seg, num_segments, indices_are_sorted), seg


def _ssfm_bwd(num_segments, indices_are_sorted, seg, g):
    return take_fm(g, seg), None


segment_sum_fm.defvjp(_ssfm_fwd, _ssfm_bwd)


@jax.custom_vjp
def take_fm(x_fm: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Feature-major column gather: (F, N)[:, idx] -> (F, E)."""
    return jnp.take(x_fm, idx, axis=1)


def _takefm_fwd(x_fm, idx):
    return jnp.take(x_fm, idx, axis=1), (idx, x_fm.shape[1])


def _takefm_bwd(res, g):
    idx, n = res
    return segment_sum_fm(g, idx, n), None


take_fm.defvjp(_takefm_fwd, _takefm_bwd)

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

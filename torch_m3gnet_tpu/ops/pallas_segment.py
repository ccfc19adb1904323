"""Pallas TPU segment-sum kernels (placeholder until the kernel milestone).

Returns ``None`` to signal fallback to the XLA path. Filled in by the
performance layer (SURVEY.md §7 step 6).
"""

from __future__ import annotations


def pallas_segment_sum(data, segment_ids, num_segments):
    return None

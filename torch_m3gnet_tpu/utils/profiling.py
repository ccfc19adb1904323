"""Profiling / observability helpers.

The reference has essentially none (a commented-out Lightning profiler,
litmodule.py:292). Here: step timing with items/sec counters in the
BASELINE metric (edges+triplets/sec), and a jax.profiler trace context for
TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Throughput:
    """Running edges+triplets/sec (and graphs/sec) counter."""

    items: int = 0
    graphs: int = 0
    seconds: float = 0.0
    _t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, batch) -> None:
        """Account one completed step on ``batch`` (call after block_until_ready)."""
        if self._t0 is None:
            return
        self.seconds += time.perf_counter() - self._t0
        self._t0 = None
        self.items += int(np.asarray(batch.edge_mask).sum()) + int(
            np.asarray(batch.triplet_mask).sum()
        )
        self.graphs += int(np.asarray(batch.graph_mask).sum())

    @property
    def items_per_sec(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0

    @property
    def graphs_per_sec(self) -> float:
        return self.graphs / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

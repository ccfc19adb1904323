"""Device-prefetch pipeline for training batches.

The epoch loop's batches are freshly assembled numpy arrays (padding,
index offsetting, shard stacking happen on host per step), so a plain loop
serializes [host assemble] -> [host->device transfer] -> [device step].
``device_prefetch`` runs the host side in a producer thread and issues
``jax.device_put`` up to ``size`` batches ahead: JAX transfers are
asynchronous, so the next batch's HBM copy (and the host assembly behind
it) overlaps the current step's device compute. This is the TPU analog of
the reference's DataLoader worker processes (litmodule.py:225-233) plus the
device-side double buffering those cannot express.

Single-device path only: dp/gp stacked batches are placed by the sharded
jit's in_specs and would need a NamedSharding put — their host assembly
already overlaps via the shard-level streaming prefetch (data/streaming.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(
    batches: Iterable,
    size: int = 2,
    device=None,
) -> Iterator:
    """Yield batches already committed to ``device``, up to ``size`` ahead.

    Exceptions from the producer (iterator or transfer) re-raise in the
    consumer. ``size=0`` disables the pipeline (plain iteration).
    """
    if size <= 0:
        yield from batches
        return
    if device is None:
        device = jax.config.jax_default_device or jax.local_devices()[0]

    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def producer():
        try:
            for b in batches:
                if stop.is_set():
                    return
                item = jax.device_put(b, device)
                # device_put is async: enqueueing here starts the copy while
                # the consumer's current step is still executing. Bounded
                # puts re-check the stop flag so an abandoned consumer
                # (exception in the step, interrupted epoch) releases the
                # thread and its queued device buffers instead of leaking.
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # surfaced by the consumer
            q.put(exc)
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so a producer blocked between the flag checks unblocks
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break

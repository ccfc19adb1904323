"""Paired A/B timing on the shared-tunnel chip.

Absolute timings through the tunnel vary by >10x on minute-scale contention
epochs, so sequential best-of-windows cannot resolve differences under ~2x.
This helper alternates the candidates back-to-back *within* each window (the
contention state is shared across a ~10 ms window pair), computes the
per-window time ratio, and reports the median ratio plus each candidate's
best absolute time. Ratios are stable to a few percent where absolute
numbers are not.

ORDER BIAS (measured 2026-08-21 with an identical-program control): under
heavy contention the position WITHIN a window carries its own bias — the
second burst can read anywhere from ~0.6x to ~1.0x of the first, from
idle-credit dynamics. The round-robin order is therefore REVERSED on every
other window, so position bias cancels in the median ratio; single-order
ratios from before this change should be read with +-10% suspicion (or
verified with both orders, as in docs/benchmark.md round-4 notes).
"""

from __future__ import annotations

import time

import numpy as np


def paired_compare(fns: dict, windows: int = 12, iters: int = 20,
                   idle_s: float = 1.0, verbose: bool = False):
    """fns: {name: (fn, args)}. Returns {name: {best_ms, median_ms,
    ratio_vs_first}} where ratios are per-window medians against the first
    entry."""
    import jax

    names = list(fns)
    for fn, args in fns.values():
        jax.block_until_ready(fn(*args))

    times = {n: [] for n in names}
    for w in range(windows):
        time.sleep(idle_s)
        order = names if w % 2 == 0 else list(reversed(names))
        for n in order:
            fn, args = fns[n]
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            times[n].append((time.perf_counter() - t0) / iters * 1e3)
        if verbose:
            print("  " + " ".join(f"{n}={times[n][-1]:.3f}" for n in names))

    base = names[0]
    out = {}
    for n in names:
        ratios = [t / b for t, b in zip(times[n], times[base])]
        out[n] = {
            "best_ms": round(min(times[n]), 4),
            "median_ms": round(float(np.median(times[n])), 4),
            "ratio_vs_first": round(float(np.median(ratios)), 4),
        }
    return out

"""Shared benchmark timing protocol (VERDICT r1 #4: one protocol, median-of-N).

The attached chip is time-shared behind the axon tunnel, where
``block_until_ready`` does NOT actually synchronize -- every timed region
must end in a real readback, and run-to-run variance is large.  Protocol:
``repeats`` timed regions of ``iters`` amortized calls each, report the
MEDIAN per-call time plus all per-region values.
"""

import time

import numpy as np

__all__ = ["time_median", "readback"]


def readback(y):
    """Force device->host sync on one element (tunnel-proof)."""
    arr = y
    while getattr(arr, "ndim", 0) > 0:
        arr = arr[tuple(0 for _ in range(arr.ndim))]
        break
    return float(np.asarray(arr))


def time_median(fn, iters: int = 20, repeats: int = 5, warmup: int = 2):
    """Return (median_seconds_per_call, [per-region seconds-per-call])."""
    for _ in range(warmup):
        y = fn()
    readback(y)
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn()
        readback(y)
        vals.append((time.perf_counter() - t0) / iters)
    return float(np.median(vals)), [round(v, 6) for v in vals]

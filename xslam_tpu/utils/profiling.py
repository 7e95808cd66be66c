"""Device profiling helpers.

The reference instruments with host wall-clock laps around synchronized
kernel wrappers (``cx::timer``; SURVEY.md §5). On TPU the equivalents are
``jax.profiler`` traces (viewable in TensorBoard/XProf) plus sync-aware
timing (:mod:`.timers`).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn, *args, n: int = 5, warmup: int = 1):
    """Best-of-n wall time of ``fn(*args)`` with full result fetch (a host
    fetch, not just block_until_ready — relayed backends can ack dispatch
    before execution completes)."""
    import numpy as np

    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times), out

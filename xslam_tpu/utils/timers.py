"""Wall-clock timing with device synchronization.

Replaces ``cx::timer`` (``Common/include/cxtimers.h:19-89``). On JAX the
async dispatch means laps must block on device results, mirroring the
reference's ``cudaDeviceSynchronize`` in kernel wrappers.
"""

from __future__ import annotations

import time

import jax


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.total = 0.0

    def reset(self):
        self.t0 = time.perf_counter()

    def lap_ms(self, sync=None) -> float:
        """Milliseconds since reset; blocks on ``sync`` (a pytree of arrays)
        first so device work is included."""
        if sync is not None:
            jax.block_until_ready(sync)
        dt = (time.perf_counter() - self.t0) * 1000.0
        self.total += dt
        return dt

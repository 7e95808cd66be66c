"""Probe: what does ONE dispatch cost through the axon relay?

The round-3/4 question: the bench frame (71 ms) exceeds the chained-scan
device-time budget (43.3 ms) by ~28 ms/frame. Candidate explanations:
(a) per-dispatch relay overhead (host submission serializing with device
compute), (b) real per-frame device work the chained profile hoists
(volume-dependent stages are held constant there). This measures (a)
directly with compute-free programs:

* tiny round trip: jitted (8,128) add, result fetched every call — the
  floor cost of dispatch + fetch through the relay,
* tiny submit-only: same, fetched once at the end — the floor cost of
  dispatch alone (does the relay pipeline submissions?),
* big-input dispatch: the add with a donated 640x480 u16 frame argument —
  does per-dispatch cost scale with argument upload?
* dependent-chain dispatch: y_{i+1} = f(y_i) submit-only — the loop shape
  of the SLAM bench (each step consumes the previous state) without any
  real compute.

Run serialized with other TPU work: python -u apps/probe_dispatch_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    N = 30

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    x = tiny(x)
    np.asarray(x)

    t0 = time.perf_counter()
    for _ in range(N):
        y = tiny(x)
        np.asarray(y)
    rt = (time.perf_counter() - t0) / N * 1e3
    print(f"tiny round trip (fetch each): {rt:.2f} ms/dispatch")

    t0 = time.perf_counter()
    ys = [tiny(x) for _ in range(N)]
    np.asarray(ys[-1])
    sub = (time.perf_counter() - t0) / N * 1e3
    print(f"tiny submit-only (fetch last): {sub:.2f} ms/dispatch")

    @jax.jit
    def dep(y):
        return y + 1.0

    y = jnp.zeros((8, 128), jnp.float32)
    y = dep(y)
    np.asarray(y)
    t0 = time.perf_counter()
    for _ in range(N):
        y = dep(y)
    np.asarray(y)
    chain = (time.perf_counter() - t0) / N * 1e3
    print(f"dependent chain submit-only: {chain:.2f} ms/dispatch")

    @jax.jit
    def with_frame(y, depth):
        return y + jnp.float32(depth.sum())

    depth = jnp.zeros((480, 640), jnp.uint16)
    y = jnp.zeros((8, 128), jnp.float32)
    y = with_frame(y, depth)
    np.asarray(y)
    t0 = time.perf_counter()
    for _ in range(N):
        y = with_frame(y, depth)
    np.asarray(y)
    big = (time.perf_counter() - t0) / N * 1e3
    print(f"dependent chain + 600 KB device-resident frame arg: {big:.2f} ms/dispatch")

    # does dispatch cost scale with the NUMBER of argument/result buffers?
    # (the SLAM state pytree is ~20 arrays in / ~25 out per step)
    for nbuf in (4, 24):
        @jax.jit
        def many(xs):
            return [x + 1.0 for x in xs]

        xs = [jnp.zeros((8, 128), jnp.float32) for _ in range(nbuf)]
        xs = many(xs)
        np.asarray(xs[0])
        t0 = time.perf_counter()
        for _ in range(N):
            xs = many(xs)
        np.asarray(xs[0])
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"dependent chain, {nbuf} arg/result buffers: {dt:.2f} ms/dispatch")

    # does per-execute cost scale with carried-state SIZE? (the SLAM state
    # is ~201 MB of volume rows, donated) — a trivial elementwise add over
    # a 201 MB carry costs ~0.5 ms of HBM time; anything beyond that is
    # relay/runtime per-execute overhead on big buffers
    for donate in (False, True):
        f = jax.jit(lambda y: y + 1.0, donate_argnums=(0,) if donate else ())
        y = jnp.zeros((3, 256 * 256 * 256), jnp.float32)  # 201 MB
        y = f(y)
        np.asarray(y[0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            y = f(y)
        np.asarray(y[0, 0])
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"dependent chain, 201 MB carry, donate={donate}: {dt:.2f} ms/dispatch")


if __name__ == "__main__":
    main()

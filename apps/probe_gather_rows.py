"""TPU probe: throughput of row gathers vs scalar gathers.

Measures jnp.take(table(N, K), idx, axis=0) for several row widths K against
the scalar-gather floor (~8.5 ns/elem, BASELINE.md). If a K-wide row gather
costs about the same as ONE scalar gather, hot paths should fetch packed rows
(ICP association planes, trilinear (value, grad) z-pairs) instead of issuing
K scalar gathers.

Also probes a complex64 scalar gather (a packed (value, grad) pair).

Usage: python -u apps/probe_gather_rows.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    n_idx = 1_000_000  # gathers per call
    n_rows = 2_000_000  # table rows (big enough to defeat caching)
    idx = jnp.asarray(rng.integers(0, n_rows, size=n_idx, dtype=np.int32))

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        np.asarray(out.reshape(-1)[0])  # force completion via tiny fetch
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out.reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}
    for K in (1, 2, 4, 8, 16, 32, 128):
        table = jnp.asarray(rng.standard_normal((n_rows, K)).astype(np.float32))

        @jax.jit
        def row_gather(t, i):
            return jnp.take(t, i, axis=0).sum(axis=0)

        dt = timeit(row_gather, table, idx)
        ns_per_row = 1e9 * dt / n_idx
        results[K] = ns_per_row
        print(f"K={K:4d}: {ns_per_row:8.2f} ns/row-gather "
              f"({ns_per_row / K:6.2f} ns/elem)", flush=True)

    # scalar baseline on a flat table
    flat = jnp.asarray(rng.standard_normal(n_rows).astype(np.float32))

    @jax.jit
    def scalar_gather(t, i):
        return jnp.take(t, i).sum()

    dt = timeit(scalar_gather, flat, idx)
    print(f"flat scalar take: {1e9 * dt / n_idx:8.2f} ns/gather", flush=True)

    # complex64 scalar gather (packed pair)
    cplx = jnp.asarray(
        (rng.standard_normal(n_rows) + 1j * rng.standard_normal(n_rows)).astype(
            np.complex64
        )
    )

    @jax.jit
    def complex_gather(t, i):
        z = jnp.take(t, i)
        return (z.real + z.imag).sum()

    try:
        dt = timeit(complex_gather, cplx, idx)
        print(f"complex64 take:  {1e9 * dt / n_idx:8.2f} ns/gather", flush=True)
    except Exception as e:  # pragma: no cover - probe
        print(f"complex64 take failed: {e}", flush=True)

    # 3-D volume-shaped gather via flat index vs 2-D row gather of z-pairs
    X = Y = Z = 256
    vol = jnp.asarray(rng.standard_normal((X * Y * Z,)).astype(np.float32))
    gx = jnp.asarray(rng.integers(0, X, n_idx, dtype=np.int32))
    gy = jnp.asarray(rng.integers(0, Y, n_idx, dtype=np.int32))
    gz = jnp.asarray(rng.integers(0, Z, n_idx, dtype=np.int32))

    @jax.jit
    def vol_gather(v, gx, gy, gz):
        return jnp.take(v, (gx * Y + gy) * Z + gz).sum()

    dt = timeit(vol_gather, vol, gx, gy, gz)
    print(f"flat 3D take:    {1e9 * dt / n_idx:8.2f} ns/gather", flush=True)


if __name__ == "__main__":
    main()

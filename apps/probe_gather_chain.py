"""TPU probe: TRUE per-gather cost by width/dtype, dispatch cancelled.

apps/probe_gather_rows.py timed single dispatches, so its numbers carry the
~25-30 ms relay round-trip spread over the gather count (1M gathers -> +25
ns/gather of pure dispatch). This probe uses the chained-scan methodology of
apps/profile_stages.py: a lax.scan of k chained gather passes inside ONE
jit, per-pass time = (T_n - T_1)/(n-1); the chain feeds a denormal-scaled
function of pass i's sum into pass i+1's indices so XLA can neither CSE nor
reorder the passes.

Measures: f32 scalar take, complex64 scalar take (a packed (value, grad)
pair in one fetch — candidate to halve the refine stage's 16 taps), and
(N, K) row gathers for K in {2, 4, 8}.

Run serialized with other TPU work: python -u apps/probe_gather_chain.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xslam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    n_idx = 500_000
    n_rows = 2_000_000
    idx0 = jnp.asarray(rng.integers(0, n_rows, size=n_idx, dtype=np.int32))

    def chained(gather_fn, scan_n=8, reps=3):
        """Per-pass seconds of gather_fn(idx) with dispatch cancelled."""

        def make(k):
            @jax.jit
            def run(idx0):
                def body(c, _):
                    idx = (idx0 + c) % n_rows
                    s = gather_fn(idx)
                    return (s - jnp.floor(s)).astype(jnp.int32) % 3, None

                c, _ = jax.lax.scan(body, jnp.int32(0), None, length=k)
                return c

            return run

        def t_of(k):
            run = make(k)
            np.asarray(run(idx0))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(run(idx0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tn = t_of(1), t_of(scan_n)
        return max(tn - t1, 0.0) / (scan_n - 1)

    flat = jnp.asarray(rng.standard_normal(n_rows).astype(np.float32))
    dt = chained(lambda i: jnp.take(flat, i, mode="clip").sum())
    print(f"f32 scalar take:   {1e9 * dt / n_idx:7.2f} ns/gather", flush=True)

    # NOTE: complex64 is probed LAST — device_put of a c64 array is
    # UNIMPLEMENTED on this backend and the failure poisons subsequent
    # uploads in the same process (observed: the next f32 device_put also
    # throws UNIMPLEMENTED).
    for K in (2, 4, 8):
        table = jnp.asarray(
            rng.standard_normal((n_rows, K)).astype(np.float32)
        )

        def rg(i, table=table):
            return jnp.take(table, i, axis=0, mode="clip").sum()

        dt = chained(rg)
        print(
            f"(N,{K}) row take:   {1e9 * dt / n_idx:7.2f} ns/row", flush=True
        )

    try:
        cplx = jnp.asarray(
            (rng.standard_normal(n_rows) + 1j * rng.standard_normal(n_rows)).astype(
                np.complex64
            )
        )

        def cg(i):
            z = jnp.take(cplx, i, mode="clip")
            return (z.real + z.imag).sum()

        dt = chained(cg)
        print(f"c64 scalar take:   {1e9 * dt / n_idx:7.2f} ns/gather", flush=True)
    except Exception as e:  # pragma: no cover - probe
        print(f"c64 take failed: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()

"""Probe: which gather forms does the Mosaic TPU compiler accept in Pallas,
and at what throughput?

Motivation (VERDICT round 2, item 4): every hot stage is bound by the
XLA scalar-gather floor (~8.5-9.4 ns/elem, BASELINE.md). Earlier probes
showed ``jnp.take`` inside a Pallas kernel fails with "Only 2D gather is
supported" — this probe maps out exactly what IS supported on this
toolchain (jax 0.9.0) so the march/refine kernels can be designed around a
hardware-native gather, or the Pallas plank closed with a recorded
negative result.

Probes (each compiled separately; failures are caught and recorded):
  A. take_along_axis(table (N,128), idx (8,128), axis=0)   — sublane gather
  B. take_along_axis(table (8,128),  idx (8,128), axis=1)  — lane shuffle
  C. dynamic scalar read  ref[i, j]  with traced i, j
  D. dynamic row slice    ref[pl.ds(i, 8), :] with traced i
  E. throughput of the best-of-A at march-like access (chained, 64 steps)

Run serialized with all other TPU work:  python -u apps/probe_pallas_gather.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_probe(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        out = np.asarray(out)
        dt = time.perf_counter() - t0
        print(f"[{name}] OK in {dt:.1f}s: shape={out.shape} sum={out.sum():.3f}")
        return True, out
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"[{name}] FAIL: {type(e).__name__}: {msg}")
        traceback.print_exc(limit=2)
        return False, None


# --- A: sublane gather from a tall 2-D table ------------------------------
def probe_a(n_rows=4096):
    table = jnp.arange(n_rows * 128, dtype=jnp.float32).reshape(n_rows, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 37) % n_rows

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(
            tab_ref[:, :], idx_ref[:, :], axis=0
        )

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(table, idx)


# --- B: lane gather within vreg-shaped rows -------------------------------
def probe_b():
    table = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 17) % 128

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(
            tab_ref[:, :], idx_ref[:, :], axis=1
        )

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(table, idx)


# --- C: traced scalar element read ----------------------------------------
def probe_c():
    table = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)

    def kernel(tab_ref, out_ref):
        i = jnp.int32(7) + pl.program_id(0)
        acc = jnp.float32(0)

        def body(k, acc):
            return acc + tab_ref[i + k, k]

        acc = jax.lax.fori_loop(0, 16, body, acc)
        out_ref[0, 0] = acc

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(table)


# --- D: traced dynamic row slice ------------------------------------------
def probe_d():
    table = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)

    def kernel(tab_ref, out_ref):
        out = jnp.zeros((8, 128), jnp.float32)

        def body(k, out):
            start = (k * 24) % 248
            return out + tab_ref[pl.ds(start, 8), :]

        out_ref[:, :] = jax.lax.fori_loop(0, 8, body, out)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(table)


# --- E: chained-gather throughput (march access pattern) ------------------
def make_e(n_rows, rays_sub, n_steps):
    """rays = (rays_sub, 128) lanes; each step gathers one row index per ray
    from a (n_rows, 128) table, next index depends on the fetched value
    (serial dependence, like a march step)."""

    def kernel(tab_ref, idx0_ref, out_ref):
        def body(k, idx):
            v = jnp.take_along_axis(tab_ref[:, :], idx, axis=0)
            return (idx + v.astype(jnp.int32) + 1) % n_rows

        idx = jax.lax.fori_loop(0, n_steps, body, idx0_ref[:, :])
        out_ref[:, :] = idx

    @jax.jit
    def run(table, idx0):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rays_sub, 128), jnp.int32),
        )(table, idx0)

    return run


def bench_e():
    n_rows = 16384  # 16k x 128 x 4B = 8 MB table in VMEM
    rays_sub = 64  # 8192 rays
    table = (jnp.arange(n_rows * 128, dtype=jnp.int32) % 3).reshape(
        n_rows, 128
    )
    idx0 = (jnp.arange(rays_sub * 128, dtype=jnp.int32).reshape(rays_sub, 128) * 97) % n_rows

    times = {}
    for n_steps in (4, 64):
        run = make_e(n_rows, rays_sub, n_steps)
        out = np.asarray(run(table, idx0))  # compile + run
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = np.asarray(run(table, idx0))
        times[n_steps] = (time.perf_counter() - t0) / reps
    ns_per_gather = (
        (times[64] - times[4]) / (60 * rays_sub * 128) * 1e9
    )
    print(
        json.dumps(
            {
                "probe": "E_chained_sublane_gather",
                "t4_ms": round(times[4] * 1e3, 3),
                "t64_ms": round(times[64] * 1e3, 3),
                "ns_per_gathered_elem": round(ns_per_gather, 3),
                "rays": rays_sub * 128,
            }
        )
    )


def probe_canary():
    """Toolchain-regression canary (VERDICT r4 weak #7): attempt a REAL
    Mosaic compile+run of ``bilateral_filter_pallas`` (the golden-tested
    kernel that only ever runs in interpreter mode under pytest) and print
    pass/fail — run once per round, result recorded in BASELINE.md."""
    from xslam_tpu.ops.pallas_kernels import bilateral_filter_pallas
    from xslam_tpu.ops.preprocess import bilateral_filter

    depth = (np.random.default_rng(0).uniform(600, 4000, (480, 640))).astype(
        np.uint16
    )
    out = bilateral_filter_pallas(jnp.asarray(depth), interpret=False)
    ref = bilateral_filter(jnp.asarray(depth))
    err = float(np.nanmax(np.abs(np.asarray(out) - np.asarray(ref))))
    print(json.dumps({
        "canary": "bilateral_filter_pallas mosaic compile+run",
        "ok": bool(err < 1e-3),
        "max_err_vs_xla": err,
    }))
    return out


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}")
    try_probe("CANARY_bilateral_mosaic", probe_canary)
    ok_a, out_a = try_probe("A_sublane_gather", probe_a)
    if ok_a:
        exp = np.take_along_axis(
            np.arange(4096 * 128, dtype=np.float32).reshape(4096, 128),
            (np.arange(8 * 128, dtype=np.int32).reshape(8, 128) * 37) % 4096,
            axis=0,
        )
        print("A correct:", np.array_equal(out_a, exp))
    try_probe("B_lane_gather", probe_b)
    try_probe("C_scalar_read", probe_c)
    try_probe("D_dyn_row_slice", probe_d)
    if ok_a:
        try_probe("E_throughput", bench_e)


if __name__ == "__main__":
    main()

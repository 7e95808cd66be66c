"""TPU microbench for the round-2 layout decisions (brick-major volume).

Times, at canonical 256^3 / 640x480 scale, the building blocks whose costs
decide the persistent-layout design: dense<->brick transposes, pack_vg_yz,
skip_volume build, depth/volume gathers in both layouts, brick row
gather+scatter, classify_bricks, and the bilateral filter. One jit per
item, timed on the second call, closed by fetching a scalar (relay-safe).

Usage: python -u apps/probe_layout.py [item ...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("XSLAM_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from xslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.geometry.intrinsics import Intrinsics
from xslam_tpu.io.config import SlamConfig
from xslam_tpu.ops import fusion, fusion_brick, preprocess, raycast, sampling

X = Y = Z = 256
NB = (X // 8) ** 3
H, W = 480, 640
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)  # compile
    jax.tree.map(lambda a: np.asarray(a.reshape(-1)[0]) if hasattr(a, "reshape") else a, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(
            lambda a: np.asarray(a.reshape(-1)[0]) if hasattr(a, "reshape") else a, out
        )
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {1000*min(ts):9.2f} ms  (reps: {[f'{1000*t:.1f}' for t in ts]})", flush=True)


def main(items):
    want = lambda s: not items or s in items

    value = jax.random.normal(key, (X, Y, Z), jnp.float32)
    grad = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (X, Y, Z), jnp.float32)
    weight = (jax.random.uniform(jax.random.fold_in(key, 2), (X, Y, Z)) < 0.1).astype(
        jnp.float32
    )
    depth = jax.random.uniform(
        jax.random.fold_in(key, 3), (H, W), jnp.float32, 0.5, 4.0
    )
    bval = jax.random.normal(key, (NB, 512), jnp.float32)
    ids = jax.random.randint(jax.random.fold_in(key, 4), (8192,), 0, NB)

    if want("transpose"):
        # dense->brick->dense of all three planes (what integrate_brick pays)
        f = jax.jit(lambda v, g, w: [
            fusion_brick.from_bricks(fusion_brick.to_bricks(a), (X, Y, Z))
            for a in (v, g, w)
        ])
        timeit("to_bricks+from_bricks x3", f, value, grad, weight)

    if want("pack"):
        f = jax.jit(lambda v, g: sampling.pack_vg_yz(v, g))
        timeit("pack_vg_yz", f, value, grad)

    if want("skip"):
        f = jax.jit(lambda v, w: raycast.skip_volume(v, w))
        timeit("skip_volume build", f, value, weight)

    if want("rowmeta"):
        # brick-major metadata: interesting-row reduce + 32^3 distance field
        def meta(bv, bw):
            neg = jnp.any((bv < 0) & (bw > 0), axis=1)
            d = neg.reshape(32, 32, 32)
            m = d
            for ax in range(3):
                m = m | jnp.roll(m, 1, ax) | jnp.roll(m, -1, ax)
            dist = jnp.where(m, 0, 5)
            cur = m
            for k in range(1, 5):
                for ax in range(3):
                    cur = cur | jnp.roll(cur, 1, ax) | jnp.roll(cur, -1, ax)
                dist = jnp.minimum(dist, jnp.where(cur, k, 5))
            return dist.astype(jnp.int32)

        f = jax.jit(meta)
        timeit("brick-row metadata+distfield", f, bval, fusion_brick.to_bricks(weight))

    if want("depthgather"):
        n = 4_194_304
        iy = jax.random.randint(jax.random.fold_in(key, 5), (n,), 0, H)
        ix = jax.random.randint(jax.random.fold_in(key, 6), (n,), 0, W)
        f = jax.jit(lambda d, iy, ix: jnp.sum(sampling.gather2d(d, iy, ix)))
        timeit(f"depth gather2d {n/1e6:.1f}M", f, depth, iy, ix)

    if want("volgather"):
        n = 3_145_728  # ~march-sized
        gx = jax.random.randint(jax.random.fold_in(key, 7), (n,), 0, X)
        gy = jax.random.randint(jax.random.fold_in(key, 8), (n,), 0, Y)
        gz = jax.random.randint(jax.random.fold_in(key, 9), (n,), 0, Z)
        f = jax.jit(lambda v, a, b, c: jnp.sum(sampling.gather3d(v, a, b, c)))
        timeit(f"dense gather3d {n/1e6:.1f}M", f, value, gx, gy, gz)

        def g3b(bv, a, b, c):
            bid = ((a >> 3) * 32 + (b >> 3)) * 32 + (c >> 3)
            lane = ((a & 7) << 6) | ((b & 7) << 3) | (c & 7)
            return jnp.sum(jnp.take(bv.reshape(-1), bid * 512 + lane, mode="clip"))

        f = jax.jit(g3b)
        timeit(f"brick-major gather {n/1e6:.1f}M", f, bval, gx, gy, gz)

    if want("rows"):
        def rw(bv, ids):
            rows = jnp.take(bv, ids, axis=0)
            rows = rows * 1.0001
            return bv.at[ids].set(rows)

        f = jax.jit(rw)
        timeit("row gather+scatter 8192x512", f, bval, ids)

        f2 = jax.jit(lambda bv, ids: jnp.sum(jnp.take(bv, ids, axis=0)))
        timeit("row gather only 8192x512", f2, bval, ids)

    if want("rows12"):
        tbl = jax.random.normal(key, (H * W, 12), jnp.float32)
        idx = jax.random.randint(jax.random.fold_in(key, 10), (H * W,), 0, H * W)
        f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
        timeit("12-float row gather 307k", f, tbl, idx)
        tbl8 = jax.random.normal(key, (X * 128 * 128 * 4, 8), jnp.float32)
        idx8 = jax.random.randint(
            jax.random.fold_in(key, 11), (H * W * 4,), 0, tbl8.shape[0]
        )
        f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
        timeit("8-float row gather 1.2M", f, tbl8, idx8)

    if want("classify"):
        cfg = SlamConfig()
        vol_cfg = fusion.VolumeConfig((X, Y, Z), 0.03, 0.09, 100)
        intr = cfg.intrinsics
        rv = jnp.eye(3, dtype=jnp.float32)
        tv = jnp.asarray([3.2, 3.2, 3.2], jnp.float32)
        f = jax.jit(
            lambda d, r, t: fusion_brick.classify_bricks(d, r, t, intr, vol_cfg, (X, Y, Z))
        )
        timeit("classify_bricks 32^3", f, depth, rv, tv)

    if want("bilateral"):
        d16 = (depth * 1000).astype(jnp.uint16)
        f = jax.jit(preprocess.bilateral_filter)
        timeit("bilateral_filter jnp 640x480", f, d16)

    if want("scatter512"):
        rows = jax.random.normal(key, (8192, 512), jnp.float32)
        f = jax.jit(lambda bv, ids, r: bv.at[ids].set(r))
        timeit("row scatter 8192x512", f, bval, ids, rows)

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

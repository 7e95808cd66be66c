"""TPU probe: march-variant timings at canonical scale.

Builds a realistic 256^3 TSDF on the CPU backend (dense fusion of a few
synthetic frames — avoids the slow remote fusion compile), ships it to the
TPU, and times: fixed full-res march, march_skip, march_hier (full coarse),
march_hier+skip coarse, at a couple of window lengths. Also splits the
preprocessing stage to find its hot spot.

Usage: python -u apps/probe_march.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    return np.asarray(x.reshape(-1)[0])


def lap(fn, *args, reps=3):
    out = fn(*args)
    import jax

    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")]
    fetch(leaves[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")]
        fetch(leaves[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from xslam_tpu.csfd.single import lift
    from xslam_tpu.geometry import se3
    from xslam_tpu.io.config import SlamConfig
    from xslam_tpu.io.synthetic import SyntheticDataset
    from xslam_tpu.ops import fusion, preprocess, raycast

    config = SlamConfig()
    intr = config.intrinsics
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(config.tsdf_size), voxel_size=config.voxel_size,
        trunc_dist=config.trunc_dist, max_weight=config.max_integration_weight,
    )
    w2v = np.asarray(config.world2volume, np.float32)
    ds = SyntheticDataset(n_frames=6, degrees_per_frame=0.4)

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print(f"tpu device: {tpu}; building volume on {cpu} ...", flush=True)

    t0 = time.perf_counter()
    with jax.default_device(cpu):
        vol = fusion.create_volume(vol_cfg)
        integ = jax.jit(
            lambda v, d, r, t: fusion.integrate(v, d, r, t, intr, vol_cfg)
        )
        for i in range(4):
            dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
            c2v = se3.matmul(
                lift(jnp.asarray(w2v)),
                lift(jnp.asarray(ds.get_pose(i), jnp.float32)),
            )
            v2c = se3.inverse(c2v)
            vol = integ(vol, dm, se3.rotation(v2c), se3.translation(v2c))
        vol = jax.tree.map(lambda a: np.asarray(a), vol)
    print(f"volume built on cpu in {time.perf_counter()-t0:.1f}s "
          f"(occupied frac {np.mean(vol.weight > 0):.3f})", flush=True)

    value = jax.device_put(jnp.asarray(vol.value), tpu)
    weight = jax.device_put(jnp.asarray(vol.weight), tpu)

    c2v_np = w2v @ np.asarray(ds.get_pose(4), np.float32)

    @jax.jit
    def rays():
        c2v = lift(jnp.asarray(c2v_np))
        return raycast._camera_rays(se3.rotation(c2v), se3.translation(c2v), intr)

    ray_dir, ray_start = rays()
    fetch(ray_dir.v)

    results = {}
    variants = {
        "march_fixed_fullres": jax.jit(
            lambda v: raycast.march(v, ray_start, ray_dir, vol_cfg)
        ),
        "march_skip_fullres": jax.jit(
            lambda v, w: raycast.march_skip(v, w, ray_start, ray_dir, vol_cfg)
        ),
        "hier_w12": jax.jit(
            lambda v: raycast.march_hier(v, ray_start, ray_dir, vol_cfg, window=12)
        ),
        "hier_w8": jax.jit(
            lambda v: raycast.march_hier(v, ray_start, ray_dir, vol_cfg, window=8)
        ),
        "hier_skip_w12": jax.jit(
            lambda v, w: raycast.march_hier(
                v, ray_start, ray_dir, vol_cfg, window=12, weight=w
            )
        ),
        "hier2_w8": jax.jit(
            lambda v: raycast.march_hier2(v, ray_start, ray_dir, vol_cfg, window=8)
        ),
        "hier2_w6_m10": jax.jit(
            lambda v: raycast.march_hier2(
                v, ray_start, ray_dir, vol_cfg, window=6, window_mid=10
            )
        ),
    }
    for name, fn in variants.items():
        t0 = time.perf_counter()
        if "skip" in name:
            dt = lap(fn, value, weight)
        else:
            dt = lap(fn, value)
        print(f"  {name:24s} {1000*dt:8.1f} ms  (compile+warm {time.perf_counter()-t0:.0f}s)",
              flush=True)
        results[name] = dt

    # ---- preprocessing split ----------------------------------------------
    depth = jax.device_put(jnp.asarray(ds.get_depth(4)), tpu)
    pp = {
        "bilateral": jax.jit(preprocess.bilateral_filter),
        "pyr_down": jax.jit(preprocess.pyr_down),
        "vmap": jax.jit(lambda d: preprocess.create_vmap(intr, d.astype(jnp.float32))),
    }
    d0 = pp["bilateral"](depth)
    fetch(d0)
    for name, fn in pp.items():
        arg = depth if name == "bilateral" else d0
        dt = lap(fn, arg)
        print(f"  prep/{name:19s} {1000*dt:8.1f} ms", flush=True)

    vmap0 = pp["vmap"](d0)
    nmap_fn = jax.jit(preprocess.create_nmap)
    dt = lap(nmap_fn, vmap0)
    print(f"  prep/{'nmap':19s} {1000*dt:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

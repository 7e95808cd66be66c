"""TPU probe: where brick fusion's time goes at canonical scale.

Times integrate_brick end to end plus its pieces in isolation: brick
classification (+depth mips), dense<->brick transposes, the dense FAR pass,
and the active-row gather/update/scatter on a pre-bricked volume (the
persistent-brick-layout upper bound). Volume built on CPU to skip the slow
remote fusion compile.

Usage: python -u apps/probe_fusion.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(x):
    return np.asarray(x.reshape(-1)[0])


def lap(fn, *args, reps=3):
    import jax

    out = fn(*args)
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")]
    fetch(leaves[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")]
        fetch(leaves[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp

    from xslam_tpu.csfd.single import CSFD, lift
    from xslam_tpu.geometry import se3
    from xslam_tpu.io.config import SlamConfig
    from xslam_tpu.io.synthetic import SyntheticDataset
    from xslam_tpu.ops import fusion, fusion_brick

    config = SlamConfig(fusion_mode="brick")
    intr = config.intrinsics
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(config.tsdf_size), voxel_size=config.voxel_size,
        trunc_dist=config.trunc_dist, max_weight=config.max_integration_weight,
    )
    w2v = np.asarray(config.world2volume, np.float32)
    ds = SyntheticDataset(n_frames=6, degrees_per_frame=0.4)
    cap = config.fusion_brick_cap

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print(f"tpu: {tpu}", flush=True)

    with jax.default_device(cpu):
        vol = fusion.create_volume(vol_cfg)
        integ = jax.jit(lambda v, d, r, t: fusion.integrate(v, d, r, t, intr, vol_cfg))
        pose_rt = {}
        for i in range(5):
            dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
            c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), jnp.float32)))
            v2c = se3.inverse(c2v)
            pose_rt[i] = (np.asarray(se3.rotation(v2c).v), np.asarray(se3.translation(v2c).v))
            if i < 4:
                vol = integ(vol, dm, se3.rotation(v2c), se3.translation(v2c))
        vol = jax.tree.map(lambda a: np.asarray(a), vol)
        n_cls = np.asarray(
            fusion_brick.classify_bricks(
                fusion.scale_depth(jnp.asarray(ds.get_depth(4))),
                jnp.asarray(pose_rt[4][0]), jnp.asarray(pose_rt[4][1]),
                intr, vol_cfg, tuple(config.tsdf_size),
            )
        )
    uniq, counts = np.unique(n_cls, return_counts=True)
    print(f"brick classes on frame 4: {dict(zip(uniq.tolist(), counts.tolist()))} "
          f"(cap={cap})", flush=True)

    vol = fusion.VolumeState(*[jax.device_put(jnp.asarray(a), tpu) for a in vol])
    depth_m_np = np.asarray(fusion.scale_depth(jnp.asarray(ds.get_depth(4))))
    depth_m = jax.device_put(jnp.asarray(depth_m_np), tpu)
    r_np, t_np = pose_rt[4]

    @jax.jit
    def full(vol, depth_m):
        r = lift(jnp.asarray(r_np))
        t = lift(jnp.asarray(t_np))
        out, _ = fusion_brick.integrate_brick(
            vol, depth_m, r, t, intr, vol_cfg, cap=cap
        )
        return out

    dt, _ = lap(full, vol, depth_m)
    print(f"  integrate_brick full      {1000*dt:8.1f} ms", flush=True)

    @jax.jit
    def classify(depth_m):
        return fusion_brick.classify_bricks(
            depth_m, jnp.asarray(r_np), jnp.asarray(t_np), intr, vol_cfg,
            tuple(config.tsdf_size),
        )

    dt, _ = lap(classify, depth_m)
    print(f"  classify_bricks           {1000*dt:8.1f} ms", flush=True)

    to_b = jax.jit(fusion_brick.to_bricks)
    dt, vb = lap(to_b, vol.value)
    print(f"  to_bricks (one volume)    {1000*dt:8.1f} ms", flush=True)

    from_b = jax.jit(lambda b: fusion_brick.from_bricks(b, tuple(config.tsdf_size)))
    dt, _ = lap(from_b, vb)
    print(f"  from_bricks (one volume)  {1000*dt:8.1f} ms", flush=True)

    # FAR pass in isolation (dense elementwise on 3 volumes)
    @jax.jit
    def far_pass(vol):
        w = vol.weight
        w_new = jnp.minimum(w + 1.0, float(vol_cfg.max_weight))
        val = (vol.value * w + 1.0) / (w + 1.0)
        grd = (vol.grad * w) / (w + 1.0)
        m = vol.value > 0.5
        return fusion.VolumeState(
            jnp.where(m, val, vol.value), jnp.where(m, grd, vol.grad),
            jnp.where(m, w_new, vol.weight),
        )

    dt, _ = lap(far_pass, vol)
    print(f"  FAR-style dense pass      {1000*dt:8.1f} ms", flush=True)

    # active pass upper bound on a persistent brick layout: gather cap rows,
    # voxel-update, scatter back (no transposes)
    vbb = to_b(vol.value)
    gbb = to_b(vol.grad)
    wbb = to_b(vol.weight)
    NB = vbb.shape[0]
    ids = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(0, NB, cap, dtype=np.int32)), tpu
    )

    @jax.jit
    def active_rows(vb, gb, wb, ids, depth_m):
        r = lift(jnp.asarray(r_np))
        t = lift(jnp.asarray(t_np))
        v_rows = jnp.take(vb, ids, axis=0)
        g_rows = jnp.take(gb, ids, axis=0)
        w_rows = jnp.take(wb, ids, axis=0)
        B = fusion_brick.BRICK
        X, Y, Z = tuple(config.tsdf_size)
        nby, nbz = Y // B, Z // B
        bx = ids // (nby * nbz)
        by = (ids // nbz) % nby
        bz = ids % nbz
        lx = (np.arange(B**3) // (B * B)).astype(np.float32)
        ly = ((np.arange(B**3) // B) % B).astype(np.float32)
        lz = (np.arange(B**3) % B).astype(np.float32)
        vs = vol_cfg.voxel_size
        gx = ((bx * B).astype(jnp.float32)[:, None] + lx[None, :] + 0.5) * vs
        gy = ((by * B).astype(jnp.float32)[:, None] + ly[None, :] + 0.5) * vs
        gz = ((bz * B).astype(jnp.float32)[:, None] + lz[None, :] + 0.5) * vs
        v_new, g_new, w_new = fusion._voxel_update(
            gx, gy, gz, v_rows, g_rows, w_rows, depth_m, r, t, intr, vol_cfg, 0.0
        )
        vb = vb.at[ids].set(v_new)
        gb = gb.at[ids].set(g_new)
        wb = wb.at[ids].set(w_new)
        return vb, gb, wb

    dt, _ = lap(active_rows, vbb, gbb, wbb, ids, depth_m)
    print(f"  active rows g/u/s (cap)   {1000*dt:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

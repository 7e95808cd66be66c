"""TSDF fusion + raycast correctness on analytic scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.csfd.single import CSFD, lift
from xslam_tpu.geometry import se3
from xslam_tpu.ops import fusion, raycast
from xslam_tpu.io.synthetic import render_depth
from tests.helpers import SMALL_INTR, small_config, small_dataset, small_scene


def _setup(cfg):
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(cfg.tsdf_size),
        voxel_size=cfg.voxel_size,
        trunc_dist=cfg.trunc_dist,
        max_weight=cfg.max_integration_weight,
    )
    w2v = np.asarray(cfg.world2volume, np.float32)
    return vol_cfg, w2v


def _poses_to_dual(c2w_np, w2v_np):
    c2w = lift(jnp.asarray(c2w_np, jnp.float32))
    w2v = lift(jnp.asarray(w2v_np))
    c2v = se3.matmul(w2v, c2w)
    v2c = se3.inverse(c2v)
    return c2v, v2c




def test_fusion_tsdf_signs_and_zero_crossing():
    cfg = small_config()
    vol_cfg, w2v = _setup(cfg)
    ds = small_dataset(1)
    depth = ds.get_depth(0)
    c2w = ds.get_pose(0)

    c2v, v2c = _poses_to_dual(c2w, w2v)
    r_v2c, t_v2c = se3.rotation(v2c), se3.translation(v2c)

    vol = fusion.create_volume(vol_cfg)
    depth_m = fusion.scale_depth(jnp.asarray(depth))

    integ = jax.jit(
        lambda v, d, r, t: fusion.integrate(v, d, r, t, SMALL_INTR, vol_cfg)
    )
    vol = integ(vol, depth_m, r_v2c, t_v2c)
    value = np.asarray(vol.value)
    weight = np.asarray(vol.weight)

    assert weight.sum() > 0
    # check against analytic signed distance along camera rays: sample voxels
    # that were updated; their tsdf sign must match (depth_at_pixel - range)
    upd = np.argwhere(weight > 0)
    rng = np.random.default_rng(0)
    sel = upd[rng.choice(len(upd), 500, replace=False)]
    w2v_inv = np.linalg.inv(w2v)
    v2c_np = np.linalg.inv(w2v @ c2w)
    depth_m_np = np.asarray(depth_m)
    agree = 0
    for x, y, z in sel:
        p_vol = (np.array([x, y, z]) + 0.5) * vol_cfg.voxel_size
        p_cam = v2c_np[:3, :3] @ p_vol + v2c_np[:3, 3]
        u = SMALL_INTR.fx * p_cam[0] / p_cam[2] + SMALL_INTR.cx
        v = SMALL_INTR.fy * p_cam[1] / p_cam[2] + SMALL_INTR.cy
        ui, vi = int(round(u)), int(round(v))
        if not (0 <= ui < 160 and 0 <= vi < 120):
            continue
        dp = depth_m_np[vi, ui]
        if dp == 0:
            continue
        lam = np.sqrt(((u - SMALL_INTR.cx) / SMALL_INTR.fx) ** 2 + ((v - SMALL_INTR.cy) / SMALL_INTR.fy) ** 2 + 1)
        sdf = dp * lam - np.linalg.norm(p_cam)
        t = value[x, y, z]
        if abs(sdf) > 0.5 * vol_cfg.voxel_size:
            agree += (np.sign(t) == np.sign(sdf)) or abs(t) >= 0.99
    assert agree > 0.9 * len(sel) * 0.5  # at least half the sample usable, 90% agreement


def test_fusion_weight_accumulation_and_clamp():
    cfg = small_config(max_integration_weight=3)
    vol_cfg, w2v = _setup(cfg)
    ds = small_dataset(1)
    depth_m = fusion.scale_depth(jnp.asarray(ds.get_depth(0)))
    c2v, v2c = _poses_to_dual(ds.get_pose(0), w2v)
    r_v2c, t_v2c = se3.rotation(v2c), se3.translation(v2c)

    vol = fusion.create_volume(vol_cfg)
    integ = jax.jit(lambda v: fusion.integrate(v, depth_m, r_v2c, t_v2c, SMALL_INTR, vol_cfg))
    for _ in range(5):
        vol = integ(vol)
    w = np.asarray(vol.weight)
    assert w.max() == 3.0  # clamped at max_weight (TsdfFusion.cu:166)


def test_raycast_reproduces_depth():
    """Fuse several oracle-pose frames, then raycast from pose 0: the
    rendered model depth must match the analytic depth within ~a voxel."""
    cfg = small_config()
    vol_cfg, w2v = _setup(cfg)
    ds = small_dataset(5, degrees_per_frame=2.0)

    vol = fusion.create_volume(vol_cfg)
    integ = jax.jit(
        lambda v, d, r, t: fusion.integrate(v, d, r, t, SMALL_INTR, vol_cfg)
    )
    for i in range(5):
        depth_m = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        _, v2c = _poses_to_dual(ds.get_pose(i), w2v)
        vol = integ(vol, depth_m, se3.rotation(v2c), se3.translation(v2c))

    c2v, _ = _poses_to_dual(ds.get_pose(0), w2v)
    v2w = se3.inverse(lift(jnp.asarray(w2v)))
    rc = jax.jit(
        lambda vol: raycast.raycast(
            vol,
            se3.rotation(c2v),
            se3.translation(c2v),
            se3.rotation(v2w),
            se3.translation(v2w),
            SMALL_INTR,
            vol_cfg,
        )
    )
    vmap, nmap = rc(vol)
    vmap_v = np.asarray(vmap.v)

    # transform world verts into camera frame, compare z against rendered depth
    w2c = np.linalg.inv(ds.get_pose(0))
    pts = vmap_v.reshape(3, -1)
    ok = ~np.isnan(pts[0])
    cam = (w2c[:3, :3] @ pts[:, ok]) + w2c[:3, 3:4]
    depth_ref = ds.get_depth(0).astype(np.float64).reshape(-1)[ok] / 1000.0
    hit_rate = ok.mean()
    assert hit_rate > 0.7, hit_rate
    err = np.abs(cam[2] - depth_ref)
    valid_ref = depth_ref > 0
    assert np.median(err[valid_ref]) < 1.5 * vol_cfg.voxel_size

    # normals: unit length where present
    nmap_v = np.asarray(nmap.v)
    nok = ~np.isnan(nmap_v[0])
    assert nok.mean() > 0.5
    norms = np.sqrt((nmap_v**2).sum(0))[nok]
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_fusion_gradient_wrt_pose():
    """CSFD derivative through fusion: seed a translation direction in the
    v2c pose; the grad volume must match finite differences of the value
    volume (the core X-SLAM differentiability claim, B5/B6)."""
    cfg = small_config(tsdf_size=(32, 32, 32), voxel_size=0.24)
    vol_cfg, w2v = _setup(cfg)
    ds = small_dataset(1)
    depth_m = fusion.scale_depth(jnp.asarray(ds.get_depth(0)))

    def integrate_with_tz(tz_dual):
        c2w = lift(jnp.asarray(ds.get_pose(0), jnp.float32))
        w2v_d = lift(jnp.asarray(w2v))
        c2v = se3.matmul(w2v_d, c2w)
        v2c = se3.inverse(c2v)
        r = se3.rotation(v2c)
        t = se3.translation(v2c)
        t = CSFD(t.v + tz_dual.v * jnp.array([0.0, 0.0, 1.0]), t.g + tz_dual.g * jnp.array([0.0, 0.0, 1.0]))
        vol = fusion.create_volume(vol_cfg)
        # bi_threshold large => bilinear depth sampling (differentiable a.e.);
        # with the default 0.0 the reference (and we) fall back to nearest,
        # whose FD picks up staircase jumps the dual lane rightly ignores.
        return fusion.integrate(
            vol, depth_m, r, t, SMALL_INTR, vol_cfg, bi_threshold=0.5
        )

    f = jax.jit(integrate_with_tz)
    vol0 = f(CSFD(jnp.float32(0.0), jnp.float32(1.0)))  # seeded
    eps = 1e-3
    volp = f(CSFD(jnp.float32(+eps), jnp.float32(0.0)))
    volm = f(CSFD(jnp.float32(-eps), jnp.float32(0.0)))
    fd = (np.asarray(volp.value) - np.asarray(volm.value)) / (2 * eps)
    an = np.asarray(vol0.grad)
    # compare away from sampling discontinuities: voxels updated in both FD
    # evaluations with bounded slopes (FD is invalid where the +-eps poses
    # fall on different depth pixels / interpolation corners)
    mask = (
        (np.asarray(volp.weight) > 0)
        & (np.asarray(volm.weight) > 0)
        & (np.abs(fd) < 5)
        & (np.abs(an) < 5)
    )
    assert mask.sum() > 1000
    num = np.corrcoef(fd[mask], an[mask])[0, 1]
    assert num > 0.99, num
    d = np.abs(an[mask] - fd[mask])
    assert np.median(d) < 1e-3 and np.percentile(d, 95) < 0.02, (
        np.median(d), np.percentile(d, 95)
    )

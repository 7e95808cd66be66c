"""Equivalence tests for the packed row-gather fast paths.

TPU row gathers up to ~8-16 floats cost the same as a scalar gather
(BASELINE.md microbenchmarks), so the hot stages fetch packed rows:
trilinear taps read a pack_vg_yz table (2 row gathers per dual trilinear vs
16 scalar gathers) and ICP association reads 12-float prev-map rows. Both
must be BIT-identical to the scalar-gather formulations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xslam_tpu.csfd.single import CSFD, lift
from xslam_tpu.ops import icp, raycast
from xslam_tpu.ops.sampling import pack_vg_yz, trilinear_tsdf_packed


def _rand_volume(rng, shape):
    value = rng.standard_normal(shape).astype(np.float32)
    grad = 0.1 * rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(value), jnp.asarray(grad)


def _rand_points(rng, n, shape, voxel, spread=1.4):
    # points across the volume including outside (negative / beyond bounds)
    lo = -0.2 * shape[0] * voxel
    hi = spread * shape[0] * voxel
    pts = rng.uniform(lo, hi, size=(3, n)).astype(np.float32)
    g = 0.01 * rng.standard_normal((3, n)).astype(np.float32)
    return [CSFD(jnp.asarray(pts[i]), jnp.asarray(g[i])) for i in range(3)]


def test_trilinear_packed_bitwise_equal():
    rng = np.random.default_rng(0)
    shape = (32, 24, 40)
    voxel = 0.11
    value, grad = _rand_volume(rng, shape)
    px, py, pz = _rand_points(rng, 4096, shape, voxel)

    ref = raycast.trilinear_tsdf_shard(value, grad, px, py, pz, voxel)
    packed = pack_vg_yz(value, grad)
    out = trilinear_tsdf_packed(packed, shape, px, py, pz, voxel)

    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(out.v))
    np.testing.assert_array_equal(np.asarray(ref.g), np.asarray(out.g))
    # sanity: a fair share of points are interior (non-NaN)
    assert np.isfinite(np.asarray(out.v)).mean() > 0.1


def test_trilinear_packed_sharded_slab():
    """X-slab placement (x_base/x_total) matches ShardSpec semantics."""
    rng = np.random.default_rng(1)
    full = (32, 16, 16)
    voxel = 0.13
    value, grad = _rand_volume(rng, full)
    px, py, pz = _rand_points(rng, 2048, full, voxel)

    x0, x1 = 8, 24  # slab rows [8, 24) of 32
    slab_v = value[x0:x1]
    slab_g = grad[x0:x1]
    spec = raycast.ShardSpec(x_base=x0, x_total=full[0])

    ref = raycast.trilinear_tsdf_shard(slab_v, slab_g, px, py, pz, voxel, spec)
    packed = pack_vg_yz(slab_v, slab_g)
    out = trilinear_tsdf_packed(
        packed, slab_v.shape, px, py, pz, voxel, x_base=x0, x_total=full[0]
    )
    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(out.v))
    np.testing.assert_array_equal(np.asarray(ref.g), np.asarray(out.g))


def test_refine_packed_taps_equal():
    """refine() with packed_taps on/off is bit-identical end to end."""
    from tests.helpers import small_config, small_dataset

    from xslam_tpu.geometry import se3
    from xslam_tpu.ops import fusion

    cfg = small_config()
    intr = cfg.intrinsics
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(cfg.tsdf_size), voxel_size=cfg.voxel_size,
        trunc_dist=cfg.trunc_dist, max_weight=cfg.max_integration_weight,
    )
    ds = small_dataset()
    w2v = lift(jnp.asarray(cfg.world2volume, jnp.float32))
    vol = fusion.create_volume(vol_cfg)
    for i in range(3):
        c2v = se3.matmul(w2v, lift(jnp.asarray(ds.get_pose(i), jnp.float32)))
        v2c = se3.inverse(c2v)
        depth_m = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        vol = fusion.integrate(
            vol, depth_m, se3.rotation(v2c), se3.translation(v2c), intr, vol_cfg
        )

    c2v = se3.matmul(w2v, lift(jnp.asarray(ds.get_pose(3), jnp.float32)))
    v2w = se3.inverse(w2v)
    ray_dir, ray_start = raycast._camera_rays(
        se3.rotation(c2v), se3.translation(c2v), intr
    )
    hit = raycast.march(vol.value, ray_start, ray_dir, vol_cfg)
    accept = hit.t_found < jnp.minimum(hit.t_dead, raycast.INF_T)

    outs = {}
    for packed in (False, True):
        outs[packed] = raycast.refine(
            vol, ray_start, ray_dir, hit.t_found, accept,
            se3.rotation(v2w), se3.translation(v2w), vol_cfg,
            normals_mode="tsdf", packed_taps=packed,
        )
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(jnp.any(outs[True][2]))  # some pixels refined


def test_associate_rows_match_scalar_gathers():
    """Packed association == the per-plane gather2d formulation."""
    rng = np.random.default_rng(2)
    H, W = 30, 40

    def rand_map():
        v = rng.standard_normal((3, H, W)).astype(np.float32)
        v[:, rng.random((H, W)) < 0.1] = np.nan  # invalid pixels
        g = 0.1 * rng.standard_normal((3, H, W)).astype(np.float32)
        return CSFD(jnp.asarray(v), jnp.asarray(g))

    vprev, nprev = rand_map(), rand_map()
    iy = jnp.asarray(rng.integers(-5, H + 5, size=(H, W), dtype=np.int32))
    ix = jnp.asarray(rng.integers(-5, W + 5, size=(H, W), dtype=np.int32))

    def gather_map(m, iy, ix):
        # per-plane scalar-gather oracle for the packed row gather
        from xslam_tpu.ops.sampling import gather2d

        vals = jnp.stack([gather2d(m.v[c], iy, ix, fill=jnp.nan) for c in range(3)])
        grads = jnp.stack([gather2d(m.g[c], iy, ix, fill=0.0) for c in range(3)])
        return CSFD(vals, grads)

    table = icp._pack_prev_maps(vprev, nprev)
    v_rows, n_rows = icp._gather_prev_rows(table, H, W, iy, ix)
    v_ref = gather_map(vprev, iy, ix)
    n_ref = gather_map(nprev, iy, ix)

    np.testing.assert_array_equal(np.asarray(v_rows.v), np.asarray(v_ref.v))
    np.testing.assert_array_equal(np.asarray(v_rows.g), np.asarray(v_ref.g))
    np.testing.assert_array_equal(np.asarray(n_rows.v), np.asarray(n_ref.v))
    np.testing.assert_array_equal(np.asarray(n_rows.g), np.asarray(n_ref.g))


def test_pack_vg_yz_layout():
    """Spot-check the variant/row layout against direct indexing."""
    rng = np.random.default_rng(3)
    X, Y, Z = 4, 6, 8
    value = rng.standard_normal((X, Y, Z)).astype(np.float32)
    grad = rng.standard_normal((X, Y, Z)).astype(np.float32)
    packed = np.asarray(pack_vg_yz(jnp.asarray(value), jnp.asarray(grad)))
    Y2, Z2 = Y // 2, Z // 2
    stride = X * Y2 * Z2
    for gy, gz in [(0, 0), (1, 2), (3, 3), (4, 5), (2, 6)]:
        var = (gy & 1) * 2 + (gz & 1)
        j, k = gy >> 1, gz >> 1
        row = packed[var * stride + (2 * Y2 + j) * Z2 + k]  # x = 2
        for dy in (0, 1):
            for dz in (0, 1):
                m = (dy * 2 + dz) * 2
                yy, zz = gy + dy, gz + dz
                ev = value[2, yy, zz] if (yy < Y and zz < Z) else 0.0
                eg = grad[2, yy, zz] if (yy < Y and zz < Z) else 0.0
                assert row[m] == pytest.approx(ev)
                assert row[m + 1] == pytest.approx(eg)

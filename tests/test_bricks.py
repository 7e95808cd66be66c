"""Persistent brick-major volume layout: bit-equivalence with the dense
layout at every level (fusion rows, raycast events, refinement, full
engine), plus the half-resolution model-map accuracy envelope."""

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.csfd.single import CSFD, lift
from xslam_tpu.geometry import se3
from xslam_tpu.ops import bricks, fusion, fusion_brick, raycast, raycast_bricks
from xslam_tpu.models.kinfu import XSlamEngine
from tests.helpers import SMALL_INTR, small_config, small_dataset


def _vol_cfg(cfg):
    return fusion.VolumeConfig(
        tuple(cfg.tsdf_size), cfg.voxel_size, cfg.trunc_dist, cfg.max_integration_weight
    )


def _fused_states(n_frames=3):
    """Run n_frames of gt-pose fusion in both layouts; return (dense, brick)."""
    cfg = small_config()
    vol_cfg = _vol_cfg(cfg)
    w2v = np.asarray(cfg.world2volume, np.float32)
    ds = small_dataset(n_frames, degrees_per_frame=1.0)

    dense = fusion.create_volume(vol_cfg)
    brick = bricks.create(vol_cfg)
    integ_d = jax.jit(
        lambda v, d, r, t: fusion.integrate(v, d, r, t, SMALL_INTR, vol_cfg)
    )
    integ_r = jax.jit(
        lambda v, d, r, t: fusion_brick.integrate_rows(
            v, d, r, t, SMALL_INTR, vol_cfg, cap=512
        )
    )
    for i in range(n_frames):
        dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        c2v = se3.matmul(
            lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), jnp.float32))
        )
        v2c = se3.inverse(c2v)
        r, t = se3.rotation(v2c), se3.translation(v2c)
        dense = integ_d(dense, dm, r, t)
        brick, overflow = integ_r(brick, dm, r, t)
        assert not bool(overflow)
    return cfg, vol_cfg, w2v, ds, dense, brick


def test_integrate_rows_equals_dense():
    _, vol_cfg, _, _, dense, brick = _fused_states(3)
    back = bricks.to_dense(brick, vol_cfg.resolution)
    np.testing.assert_array_equal(np.asarray(dense.weight), np.asarray(back.weight))
    # value/grad: XLA fuses the two programs differently (fma /
    # reassociation), same tolerance as test_brick_fusion_equals_dense
    np.testing.assert_allclose(
        np.asarray(dense.value), np.asarray(back.value), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(dense.grad), np.asarray(back.grad), atol=1e-5)


def test_brick_gather_matches_gather3d():
    from xslam_tpu.ops.sampling import gather3d

    rng = np.random.default_rng(0)
    res = (16, 24, 32)
    v = jnp.asarray(rng.standard_normal(res).astype(np.float32))
    bv = fusion_brick.to_bricks(v)
    ix = jnp.asarray(rng.integers(-3, res[0] + 3, size=500, dtype=np.int32))
    iy = jnp.asarray(rng.integers(-3, res[1] + 3, size=500, dtype=np.int32))
    iz = jnp.asarray(rng.integers(-3, res[2] + 3, size=500, dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(bricks.gather(bv, res, ix, iy, iz, fill=-7.0)),
        np.asarray(gather3d(v, ix, iy, iz, fill=-7.0)),
    )


def test_skip_rows_equals_skip_volume():
    # compare both packings on the SAME volume data (the two fusion paths
    # agree only to float-reassociation level, which could flip borderline
    # signs) — convert the brick state to dense for the dense packing
    _, vol_cfg, _, _, _, brick = _fused_states(2)
    dense_twin = bricks.to_dense(brick, vol_cfg.resolution)
    dense_packed = raycast.skip_volume(dense_twin.value, dense_twin.weight)
    rows_packed = bricks.skip_rows(brick, vol_cfg.resolution)
    np.testing.assert_array_equal(
        np.asarray(dense_packed),
        np.asarray(fusion_brick.from_bricks(rows_packed, vol_cfg.resolution)),
    )


def test_raycast_bricks_equals_dense_raycast():
    """raycast_bricks in 'skip' mode must reproduce the dense engine's
    march='skip' raycast bit-for-bit (events + trilinear refinement +
    normals, both modes)."""
    cfg, vol_cfg, w2v, ds, _, brick = _fused_states(2)
    dense = bricks.to_dense(brick, vol_cfg.resolution)  # identical data
    c2v = se3.matmul(
        lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(1), jnp.float32))
    )
    v2w = se3.inverse(lift(jnp.asarray(w2v)))
    args = (
        se3.rotation(c2v), se3.translation(c2v),
        se3.rotation(v2w), se3.translation(v2w),
    )
    for normals in ("screen", "tsdf"):
        for packed_taps in (False, True):
            vm_d, nm_d = jax.jit(
                lambda vol, a, b, c, d, normals=normals: raycast.raycast(
                    vol, a, b, c, d, SMALL_INTR, vol_cfg,
                    normals_mode=normals, march_mode="skip", packed_taps=False,
                )
            )(dense, *args)
            vm_b, nm_b = jax.jit(
                lambda vol, a, b, c, d, normals=normals, pt=packed_taps:
                raycast_bricks.raycast_bricks(
                    vol, a, b, c, d, SMALL_INTR, vol_cfg,
                    normals_mode=normals, march_mode="skip", packed_taps=pt,
                )
            )(brick, *args)
            if normals == "tsdf" and packed_taps:
                # the packed reader is bit-identical op-by-op (see
                # test_trilinear_packed_bricks_bit_identical) but the big
                # tsdf-normal jit makes XLA pick different fma contractions
                # for the one-hot-dot formulation: 1-ulp noise in the
                # vertices, ~1e-11 in the normal lanes
                np.testing.assert_allclose(
                    np.asarray(vm_d.v), np.asarray(vm_b.v), atol=1e-6
                )
                np.testing.assert_allclose(
                    np.asarray(vm_d.g), np.asarray(vm_b.g), atol=1e-6
                )
                np.testing.assert_allclose(
                    np.asarray(nm_d.v), np.asarray(nm_b.v), atol=1e-6
                )
                np.testing.assert_allclose(
                    np.asarray(nm_d.g), np.asarray(nm_b.g), atol=1e-6
                )
            else:
                np.testing.assert_array_equal(np.asarray(vm_d.v), np.asarray(vm_b.v))
                np.testing.assert_array_equal(np.asarray(vm_d.g), np.asarray(vm_b.g))
                np.testing.assert_array_equal(np.asarray(nm_d.v), np.asarray(nm_b.v))
                np.testing.assert_array_equal(np.asarray(nm_d.g), np.asarray(nm_b.g))


def _run_engine(ds, n, **over):
    cfg = small_config(end_frame=n, **over)
    eng = XSlamEngine(cfg)
    st = eng.init_state()
    poses = []
    for i in range(n):
        st, res = eng.process_frame(st, ds.get_depth(i))
        poses.append(np.asarray(res.camera2world.v))
        assert not bool(res.fusion_overflow)
    return st, poses, eng


def test_brick_engine_matches_dense_engine():
    """Full tracking runs: volume_layout='brick' (march skip) must produce
    the exact poses of the dense layout with fusion_mode='brick' +
    march='skip' (all stages bit-equivalent)."""
    ds = small_dataset(5, degrees_per_frame=1.0)
    common = dict(
        fusion_mode="brick", raycast_march="skip", raycast_normals="screen",
        raycast_packed_taps=False,
    )
    _, poses_d, _ = _run_engine(ds, 5, volume_layout="dense", **common)
    st_b, poses_b, eng_b = _run_engine(ds, 5, volume_layout="brick", **common)
    for pd, pb in zip(poses_d, poses_b):
        np.testing.assert_array_equal(pd, pb)
    # dense_volume round-trip sanity
    dv = eng_b.dense_volume(st_b)
    assert dv.value.shape == tuple(eng_b.config.tsdf_size)


def test_brick_engine_halfres_model_maps_ate():
    """model_map_level=1 (half-res raycast model maps) must stay inside the
    tracking-accuracy envelope on the small workload.

    num_levels=2 here, NOT the default 3: model_map_level shifts the whole
    ICP pyramid down one level, so 3 levels on 160x120 input leave a 20x15-px
    coarsest alignment — measured to be noise-dominated (a 1e-5 fma
    difference in the fused volume flips ATE 0.02 <-> 0.22, with the FIXED
    reference march too, i.e. independent of any fast path). The coarsest
    level must keep enough pixels; the 640x480 bench keeps 80x60 at
    num_levels=3 + model_map_level=1 and is unaffected."""
    from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first

    n = 8
    ds = small_dataset(n, degrees_per_frame=1.0)
    _, poses, _ = _run_engine(
        ds, n,
        volume_layout="brick", fusion_mode="brick", raycast_march="skip",
        raycast_normals="screen", model_map_level=1, icp_fixed_assoc=True,
        num_levels=2,
    )
    gt = normalize_to_first([ds.get_pose(i) for i in range(n)])
    est = normalize_to_first(poses)
    ate = ate_rmse(est, gt)
    # envelope: the full-res dense run achieves ~0.02 m at this scale
    # (voxels are 12 cm here); half-res model maps must stay comparable
    assert ate < 0.05, f"ATE {ate} out of envelope"


def test_trilinear_packed_bricks_bit_identical():
    """pack_vg_z9 + trilinear_packed_bricks (4 row gathers) must reproduce
    trilinear_bricks (16 scalar gathers) BIT-FOR-BIT at random dual points,
    including points straddling brick boundaries in every axis."""
    _, vol_cfg, _, _, _, brick = _fused_states(2)
    res = vol_cfg.resolution
    rng = np.random.default_rng(3)
    n = 4096
    extent = np.asarray(res, np.float32) * vol_cfg.voxel_size
    # cover the full volume incl. edges/outside (the not-ok branch) and
    # cluster extra points tightly around brick boundaries (multiples of
    # 8 * voxel) where the z9 augmentation lane is exercised
    pts = rng.uniform(-0.05, 1.05, size=(n, 3)).astype(np.float32) * extent
    k = n // 4
    bvox = rng.integers(1, np.asarray(res) // 8, size=(k, 3)) * 8
    pts[:k] = (bvox + rng.uniform(-0.26, 0.26, size=(k, 3))) * vol_cfg.voxel_size
    g = rng.normal(size=(n, 3)).astype(np.float32) * 0.01

    px = CSFD(jnp.asarray(pts[:, 0]), jnp.asarray(g[:, 0]))
    py = CSFD(jnp.asarray(pts[:, 1]), jnp.asarray(g[:, 1]))
    pz = CSFD(jnp.asarray(pts[:, 2]), jnp.asarray(g[:, 2]))

    ref = jax.jit(
        lambda px, py, pz: raycast_bricks.trilinear_bricks(
            brick, res, px, py, pz, vol_cfg.voxel_size
        )
    )(px, py, pz)
    table = bricks.pack_vg_z9(brick, res)
    fast = jax.jit(
        lambda t, px, py, pz: raycast_bricks.trilinear_packed_bricks(
            t, res, px, py, pz, vol_cfg.voxel_size
        )
    )(table, px, py, pz)

    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(fast.v))
    np.testing.assert_array_equal(np.asarray(ref.g), np.asarray(fast.g))


def test_raycast_bricks_packed_taps_bit_identical():
    """The full brick raycast with packed_taps on/off must emit identical
    model maps (the packed table only reroutes the refinement gathers)."""
    cfg, vol_cfg, w2v, ds, _, brick = _fused_states(3)
    pose = jnp.asarray(ds.get_pose(2), jnp.float32)
    c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(pose))
    v2w = lift(jnp.asarray(np.linalg.inv(w2v), jnp.float32))
    intr1 = SMALL_INTR.level(1)
    args = (
        brick, se3.rotation(c2v), se3.translation(c2v),
        se3.rotation(v2w), se3.translation(v2w),
    )
    vm_ref, nm_ref = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, intr1, vol_cfg,
            normals_mode="screen", march_mode="skip", packed_taps=False,
        )
    )(*args)
    vm_fast, nm_fast = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, intr1, vol_cfg,
            normals_mode="screen", march_mode="skip", packed_taps=True,
        )
    )(*args)
    np.testing.assert_array_equal(np.asarray(vm_ref.v), np.asarray(vm_fast.v))
    np.testing.assert_array_equal(np.asarray(vm_ref.g), np.asarray(vm_fast.g))
    np.testing.assert_array_equal(np.asarray(nm_ref.v), np.asarray(nm_fast.v))
    np.testing.assert_array_equal(np.asarray(nm_ref.g), np.asarray(nm_fast.g))


def test_skip_gran4_events_identical():
    """The 4^3 sub-brick skip field must produce IDENTICAL march events
    (t_found, t_dead) and model maps to the 8^3 brick field — empty-space
    skipping never changes events, only how fast free space is crossed."""
    cfg, vol_cfg, w2v, ds, _, brick = _fused_states(3)
    res = vol_cfg.resolution
    c2v = se3.matmul(
        lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(2), jnp.float32))
    )
    ray_dir, ray_start = raycast._camera_rays(
        se3.rotation(c2v), se3.translation(c2v), SMALL_INTR
    )

    def march_with(gran):
        packed = (
            bricks.skip_rows(brick, res) if gran == 8
            else bricks.skip_rows4(brick, res)
        )
        read = raycast_bricks._value_reader(packed, res)
        return raycast.march_skip(
            None, None, ray_start, ray_dir, vol_cfg,
            packed_read=read, shape=res, jump_unit=gran,
        )

    h8 = jax.jit(lambda: march_with(8))()
    h4 = jax.jit(lambda: march_with(4))()
    np.testing.assert_array_equal(np.asarray(h8.t_found), np.asarray(h4.t_found))
    np.testing.assert_array_equal(np.asarray(h8.t_dead), np.asarray(h4.t_dead))

    # and through the full raycast (bench path): identical maps
    v2w = se3.inverse(lift(jnp.asarray(w2v)))
    args = (
        brick, se3.rotation(c2v), se3.translation(c2v),
        se3.rotation(v2w), se3.translation(v2w),
    )
    vm8, nm8 = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, SMALL_INTR, vol_cfg, normals_mode="screen",
            march_mode="skip", skip_gran=8,
        )
    )(*args)
    vm4, nm4 = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, SMALL_INTR, vol_cfg, normals_mode="screen",
            march_mode="skip", skip_gran=4,
        )
    )(*args)
    np.testing.assert_array_equal(np.asarray(vm8.v), np.asarray(vm4.v))
    np.testing.assert_array_equal(np.asarray(vm8.g), np.asarray(vm4.g))
    np.testing.assert_array_equal(np.asarray(nm8.v), np.asarray(nm4.v))
    np.testing.assert_array_equal(np.asarray(nm8.g), np.asarray(nm4.g))


def test_march_skip_compact_bit_identical():
    """The survivor-compacted march must produce BIT-IDENTICAL events and
    model maps to the lockstep while_loop march at both skip granularities
    (the per-ray integer step counter makes each ray's sample grid
    independent of which compaction batch it marches in). Exercises a
    deliberately undersized capacity schedule so the final exact sweep also
    runs live iterations."""
    cfg, vol_cfg, w2v, ds, _, brick = _fused_states(3)
    res = vol_cfg.resolution
    c2v = se3.matmul(
        lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(2), jnp.float32))
    )
    ray_dir, ray_start = raycast._camera_rays(
        se3.rotation(c2v), se3.translation(c2v), SMALL_INTR
    )

    for gran in (8, 4):
        packed = (
            bricks.skip_rows(brick, res) if gran == 8
            else bricks.skip_rows4(brick, res)
        )
        read = raycast_bricks._value_reader(packed, res)
        ref = jax.jit(
            lambda read=read, gran=gran: raycast.march_skip(
                None, None, ray_start, ray_dir, vol_cfg,
                packed_read=read, shape=res, jump_unit=gran,
            )
        )()
        for phases in (raycast.COMPACT_PHASES, ((6, 1.0), (4, 0.05))):
            out = jax.jit(
                lambda read=read, gran=gran, phases=phases:
                raycast.march_skip_compact(
                    None, None, ray_start, ray_dir, vol_cfg,
                    packed_read=read, shape=res, jump_unit=gran,
                    phases=phases,
                )
            )()
            np.testing.assert_array_equal(
                np.asarray(ref.t_found), np.asarray(out.t_found)
            )
            np.testing.assert_array_equal(
                np.asarray(ref.t_dead), np.asarray(out.t_dead)
            )

    # and through the full brick raycast (bench path): identical maps
    v2w = se3.inverse(lift(jnp.asarray(w2v)))
    args = (
        brick, se3.rotation(c2v), se3.translation(c2v),
        se3.rotation(v2w), se3.translation(v2w),
    )
    vm_r, nm_r = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, SMALL_INTR, vol_cfg, normals_mode="screen",
            march_mode="skip", compact=False,
        )
    )(*args)
    vm_c, nm_c = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, SMALL_INTR, vol_cfg, normals_mode="screen",
            march_mode="skip", compact=True,
        )
    )(*args)
    np.testing.assert_array_equal(np.asarray(vm_r.v), np.asarray(vm_c.v))
    np.testing.assert_array_equal(np.asarray(vm_r.g), np.asarray(vm_c.g))
    np.testing.assert_array_equal(np.asarray(nm_r.v), np.asarray(nm_c.v))
    np.testing.assert_array_equal(np.asarray(nm_r.g), np.asarray(nm_c.g))


def test_trilinear_pair_bricks_bit_identical():
    """interleave_vg + trilinear_pair_bricks (8 two-wide row gathers) must
    reproduce trilinear_bricks (16 scalar gathers) BIT-FOR-BIT at random
    dual points, including boundary/outside points (the not-ok branches)."""
    _, vol_cfg, _, _, _, brick = _fused_states(2)
    res = vol_cfg.resolution
    rng = np.random.default_rng(5)
    n = 4096
    extent = np.asarray(res, np.float32) * vol_cfg.voxel_size
    pts = rng.uniform(-0.05, 1.05, size=(n, 3)).astype(np.float32) * extent
    k = n // 4
    bvox = rng.integers(1, np.asarray(res) // 8, size=(k, 3)) * 8
    pts[:k] = (bvox + rng.uniform(-0.26, 0.26, size=(k, 3))) * vol_cfg.voxel_size
    g = rng.normal(size=(n, 3)).astype(np.float32) * 0.01

    px = CSFD(jnp.asarray(pts[:, 0]), jnp.asarray(g[:, 0]))
    py = CSFD(jnp.asarray(pts[:, 1]), jnp.asarray(g[:, 1]))
    pz = CSFD(jnp.asarray(pts[:, 2]), jnp.asarray(g[:, 2]))

    ref = jax.jit(
        lambda px, py, pz: raycast_bricks.trilinear_bricks(
            brick, res, px, py, pz, vol_cfg.voxel_size
        )
    )(px, py, pz)
    vg = raycast_bricks.interleave_vg(brick)
    fast = jax.jit(
        lambda t, px, py, pz: raycast_bricks.trilinear_pair_bricks(
            t, res, px, py, pz, vol_cfg.voxel_size
        )
    )(vg, px, py, pz)

    np.testing.assert_array_equal(np.asarray(ref.v), np.asarray(fast.v))
    np.testing.assert_array_equal(np.asarray(ref.g), np.asarray(fast.g))


def test_raycast_bricks_pair_taps_bit_identical():
    """The full brick raycast with pair_taps on/off must emit identical
    model maps (the pair table only reroutes the refinement gathers)."""
    cfg, vol_cfg, w2v, ds, _, brick = _fused_states(3)
    pose = jnp.asarray(ds.get_pose(2), jnp.float32)
    c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(pose))
    v2w = lift(jnp.asarray(np.linalg.inv(w2v), jnp.float32))
    intr1 = SMALL_INTR.level(1)
    args = (
        brick, se3.rotation(c2v), se3.translation(c2v),
        se3.rotation(v2w), se3.translation(v2w),
    )
    vm_ref, nm_ref = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, intr1, vol_cfg,
            normals_mode="screen", march_mode="skip", packed_taps=False,
        )
    )(*args)
    vm_fast, nm_fast = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, intr1, vol_cfg,
            normals_mode="screen", march_mode="skip", packed_taps=False,
            pair_taps=True,
        )
    )(*args)
    np.testing.assert_array_equal(np.asarray(vm_ref.v), np.asarray(vm_fast.v))
    np.testing.assert_array_equal(np.asarray(vm_ref.g), np.asarray(vm_fast.g))
    np.testing.assert_array_equal(np.asarray(nm_ref.v), np.asarray(nm_fast.v))
    np.testing.assert_array_equal(np.asarray(nm_ref.g), np.asarray(nm_fast.g))


def test_raycast_bricks_quad_taps_bit_identical():
    """The full brick raycast with quad_taps on/off must emit identical
    model maps (the interleave_vg4 table only reroutes the refinement
    gathers; its z+1 lane pairing across brick boundaries exploits the
    bz-fastest row order — this pins that claim)."""
    cfg, vol_cfg, w2v, ds, _, brick = _fused_states(3)
    pose = jnp.asarray(ds.get_pose(2), jnp.float32)
    c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(pose))
    v2w = lift(jnp.asarray(np.linalg.inv(w2v), jnp.float32))
    intr1 = SMALL_INTR.level(1)
    args = (
        brick, se3.rotation(c2v), se3.translation(c2v),
        se3.rotation(v2w), se3.translation(v2w),
    )
    vm_ref, nm_ref = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, intr1, vol_cfg,
            normals_mode="screen", march_mode="skip", packed_taps=False,
        )
    )(*args)
    vm_fast, nm_fast = jax.jit(
        lambda *a: raycast_bricks.raycast_bricks(
            *a, intr1, vol_cfg,
            normals_mode="screen", march_mode="skip", packed_taps=False,
            quad_taps=True,
        )
    )(*args)
    np.testing.assert_array_equal(np.asarray(vm_ref.v), np.asarray(vm_fast.v))
    np.testing.assert_array_equal(np.asarray(vm_ref.g), np.asarray(vm_fast.g))
    np.testing.assert_array_equal(np.asarray(nm_ref.v), np.asarray(nm_fast.v))
    np.testing.assert_array_equal(np.asarray(nm_ref.g), np.asarray(nm_fast.g))


def test_interleave_vg4_rows():
    """interleave_vg4 row semantics: row flat_index(res,x,y,z) holds
    [v(z), g(z), v(z+1), g(z+1)] including across brick boundaries."""
    rng = np.random.default_rng(3)
    res = (16, 16, 16)
    v = rng.normal(size=res).astype(np.float32)
    g = rng.normal(size=res).astype(np.float32)
    brick = bricks.from_dense(jnp.asarray(v), jnp.asarray(g), jnp.asarray(v))
    vg4 = np.asarray(raycast_bricks.interleave_vg4(brick, res))
    for (x, y, z) in [(0, 0, 0), (3, 5, 6), (3, 5, 7), (8, 9, 7), (15, 15, 14)]:
        row = vg4[int(np.asarray(bricks.flat_index(res, x, y, z)))]
        assert row[0] == v[x, y, z] and row[1] == g[x, y, z]
        assert row[2] == v[x, y, z + 1] and row[3] == g[x, y, z + 1]

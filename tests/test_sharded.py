"""Sharded (8-virtual-device CPU mesh) vs single-chip equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xslam_tpu.models.kinfu import XSlamEngine
from xslam_tpu.parallel.engine import ShardedXSlamEngine
from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first
from tests.helpers import small_config, small_dataset


@pytest.fixture(scope="module")
def runs():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    cfg = small_config(end_frame=5)
    ds = small_dataset(5, degrees_per_frame=0.5)

    single = XSlamEngine(cfg)
    s_state = single.init_state()
    sharded = ShardedXSlamEngine(cfg, n_devices=8)
    p_state = sharded.init_state()

    for i in range(len(ds)):
        d = ds.get_depth(i)
        s_state, s_res = single.process_frame(s_state, d)
        p_state, p_res = sharded.process_frame(p_state, d)
        single.log_pose(s_res)
        sharded.log_pose(p_res)
    return single, s_state, sharded, p_state


def test_sharded_volume_matches_single(runs):
    single, s_state, sharded, p_state = runs
    sv = np.asarray(s_state.volume.value)
    pv = np.asarray(p_state.volume.value)
    sw = np.asarray(s_state.volume.weight)
    pw = np.asarray(p_state.volume.weight)
    # weights must agree exactly; values bit-tolerant (different reduction
    # orders across the pose chain)
    assert (sw != pw).mean() < 1e-4
    both = (sw > 0) & (pw > 0)
    np.testing.assert_allclose(sv[both], pv[both], atol=5e-3)


def test_sharded_poses_match_single(runs):
    single, _, sharded, _ = runs
    for ps, pp in zip(single.pose_log, sharded.pose_log):
        np.testing.assert_allclose(ps, pp, atol=1e-3)


def test_sharded_tracking_accuracy(runs):
    _, _, sharded, _ = runs
    ds = small_dataset(5, degrees_per_frame=0.5)
    est = normalize_to_first(sharded.pose_log)
    gt = normalize_to_first([ds.get_pose(i) for i in range(5)])
    assert ate_rmse(est, gt) < 0.06


def test_sharded_align_ok(runs):
    _, _, _, p_state = runs
    assert bool(p_state.last_align_ok)


def test_sharded_fast_config_matches_single():
    """Sharded engine with the fast options (brick fusion per shard, screen
    normals, fixed assoc) matches the single-chip fast engine."""
    cfg = small_config(
        end_frame=3, fusion_mode="brick", fusion_brick_cap=1024,
        raycast_normals="screen",
    )
    ds = small_dataset(3, degrees_per_frame=0.5)
    single = XSlamEngine(cfg)
    s_state = single.init_state()
    sharded = ShardedXSlamEngine(cfg, n_devices=8)
    p_state = sharded.init_state()
    for i in range(3):
        d = ds.get_depth(i)
        s_state, s_res = single.process_frame(s_state, d)
        p_state, p_res = sharded.process_frame(p_state, d)
        np.testing.assert_allclose(
            np.asarray(s_res.camera2world.v), np.asarray(p_res.camera2world.v), atol=1e-3
        )
    sw, pw = np.asarray(s_state.volume.weight), np.asarray(p_state.volume.weight)
    assert (sw != pw).mean() < 1e-4


def test_sharded_bench_config_matches_single():
    """The EXACT bench.py configuration (persistent brick-major layout, skip
    march, half-res model maps with central-difference screen normals,
    per-level fixed ICP correspondences) on the 8-device mesh must track
    identically to the single-chip engine — the multi-chip fast path
    (sharded_integrate_rows + sharded_raycast_bricks, the round-3 wiring)."""
    cfg = small_config(
        end_frame=4,
        volume_layout="brick",
        fusion_mode="brick",
        fusion_brick_cap=6144,
        raycast_normals="screen",
        raycast_march="skip",
        model_map_level=1,
        icp_fixed_assoc=True,
        # 2 pyramid levels, not 3: with model_map_level=1 the coarsest ICP
        # level at 160x120 input would be 20x15 px — noise-dominated
        # alignment that flips chaotically under fp-reduction-order noise
        # (see test_brick_engine_halfres_model_maps_ate); the 640x480 bench
        # keeps 80x60 at num_levels=3 and is unaffected
        num_levels=2,
    )
    ds = small_dataset(4, degrees_per_frame=0.5)
    single = XSlamEngine(cfg)
    s_state = single.init_state()
    sharded = ShardedXSlamEngine(cfg, n_devices=8)
    p_state = sharded.init_state()
    for i in range(4):
        d = ds.get_depth(i)
        s_state, s_res = single.process_frame(s_state, d)
        p_state, p_res = sharded.process_frame(p_state, d)
        # frame 1 proves the wiring is exact: the only divergence source is
        # the psum'd ICP reduction order (measured 1.2e-7); the pose->fusion->
        # map feedback loop then amplifies that FP noise chaotically, so
        # later frames get a drift bound rather than bit-tolerance
        atol = 1e-5 if i <= 1 else 2e-2
        np.testing.assert_allclose(
            np.asarray(s_res.camera2world.v), np.asarray(p_res.camera2world.v),
            atol=atol,
        )
        assert bool(p_res.align_ok)
        assert not bool(p_res.fusion_overflow)
    # brick rows must agree up to the same amplified-noise class: weight
    # mismatches confined to brick-classification edge flips, value error
    # concentrated at sign-crossing voxels under slightly different poses
    sw, pw = np.asarray(s_state.volume.weight), np.asarray(p_state.volume.weight)
    assert (sw != pw).mean() < 2e-3
    sv, pv = np.asarray(s_state.volume.value), np.asarray(p_state.volume.value)
    both = (sw > 0) & (pw > 0)
    assert np.abs(sv[both] - pv[both]).mean() < 1e-2


def test_sharded_hier_bench_config_matches_single():
    """The round-3-continuation bench fast path (hier_skip march + pair-table
    taps, the current bench.py defaults) through the sharded engine must
    track the single-chip engine within the same amplified-FP-noise envelope
    as the skip-march bench config above."""
    cfg = small_config(
        end_frame=4,
        volume_layout="brick",
        fusion_mode="brick",
        fusion_brick_cap=6144,
        raycast_normals="screen",
        raycast_march="hier_skip",
        model_map_level=1,
        icp_fixed_assoc=True,
        num_levels=2,  # see test_sharded_bench_config_matches_single
    )
    assert cfg.raycast_pair_taps  # the bench default must be under test
    ds = small_dataset(4, degrees_per_frame=0.5)
    single = XSlamEngine(cfg)
    s_state = single.init_state()
    sharded = ShardedXSlamEngine(cfg, n_devices=8)
    p_state = sharded.init_state()
    for i in range(4):
        d = ds.get_depth(i)
        s_state, s_res = single.process_frame(s_state, d)
        p_state, p_res = sharded.process_frame(p_state, d)
        # the hier march is NOT bit-equal across column shards: full-res rays
        # next to a shard boundary take their window-repair anchor from their
        # own shard's nearest coarse column, which can differ from the global
        # ::2 neighbour the single-chip repair uses — an approximation-class
        # divergence (~1e-5 pose at frame 1, measured), not a wiring error;
        # later frames get the usual chaotic-amplification drift bound
        atol = 1e-3 if i <= 1 else 2e-2
        np.testing.assert_allclose(
            np.asarray(s_res.camera2world.v), np.asarray(p_res.camera2world.v),
            atol=atol,
        )
        assert bool(p_res.align_ok)
    sw, pw = np.asarray(s_state.volume.weight), np.asarray(p_state.volume.weight)
    assert (sw != pw).mean() < 2e-3


def test_config_surface_parity_single_vs_sharded():
    """Fail-fast contract (SURVEY §2.E): the multi-chip engine is a declared
    deployment path and must honor the SAME SlamConfig surface as the
    single-chip engine. Source-level check: every ``config.<knob>`` the
    single-chip step module reads, the sharded step module reads too (and
    vice versa) — a knob silently ignored by one engine is exactly the bug
    class this pins (e.g. round-3's min_inlier_fraction no-op)."""
    import pathlib
    import re

    import xslam_tpu.models.kinfu as kinfu_mod
    import xslam_tpu.parallel.engine as sharded_mod
    from xslam_tpu.io.config import SlamConfig

    def knobs(mod):
        text = pathlib.Path(mod.__file__).read_text()
        return set(re.findall(r"\bconfig\.([a-z_]+)\b", text))

    fields = set(vars(SlamConfig()).keys()) | {
        "trunc_dist", "angle_thres_sine", "intrinsics", "world2volume"
    }
    single = knobs(kinfu_mod) & fields
    sharded = knobs(sharded_mod) & fields
    assert single == sharded, (
        f"config knobs read by only one engine: "
        f"single-only={sorted(single - sharded)}, "
        f"sharded-only={sorted(sharded - single)}"
    )


def test_sharded_min_inlier_gate_matches_single():
    """min_inlier_fraction must gate the sharded step identically to the
    single-chip step (round-3 verdict: it was a silent no-op on --sharded).
    An absurdly high support requirement rejects every post-first frame on
    BOTH engines; the knob off accepts on both."""
    ds = small_dataset(3, degrees_per_frame=0.5)
    for fraction, expect_ok in ((0.999, False), (0.0, True)):
        cfg = small_config(end_frame=3, min_inlier_fraction=fraction)
        single = XSlamEngine(cfg)
        s_state = single.init_state()
        sharded = ShardedXSlamEngine(cfg, n_devices=8)
        p_state = sharded.init_state()
        for i in range(3):
            d = ds.get_depth(i)
            s_state, s_res = single.process_frame(s_state, d)
            p_state, p_res = sharded.process_frame(p_state, d)
            assert bool(s_res.align_ok) == bool(p_res.align_ok)
            if i > 0:
                assert bool(p_res.align_ok) == expect_ok
            # rejected frames freeze the pose identically on both engines
            np.testing.assert_allclose(
                np.asarray(s_res.camera2world.v),
                np.asarray(p_res.camera2world.v), atol=1e-3,
            )


def test_sharded_process_frames_scan_matches_loop():
    """The sharded engine's one-dispatch lax.scan multi-frame entry must
    reproduce its per-frame loop (same contract as the single-chip
    test_process_frames_scan_matches_loop)."""
    n = 4
    ds = small_dataset(n, degrees_per_frame=0.5)
    cfg = small_config(
        end_frame=n, volume_layout="brick", fusion_mode="brick",
        fusion_brick_cap=6144, raycast_march="skip", raycast_normals="screen",
        model_map_level=1, icp_fixed_assoc=True, num_levels=2,
    )
    loop = ShardedXSlamEngine(cfg, n_devices=8)
    st = loop.init_state()
    poses_loop = []
    for i in range(n):
        st, res = loop.process_frame(st, ds.get_depth(i))
        poses_loop.append(np.asarray(res.camera2world.v))

    scan = ShardedXSlamEngine(cfg, n_devices=8)
    st2 = scan.init_state()
    depths = jnp.stack([jnp.asarray(ds.get_depth(i)) for i in range(n)])
    st2, res = scan.process_frames(st2, depths)
    poses_scan = np.asarray(res.camera2world.v)
    assert poses_scan.shape == (n, 4, 4)
    assert bool(np.asarray(res.align_ok).all())
    np.testing.assert_array_equal(poses_loop[0], poses_scan[0])
    for i in range(1, n):
        np.testing.assert_allclose(poses_loop[i], poses_scan[i], atol=2e-3)


def test_sharded_temporal_march_matches_single():
    """raycast_march='temporal' through the sharded engine (column-sliced
    anchors + per-shard refresh cond) tracks the single-chip temporal
    engine within the hier-mode approximation envelope, and the anchors
    stay live (the temporal branch actually runs after bootstrap)."""
    cfg = small_config(
        end_frame=4,
        volume_layout="brick",
        fusion_mode="brick",
        fusion_brick_cap=6144,
        raycast_normals="screen",
        raycast_march="temporal",
        model_map_level=1,
        icp_fixed_assoc=True,
        num_levels=2,  # see test_sharded_bench_config_matches_single
    )
    ds = small_dataset(4, degrees_per_frame=0.5)
    single = XSlamEngine(cfg)
    s_state = single.init_state()
    sharded = ShardedXSlamEngine(cfg, n_devices=8)
    p_state = sharded.init_state()
    for i in range(4):
        d = ds.get_depth(i)
        s_state, s_res = single.process_frame(s_state, d)
        p_state, p_res = sharded.process_frame(p_state, d)
        atol = 1e-3 if i <= 1 else 2e-2
        np.testing.assert_allclose(
            np.asarray(s_res.camera2world.v), np.asarray(p_res.camera2world.v),
            atol=atol,
        )
        assert bool(p_res.align_ok)
    assert np.isfinite(np.asarray(p_state.t_prev)).mean() > 0.5
    assert p_state.t_prev.shape == s_state.t_prev.shape

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

"""End-to-end SLAM on a synthetic scene: tracking accuracy (ATE RMSE).

The in-repo substitute for the reference's ICL-NUIM run + offline pose
comparison (Experiments/test_xkinect_fusion/main.cpp:46-83)."""

import jax
import numpy as np
import pytest

from xslam_tpu.models.kinfu import XSlamEngine
from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first
from tests.helpers import small_config, small_dataset


@pytest.fixture(scope="module")
def slam_run():
    cfg = small_config(end_frame=8)
    ds = small_dataset(8, degrees_per_frame=0.5)
    engine = XSlamEngine(cfg)
    state = engine.init_state()
    results = []
    for i in range(len(ds)):
        state, res = engine.process_frame(state, ds.get_depth(i))
        engine.log_pose(res)
        results.append(res)
    return cfg, ds, engine, state, results


def test_all_frames_align(slam_run):
    _, _, _, _, results = slam_run
    for i, r in enumerate(results):
        assert bool(r.align_ok), f"frame {i} failed to align"


def test_ate_rmse_within_bound(slam_run):
    cfg, ds, engine, _, _ = slam_run
    est = normalize_to_first([np.asarray(p) for p in engine.pose_log])
    gt = normalize_to_first([ds.get_pose(i) for i in range(len(ds))])
    ate = ate_rmse(est, gt)
    # sub-voxel tracking over a short sweep (voxel = 0.12 m at test scale)
    assert ate < 0.06, f"ATE RMSE {ate:.4f} m"


def test_map_grows(slam_run):
    _, _, _, state, _ = slam_run
    w = np.asarray(state.volume.weight)
    assert (w > 0).sum() > 5000
    assert w.max() > 1  # multi-frame accumulation


def test_use_gt_pose_mode():
    """Oracle-pose ablation (flag_use_gtPose, ICL_traj2.yaml:19)."""
    cfg = small_config(end_frame=3, use_gt_pose=True)
    ds = small_dataset(3, degrees_per_frame=1.0)
    engine = XSlamEngine(cfg)
    state = engine.init_state()
    for i in range(3):
        state, res = engine.process_frame(state, ds.get_depth(i), gt_pose=ds.get_pose(i))
        engine.log_pose(res)
    np.testing.assert_allclose(engine.pose_log[2], ds.get_pose(2), atol=1e-6)
    assert (np.asarray(state.volume.weight) > 0).sum() > 5000


def test_process_frames_scan_matches_loop():
    """The one-dispatch lax.scan multi-frame entry must reproduce the
    per-frame loop: bit-equal for the first frames, then within the usual
    fma-noise chaotic-amplification envelope (the scan body is the same
    pure step compiled in a different program context)."""
    import jax.numpy as jnp

    from tests.helpers import small_config, small_dataset
    from xslam_tpu.models.kinfu import XSlamEngine
    from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first

    n = 6
    ds = small_dataset(n, degrees_per_frame=1.0)
    cfg = small_config(
        end_frame=n, volume_layout="brick", fusion_mode="brick",
        raycast_march="skip", raycast_normals="screen",
        model_map_level=1, icp_fixed_assoc=True, num_levels=2,
    )
    eng = XSlamEngine(cfg)
    st = eng.init_state()
    poses_loop = []
    for i in range(n):
        st, res = eng.process_frame(st, ds.get_depth(i))
        poses_loop.append(np.asarray(res.camera2world.v))

    eng2 = XSlamEngine(cfg)
    st2 = eng2.init_state()
    depths = jnp.stack([jnp.asarray(ds.get_depth(i)) for i in range(n)])
    st2, res = eng2.process_frames(st2, depths)
    poses_scan = np.asarray(res.camera2world.v)
    assert poses_scan.shape == (n, 4, 4)
    assert bool(np.asarray(res.align_ok).all())

    np.testing.assert_array_equal(poses_loop[0], poses_scan[0])
    np.testing.assert_array_equal(poses_loop[1], poses_scan[1])
    for i in range(2, n):
        np.testing.assert_allclose(poses_loop[i], poses_scan[i], atol=2e-3)

    gt = normalize_to_first([ds.get_pose(i) for i in range(n)])
    ate_scan = ate_rmse(normalize_to_first(list(poses_scan)), gt)
    ate_loop = ate_rmse(normalize_to_first(poses_loop), gt)
    assert abs(ate_scan - ate_loop) < 2e-3, (ate_scan, ate_loop)

"""Relocalize-on-tracking-loss and keyframing (models/recovery.py).

The reference ships complete DCSFD relocalization kernels
(``ComputeLocalTsdfHessianKernel``, TsdfFusion.cu:204-331) whose host entry
points are commented out (``KinectFusionReconstruction.cpp:374-436``) — its
only runtime failure handling is "freeze the pose and skip integration"
(``ProcessFrame``, KinectFusionReconstruction.cpp:150-154). The recovery
engine drives our live relocalizer from that failure signal.

Scenario (measured basins, small scene): a 2-frame sensor blackout at
2.5 deg/frame leaves the frozen pose ~7.5 deg / 0.21 m off on resume —
outside the 0.15 m translation-gated ICP acceptance, inside the DCSFD
relocalizer's ~trunc/2 basin. The plain engine stays frozen (~213 mm error
forever); the recovering engine (round 5: constant-velocity-seeded
relocalization — best-final-loss over {CV, frozen} seeds) bridges the
blackout without ever spiking (max error ~36 mm vs the frozen-seed
machinery's 213 mm transient) and re-acquires immediately on resume.
"""

import numpy as np
import pytest

from helpers import small_config, small_dataset

from xslam_tpu.models.recovery import RecoveringEngine
from xslam_tpu.utils.evaluation import normalize_to_first


def _cfg(reloc_after):
    return small_config(
        end_frame=12,
        reloc_after_failures=reloc_after,
        reloc_iters=15,
        reloc_min_count=200.0,
        max_translation_per_frame=0.15,
        min_inlier_fraction=0.35,
    )


def _blackout_seq(ds):
    """5 tracked frames, 2 blank (camera keeps moving), paused resume."""
    blank = np.zeros_like(ds.get_depth(0))
    return (
        [(i, ds.get_depth(i)) for i in range(5)]
        + [(4, blank)] * 2
        + [(7, ds.get_depth(7))] * 4
    )


def _run(cfg, seq):
    eng = RecoveringEngine(cfg)
    state = eng.init_state()
    for _, depth in seq:
        state, _ = eng.process_frame(state, depth)
    est = normalize_to_first(eng.pose_log)
    return eng, est


def _errs_mm(est, ds, seq):
    gt = normalize_to_first([ds.get_pose(f) for f, _ in seq])
    return [1000 * np.linalg.norm(e[:3, 3] - g[:3, 3]) for e, g in zip(est, gt)]


def test_recovery_after_blackout():
    ds = small_dataset(n_frames=12, degrees_per_frame=2.5)
    seq = _blackout_seq(ds)

    eng, est = _run(_cfg(reloc_after=2), seq)
    errs = _errs_mm(est, ds, seq)

    # blank-frame relocalization attempts must be rejected (no valid
    # support)
    blanks = [e for e in eng.recovery_events if e.mean_loss_before == 0.0]
    assert all(not e.accepted for e in blanks)
    # at least one non-blank relocalization ran and descended (round 5:
    # the constant-velocity seed starts near-correct, so the descent may
    # be shallow — the old >2x criterion described the frozen-seed regime)
    descended = [
        e for e in eng.recovery_events
        if e.mean_loss_before > 0 and e.mean_loss_after < e.mean_loss_before
    ]
    assert descended, f"no descending relocalization: {eng.recovery_events}"

    # the CV-seeded recovery must BRIDGE the blackout: no frozen-pose
    # error spike (the pre-CV machinery visited ~213 mm before pulling
    # back), and the trajectory re-acquires after it
    assert max(errs) < 100.0, f"post-blackout spike: {errs}"
    assert errs[-1] < 60.0, f"end error {errs[-1]:.0f} mm: {errs}"


def test_plain_engine_stays_lost():
    """Same sequence without recovery: the pose freezes at the drift error —
    the discriminating control for test_recovery_after_blackout."""
    ds = small_dataset(n_frames=12, degrees_per_frame=2.5)
    seq = _blackout_seq(ds)
    eng, est = _run(_cfg(reloc_after=0), seq)
    errs = _errs_mm(est, ds, seq)
    assert not eng.recovery_events
    assert errs[-1] > 150.0, f"plain engine unexpectedly recovered: {errs}"


def test_keyframes_and_pose_graph():
    """Keyframe gating + sequential pose-graph refinement round-trips."""
    n = 10
    ds = small_dataset(n_frames=n, degrees_per_frame=3.0)
    cfg = small_config(end_frame=n, keyframe_dist=0.05, keyframe_angle_deg=4.0)
    eng = RecoveringEngine(cfg)
    state = eng.init_state()
    for i in range(n):
        state, _ = eng.process_frame(state, ds.get_depth(i))
    assert len(eng.keyframes) >= 3

    refined = eng.refine_keyframes(iters=5)
    assert refined.shape == (len(eng.keyframes), 4, 4)
    # odometry-only refinement is consistent: it must not move the
    # keyframes far from the engine's estimates (the factors are exactly
    # the estimates' relative poses)
    for kf, T in zip(eng.keyframes, refined):
        assert float(np.linalg.norm(kf.camera2world[:3, 3] - T[:3, 3])) < 1e-3


def test_recovery_wraps_sharded_engine():
    """RecoveringEngine is engine-agnostic: wrapping the multi-chip engine
    (8-virtual-device CPU mesh) must re-acquire after the same blackout the
    single-chip recovery test uses — `run_slam.py --sharded` with
    reloc_after_failures > 0 gets real recovery, not a silent no-op."""
    import jax

    from xslam_tpu.parallel.engine import ShardedXSlamEngine

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    ds = small_dataset(n_frames=12, degrees_per_frame=2.5)
    seq = _blackout_seq(ds)
    cfg = _cfg(reloc_after=2)
    eng = RecoveringEngine(cfg, engine=ShardedXSlamEngine(cfg, n_devices=8))
    state = eng.init_state()
    for _, depth in seq:
        state, _ = eng.process_frame(state, depth)
    est = normalize_to_first(eng.pose_log)
    errs = _errs_mm(est, ds, seq)
    descended = [
        e for e in eng.recovery_events
        if e.mean_loss_before > 0 and e.mean_loss_after < e.mean_loss_before
    ]
    assert descended, f"no descending relocalization: {eng.recovery_events}"
    assert errs[-1] < 60.0, f"end error {errs[-1]:.0f} mm: {errs}"


def test_depth_icp_recovers_relative_pose():
    """The loop-closure VERIFIER (host-side projective point-to-plane ICP,
    models/recovery.py::_depth_icp) must refine a perturbed seed to the
    true relative pose between two rendered views."""
    from tests.helpers import SMALL_INTR, small_scene
    from xslam_tpu.geometry import se3
    from xslam_tpu.io.synthetic import render_depth
    from xslam_tpu.models.recovery import _depth_icp

    scene = small_scene()
    Ta = np.eye(4, dtype=np.float32)
    xi = np.array([0.02, -0.03, 0.01, 0.04, -0.02, 0.05], np.float32)
    Tb = Ta @ np.asarray(se3.exp_real(xi))
    da = (np.asarray(render_depth(scene, Ta, SMALL_INTR))).astype(np.uint16)
    db = (np.asarray(render_depth(scene, Tb, SMALL_INTR))).astype(np.uint16)

    T_true = np.linalg.inv(Ta) @ Tb
    seed = T_true @ np.asarray(
        se3.exp_real(np.array([0.01, 0.015, -0.01, 0.02, -0.015, 0.02], np.float32))
    )
    T, inlier_frac, rms = _depth_icp(da, db, seed, SMALL_INTR)
    assert inlier_frac > 0.6
    assert rms < 0.02
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.01
    assert np.abs(T[:3, :3] - T_true[:3, :3]).max() < 0.01


def test_loop_detection_fires_on_revisit():
    """Pose-proximity proposal + depth-overlap verification must append a
    loop edge when the trajectory returns near an old keyframe, and must
    NOT fire on a non-revisiting chain."""
    from tests.helpers import SMALL_INTR, small_config, small_scene
    from xslam_tpu.geometry import se3
    from xslam_tpu.io.synthetic import render_depth
    from xslam_tpu.models.recovery import RecoveringEngine

    scene = small_scene()
    cfg = small_config(
        loop_detect=True, loop_min_gap=4, keyframe_dist=1e-6,
        keyframe_angle_deg=1e-6,
    )

    class _Stub:  # engine surface unused by the keyframe/loop machinery
        intr = SMALL_INTR
        vol_cfg = None

        def __init__(self, c):
            pass

    eng = RecoveringEngine.__new__(RecoveringEngine)
    eng.config = cfg
    eng.intr = SMALL_INTR
    eng.keyframes = []
    eng.loop_edges = []
    eng._frame_index = 0

    # a walk that steps away then returns to the start pose
    offsets = [
        np.array([0.0, 0.0, 0.0]),
        np.array([0.25, 0.0, 0.0]),
        np.array([0.5, 0.0, 0.0]),
        np.array([0.5, 0.25, 0.0]),
        np.array([0.25, 0.25, 0.0]),
        np.array([0.02, 0.01, 0.0]),  # revisit of keyframe 0
    ]
    for i, off in enumerate(offsets):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = off
        depth = np.asarray(render_depth(scene, c2w, SMALL_INTR)).astype(np.uint16)
        eng._frame_index = i
        eng._maybe_keyframe(c2w, depth)

    assert len(eng.keyframes) == 6
    assert len(eng.loop_edges) >= 1
    j, k, T = eng.loop_edges[-1]
    assert k == 5 and j <= 1
    T_true = np.linalg.inv(eng.keyframes[j].camera2world) @ eng.keyframes[k].camera2world
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.02

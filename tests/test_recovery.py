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
forever); the recovering engine descends the TSDF loss (0.29 -> 0.06),
re-enters through the seeded tracked step, and is back to ~36 mm.
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
    # support), and at least one non-blank attempt must have descended
    blanks = [e for e in eng.recovery_events if e.mean_loss_before == 0.0]
    assert all(not e.accepted for e in blanks)
    descended = [
        e for e in eng.recovery_events
        if e.mean_loss_before > 0 and e.mean_loss_after < 0.5 * e.mean_loss_before
    ]
    assert descended, f"no descending relocalization: {eng.recovery_events}"

    # the trajectory must re-acquire after the blackout
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
        if e.mean_loss_before > 0 and e.mean_loss_after < 0.5 * e.mean_loss_before
    ]
    assert descended, f"no descending relocalization: {eng.recovery_events}"
    assert errs[-1] < 60.0, f"end error {errs[-1]:.0f} mm: {errs}"

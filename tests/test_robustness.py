"""Failure handling: sensor dropouts and degenerate frames must not corrupt
state (the reference's only guards are the det/NaN frame rejection)."""

import numpy as np

from xslam_tpu.models.kinfu import XSlamEngine
from xslam_tpu.utils.debug import assert_state_sane, state_health
from tests.helpers import small_config, small_dataset


def test_blank_frame_rejected_and_recovered():
    """A dropout (all-zero depth) mid-sequence: alignment fails, pose
    freezes, volume untouched; tracking recovers on the next good frame."""
    cfg = small_config(end_frame=6)
    ds = small_dataset(6, degrees_per_frame=0.5)
    eng = XSlamEngine(cfg)
    state = eng.init_state()

    state, r0 = eng.process_frame(state, ds.get_depth(0))
    state, r1 = eng.process_frame(state, ds.get_depth(1))
    pose_before = np.asarray(r1.camera2world.v)
    w_before = np.asarray(state.volume.weight).sum()

    blank = np.zeros_like(ds.get_depth(0))
    state, r_blank = eng.process_frame(state, blank)
    assert not bool(r_blank.align_ok)
    # pose frozen (ProcessFrame "Frame align failed!" path)
    np.testing.assert_allclose(np.asarray(r_blank.camera2world.v), pose_before, atol=1e-6)
    # integration skipped
    assert np.asarray(state.volume.weight).sum() == w_before
    assert_state_sane(state)

    # recovery
    state, r3 = eng.process_frame(state, ds.get_depth(3))
    assert bool(r3.align_ok)
    assert int(r3.inlier_count) > 3000


def test_mostly_invalid_frame():
    """90% of pixels invalid: either aligns on the remainder or cleanly
    rejects; state stays finite either way."""
    cfg = small_config(end_frame=4)
    ds = small_dataset(4, degrees_per_frame=0.5)
    eng = XSlamEngine(cfg)
    state = eng.init_state()
    state, _ = eng.process_frame(state, ds.get_depth(0))
    state, _ = eng.process_frame(state, ds.get_depth(1))

    d = ds.get_depth(2).copy()
    rng = np.random.default_rng(0)
    mask = rng.random(d.shape) < 0.9
    d[mask] = 0
    state, res = eng.process_frame(state, d)
    assert_state_sane(state)
    h = state_health(state)
    assert h[".volume.value"]["nan_frac"] == 0.0


def test_out_of_range_depth_values():
    """Depths outside [200, 5000] mm are gated everywhere (sensor spec)."""
    cfg = small_config(end_frame=2)
    ds = small_dataset(2)
    eng = XSlamEngine(cfg)
    state = eng.init_state()
    d = ds.get_depth(0).copy()
    d[:30] = 60000  # absurd far values
    d[30:60] = 50  # too close
    state, res = eng.process_frame(state, d)
    assert_state_sane(state)


def test_max_translation_gate_rejects_implausible_motion():
    """With a tiny max_translation_per_frame every real motion is
    "implausible": alignment must be rejected with keep-prev-pose +
    skip-integration semantics (the det/NaN-guard path); with the gate
    disabled (0, the default = reference parity) the same frames track."""
    ds = small_dataset(4, degrees_per_frame=2.0)

    cfg = small_config(end_frame=4)
    cfg.max_translation_per_frame = 1e-6
    eng = XSlamEngine(cfg)
    state = eng.init_state()
    state, r0 = eng.process_frame(state, ds.get_depth(0))
    w_after_first = np.asarray(state.volume.weight).sum()
    pose0 = np.asarray(r0.camera2world.v)
    state, r1 = eng.process_frame(state, ds.get_depth(1))
    assert not bool(r1.align_ok)
    np.testing.assert_allclose(np.asarray(r1.camera2world.v), pose0, atol=1e-6)
    assert np.asarray(state.volume.weight).sum() == w_after_first

    cfg2 = small_config(end_frame=4)
    assert cfg2.max_translation_per_frame == 0.0
    eng2 = XSlamEngine(cfg2)
    s2 = eng2.init_state()
    s2, _ = eng2.process_frame(s2, ds.get_depth(0))
    s2, r = eng2.process_frame(s2, ds.get_depth(1))
    assert bool(r.align_ok)

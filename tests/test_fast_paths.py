"""Fast-path equivalence: nearest-only fusion, screen-space normals."""

import jax
import numpy as np
import pytest

from xslam_tpu.models.kinfu import XSlamEngine
from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first
from tests.helpers import small_config, small_dataset


def _run(cfg, n=6):
    ds = small_dataset(n, degrees_per_frame=0.5)
    engine = XSlamEngine(cfg)
    state = engine.init_state()
    for i in range(n):
        state, res = engine.process_frame(state, ds.get_depth(i))
        engine.log_pose(res)
        assert bool(res.align_ok)
    est = normalize_to_first(engine.pose_log)
    gt = normalize_to_first([ds.get_pose(i) for i in range(n)])
    return ate_rmse(est, gt), state


def test_screen_normals_tracking_parity():
    """Tracking with gather-free screen-space model normals must stay within
    the same accuracy envelope as the reference-style TSDF normals."""
    ate_tsdf, _ = _run(small_config(end_frame=6, raycast_normals="tsdf"))
    ate_screen, _ = _run(small_config(end_frame=6, raycast_normals="screen"))
    assert ate_tsdf < 0.06
    assert ate_screen < 0.06, (ate_tsdf, ate_screen)
    # within 2x of each other or both tiny
    assert ate_screen < max(2.5 * ate_tsdf, 0.02), (ate_tsdf, ate_screen)


def test_nearest_fusion_matches_bilinear_gate_zero():
    """bi_threshold=0 fast path (1 gather) must match the general path
    evaluated at threshold=0 bit-for-bit."""
    import jax.numpy as jnp

    from xslam_tpu.csfd.single import lift
    from xslam_tpu.geometry import se3
    from xslam_tpu.ops import fusion
    from tests.helpers import SMALL_INTR

    cfg = small_config()
    vol_cfg = fusion.VolumeConfig(
        tuple(cfg.tsdf_size), cfg.voxel_size, cfg.trunc_dist, cfg.max_integration_weight
    )
    w2v = np.asarray(cfg.world2volume, np.float32)
    ds = small_dataset(1)
    depth_m = fusion.scale_depth(jnp.asarray(ds.get_depth(0)))
    c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(0), jnp.float32)))
    v2c = se3.inverse(c2v)
    r, t = se3.rotation(v2c), se3.translation(v2c)

    vol0 = fusion.create_volume(vol_cfg)
    fast = jax.jit(lambda v: fusion.integrate(v, depth_m, r, t, SMALL_INTR, vol_cfg, bi_threshold=0.0))(vol0)
    vol0 = fusion.create_volume(vol_cfg)
    # general path with an epsilon threshold that the gate can never pass
    slow = jax.jit(lambda v: fusion.integrate(v, depth_m, r, t, SMALL_INTR, vol_cfg, bi_threshold=1e-30))(vol0)
    np.testing.assert_array_equal(np.asarray(fast.weight), np.asarray(slow.weight))
    np.testing.assert_allclose(np.asarray(fast.value), np.asarray(slow.value), atol=1e-7)


def test_brick_fusion_engine_e2e():
    """Engine with brick-compacted fusion tracks identically to dense."""
    ate_dense, s1 = _run(small_config(end_frame=5))
    ate_brick, s2 = _run(small_config(end_frame=5, fusion_mode="brick", fusion_brick_cap=512))
    assert abs(ate_dense - ate_brick) < 1e-4, (ate_dense, ate_brick)
    np.testing.assert_array_equal(
        np.asarray(s1.volume.weight), np.asarray(s2.volume.weight)
    )


def test_icp_fixed_assoc_tracking():
    """Fixed-correspondence inner iterations track within the envelope."""
    ate_ref, _ = _run(small_config(end_frame=6))
    ate_fixed, _ = _run(small_config(end_frame=6, icp_fixed_assoc=True))
    assert ate_fixed < 0.06, (ate_ref, ate_fixed)
    assert ate_fixed < max(2.5 * ate_ref, 0.02), (ate_ref, ate_fixed)

"""Frame-to-frame odometry model."""

import numpy as np

from xslam_tpu.models.odometry import OdometryEngine
from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first
from tests.helpers import small_config, small_dataset


def test_odometry_tracks():
    cfg = small_config(end_frame=6)
    ds = small_dataset(6, degrees_per_frame=0.5)
    eng = OdometryEngine(cfg)
    state = eng.init_state()
    for i in range(6):
        state, res = eng.process_frame(state, ds.get_depth(i))
        eng.log_pose(res)
        assert bool(res.align_ok), i
    est = normalize_to_first(eng.pose_log)
    gt = normalize_to_first([ds.get_pose(i) for i in range(6)])
    # frame-to-frame drifts more than frame-to-model but must stay bounded
    assert ate_rmse(est, gt) < 0.1

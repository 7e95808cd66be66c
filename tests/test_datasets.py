"""File-based dataset loaders (ICL, 7-Scenes) and YAML config round-trip."""

import os

import numpy as np

from xslam_tpu.io.config import SlamConfig, load_config
from xslam_tpu.io.dataset import ICLDataset, SevenScenesDataset, make_dataset


def _write_png16(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint16), mode="I;16").save(path)


def test_icl_dataset(tmp_path):
    """ICL layout: depth/<i>.png (factor 5), livingRoom1n.gt.sim 4-row
    blocks (Dataset.cpp:69-125)."""
    root = tmp_path / "icl"
    (root / "depth").mkdir(parents=True)
    rng = np.random.default_rng(0)
    poses = []
    with open(root / "livingRoom1n.gt.sim", "w") as f:
        for i in range(3):
            d = (rng.integers(1000, 20000, (24, 32))).astype(np.uint16)
            _write_png16(str(root / "depth" / f"{i}.png"), d)
            pose = np.eye(4)
            pose[:3, 3] = [i * 0.1, 0, 0]
            poses.append(pose)
            for r in range(3):
                f.write(" ".join(f"{x:.6f}" for x in pose[r]) + "\n")
            f.write("\n")  # blank 4th line per block

    ds = ICLDataset(str(root), 0, 2)
    assert len(ds) == 3
    d0 = ds.get_depth(0)
    assert d0.dtype == np.uint16
    raw = np.asarray(_read_back(str(root / "depth" / "0.png")))
    np.testing.assert_array_equal(d0, raw // 5)
    np.testing.assert_allclose(ds.get_pose(1)[:3, 3], [0.1, 0, 0])


def _read_back(path):
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.uint16)


def test_seven_scenes_dataset(tmp_path):
    """7-Scenes layout: seq-N/frame-XXXXXX.depth.png + .pose.txt
    (Dataset.cpp:13-39)."""
    root = tmp_path / "7s"
    (root / "seq-01").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(2):
        d = (rng.integers(500, 4000, (24, 32))).astype(np.uint16)
        _write_png16(str(root / "seq-01" / f"frame-{i:06d}.depth.png"), d)
        pose = np.eye(4)
        pose[:3, 3] = [0, i * 0.2, 0]
        np.savetxt(str(root / "seq-01" / f"frame-{i:06d}.pose.txt"), pose)

    ds = SevenScenesDataset(str(root), [0], [1], ["seq-01"])
    assert len(ds) == 2
    assert ds.get_depth(1).shape == (24, 32)
    np.testing.assert_allclose(ds.get_pose(1)[:3, 3], [0, 0.2, 0])


def test_yaml_config_roundtrip(tmp_path):
    """The reference key set (ICL_traj2.yaml names) loads into SlamConfig."""
    cfg = load_config("configs/ICL_traj2.yaml")
    assert cfg.tsdf_size == (256, 256, 256)
    assert cfg.voxel_size == 0.03
    assert cfg.fy == -480.0
    assert cfg.num_levels == 3
    assert cfg.icp_iterations == (5, 4, 3)
    assert abs(cfg.trunc_dist - 0.09) < 1e-6
    assert abs(cfg.angle_thres_sine - np.sin(np.deg2rad(15))) < 1e-6
    assert cfg.max_integration_weight == 100
    assert not cfg.use_gt_pose
    # world2volume carries the init offset (KinectFusionReconstruction.cpp:26-38)
    np.testing.assert_allclose(np.asarray(cfg.world2volume)[:3, 3], [3.2, 3.2, 3.2])


def test_make_dataset_synthetic():
    cfg = SlamConfig(dataset_format="synthetic", end_frame=2)
    ds = make_dataset(cfg)
    assert len(ds) == 3
    assert ds.get_depth(0).dtype == np.uint16


def test_timer_and_profiling_utils():
    import time as _time

    import jax.numpy as jnp

    from xslam_tpu.utils.profiling import timed
    from xslam_tpu.utils.timers import Timer

    t = Timer()
    _time.sleep(0.01)
    ms = t.lap_ms(sync=jnp.ones(4))
    assert ms >= 10.0

    import jax

    best, out = timed(jax.jit(lambda x: x * 2), jnp.ones(8), n=2)
    assert best > 0 and float(out[0]) == 2.0


def test_state_health_reporting():
    import jax.numpy as jnp

    from xslam_tpu.utils.debug import state_health

    class S:
        pass

    h = state_health({"a": jnp.array([1.0, jnp.nan]), "b": jnp.ones(3)})
    key_a = [k for k in h if "a" in k][0]
    assert h[key_a]["nan_frac"] == 0.5


def test_handheld_trajectory_dynamics_are_sensor_realistic():
    """The realistic-dataset trajectory must stay inside handheld-sensor
    dynamics (real ICL-NUIM: rotation under ~2 deg/frame at 30 Hz,
    translation 0.1-0.5 m/s). The first cut of the generator whipped the
    look-at direction 20-33 deg/frame when the camera path passed near the
    target path — beyond projective ICP's convergence basin by design
    (reference's 3-level {5,4,3} ICP included) — which is a property of the
    INPUT, not a tracker regression; this pins the contract."""
    import numpy as np

    from xslam_tpu.io.synthetic import handheld_trajectory

    gt = np.stack(handheld_trajectory(301, seed=11))
    angs, ts = [], []
    for i in range(1, len(gt)):
        d = np.linalg.inv(gt[i - 1]) @ gt[i]
        angs.append(
            np.degrees(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
        )
        ts.append(np.linalg.norm(d[:3, 3]))
    angs, ts = np.array(angs), np.array(ts)
    assert angs.max() <= 2.0, f"rotation burst {angs.max():.2f} deg/frame"
    assert 0.05 <= ts.mean() * 30.0 <= 0.55, f"speed {ts.mean()*30:.3f} m/s"
    # the path must still be dynamic (not a degenerate fixed stare)
    assert angs.mean() > 0.3
    # orthonormal rotations throughout (rate limiter preserves SO(3))
    for i in (0, 150, 300):
        r = gt[i][:3, :3]
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-9)


def test_make_realistic_7scenes_roundtrip(tmp_path):
    """The realistic-dataset generator's 7-Scenes mode must emit exactly
    what SevenScenesDataset (Dataset.cpp:13-67 semantics) consumes:
    seq-01/frame-XXXXXX.depth.png (mm, factor 1) + .pose.txt + info.txt."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "7s")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "apps/make_realistic_dataset.py"),
         out, "3", "0.0", "--format", "7scenes"],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "info.txt"))
    assert os.path.exists(os.path.join(out, "seq-01", "frame-000002.depth.png"))

    from xslam_tpu.io.dataset import SevenScenesDataset
    from xslam_tpu.io.synthetic import (
        cluttered_scene, handheld_trajectory, render_depth,
    )
    from xslam_tpu.geometry.intrinsics import SEVEN_SCENES_INTRINSICS

    ds = SevenScenesDataset.from_info_file(out, os.path.join(out, "info.txt"))
    assert len(ds) == 3
    # poses round-trip exactly (savetxt %.9f)
    gt = handheld_trajectory(3, seed=11)
    for i in range(3):
        np.testing.assert_allclose(ds.get_pose(i), gt[i], atol=1e-8)
    # depth round-trips through the 16-bit PNG at factor 1 (mm exact)
    d = ds.get_depth(2)
    ref = render_depth(cluttered_scene(), gt[2], SEVEN_SCENES_INTRINSICS)
    np.testing.assert_array_equal(
        np.asarray(d), np.clip(ref.astype(np.uint32), 0, 65535).astype(np.uint16)
    )

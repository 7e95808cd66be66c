"""CLI driver smoke tests (subprocess, tiny workload, CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SMALL = dict(
    end_frame=3,
    tsdf_size_x=64, tsdf_size_y=64, tsdf_size_z=64,
    tsdf_voxel_size=0.12,
    depth_width=160, depth_height=120,
    fx=120.3, fy=-120.0, cx=79.5, cy=59.5,
)


def _small_yaml(tmp_path, **extra):
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs/synthetic.yaml")))
    cfg.update(_SMALL)
    cfg["output_dir"] = str(tmp_path / "out") + "/"
    cfg.update(extra)
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.dump(cfg))
    return str(p)


def _run(script, *args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XSLAM_FORCE_CPU="1",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_run_slam_cli(tmp_path):
    cfg = _small_yaml(tmp_path)
    res = _run("apps/run_slam.py", cfg)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "mean frame time" in res.stdout
    assert "ATE RMSE" in res.stdout
    ate = float(res.stdout.split("ATE RMSE =")[1].split("m")[0])
    assert ate < 0.05
    out = tmp_path / "out"
    assert (out / "slam" / "frame-000000.pose.txt").exists()
    assert (out / "gt" / "frame-000002.pose.txt").exists()
    assert (out / "pcd.ply").exists()


def test_csfd_bench_cli():
    res = _run("apps/csfd_bench.py")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "second order differentiation" in res.stdout
    # DCSFD vs chain rule agreement printed in part 2
    lines = [l for l in res.stdout.splitlines() if "gradient =" in l]
    g1, g2 = (float(l.split("=")[1]) for l in lines[-2:])
    np.testing.assert_allclose(g1, g2, rtol=1e-4)

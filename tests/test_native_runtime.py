"""Native C++ runtime: PNG16 round-trip, PLY writer, prefetcher."""

import os

import numpy as np
import pytest

from xslam_tpu.io import ply
from xslam_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built"
)


def _write_png16(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint16), mode="I;16").save(path)


def test_png16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = (rng.integers(0, 60000, (48, 64))).astype(np.uint16)
    p = str(tmp_path / "d.png")
    _write_png16(p, depth)
    out = native.read_png16(p)
    assert out is not None
    np.testing.assert_array_equal(out, depth)


def test_png16_matches_pil(tmp_path):
    from PIL import Image

    depth = (np.arange(48 * 64, dtype=np.uint16) * 7 % 65535).reshape(48, 64)
    p = str(tmp_path / "d.png")
    _write_png16(p, depth)
    pil = np.asarray(Image.open(p), dtype=np.uint16)
    nat = native.read_png16(p)
    np.testing.assert_array_equal(nat, pil)


def test_ply_roundtrip_native(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    nrm = rng.normal(size=(1000, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    assert native.write_ply(p, pts, nrm)
    # header format-compatible with the reference's CPointCloud (11 lines)
    with open(p) as f:
        header = [next(f) for _ in range(11)]
    assert header[0].strip() == "ply"
    assert header[3].strip() == "element vertex 1000"
    assert header[10].strip() == "end_header"
    rp, rn = ply.read_ply(p)
    np.testing.assert_allclose(rp, pts, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rn, nrm, rtol=1e-4, atol=1e-5)


def test_prefetcher(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    frames = []
    for i in range(6):
        d = rng.integers(0, 5000, (24, 32)).astype(np.uint16)
        p = str(tmp_path / f"{i}.png")
        _write_png16(p, d)
        paths.append(p)
        frames.append(d)
    pf = native.Prefetcher(paths, n_threads=3)
    # out-of-order access
    for i in [3, 0, 5, 1, 4, 2]:
        out = pf.get(i, 24, 32)
        np.testing.assert_array_equal(out, frames[i])
    pf.close()


def test_pose_writer(tmp_path):
    m = np.arange(16, dtype=np.float32).reshape(4, 4) / 7.0
    p = str(tmp_path / "pose.txt")
    assert native.write_pose(p, m)
    back = np.loadtxt(p)
    np.testing.assert_allclose(back, m, atol=1e-6)

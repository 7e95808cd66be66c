"""Analytic synthetic depth-scene renderer.

The reference validates only on external datasets (ICL-NUIM / 7-Scenes,
``README.md:44-45`` "download yourself"). This module provides the in-repo
substitute demanded by SURVEY.md §4: a closed-form scene (room box + spheres +
boxes) rendered to 16-bit depth maps along a known smooth trajectory, so the
full SLAM loop (tracking + fusion + raycast) can be tested and benchmarked
hermetically, and ATE RMSE can be evaluated against exact ground truth.

Depth convention matches the reference datasets: uint16 millimetres, pinhole
model with possibly negative ``fy`` (ICL), invalid pixels = 0.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np

from ..geometry.intrinsics import Intrinsics


@dataclass
class Sphere:
    center: np.ndarray
    radius: float


@dataclass
class Box:
    lo: np.ndarray
    hi: np.ndarray


@dataclass
class Scene:
    """Room interior (rays hit the inside of ``room``) plus solid objects."""

    room: Box
    spheres: List[Sphere] = field(default_factory=list)
    boxes: List[Box] = field(default_factory=list)


def default_scene() -> Scene:
    """A living-room-like scene inside a ~6 m cube (fits the canonical
    256^3 x 0.03 m TSDF volume with the reference's init offset 3.2 m)."""
    return Scene(
        room=Box(np.array([-3.0, -2.0, -3.0]), np.array([3.0, 2.0, 3.0])),
        spheres=[
            Sphere(np.array([0.6, 0.4, 1.2]), 0.5),
            Sphere(np.array([-1.2, -0.6, 0.3]), 0.35),
        ],
        boxes=[
            Box(np.array([-0.4, 1.0, -1.1]), np.array([0.9, 2.0, 0.1])),
            Box(np.array([-2.4, -0.2, 1.0]), np.array([-1.6, 2.0, 1.8])),
        ],
    )


def _ray_box_interior(o, d, box: Box):
    """Exit distance of rays starting inside an axis-aligned box."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (box.lo[None, :] - o[None, :]) / d
        t2 = (box.hi[None, :] - o[None, :]) / d
    t_far = np.maximum(t1, t2)
    return np.min(t_far, axis=-1)


def _ray_box_entry(o, d, box: Box):
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (box.lo[None, :] - o[None, :]) / d
        t2 = (box.hi[None, :] - o[None, :]) / d
    t_near = np.max(np.minimum(t1, t2), axis=-1)
    t_far = np.min(np.maximum(t1, t2), axis=-1)
    hit = (t_near < t_far) & (t_near > 0)
    return np.where(hit, t_near, np.inf)


def _ray_sphere(o, d, s: Sphere):
    oc = o[None, :] - s.center[None, :]
    a = np.sum(d * d, axis=-1)
    b = 2 * np.sum(d * oc, axis=-1)
    c = np.sum(oc * oc, axis=-1) - s.radius**2
    disc = b * b - 4 * a * c
    with np.errstate(invalid="ignore"):
        sq = np.sqrt(np.maximum(disc, 0.0))
        t0 = (-b - sq) / (2 * a)
    hit = (disc > 0) & (t0 > 0)
    return np.where(hit, t0, np.inf)


def render_depth(scene: Scene, c2w: np.ndarray, intr: Intrinsics) -> np.ndarray:
    """Render a uint16 depth map (mm) of ``scene`` from camera pose ``c2w``.

    The returned depth is the camera-z depth (not ray length), matching the
    back-projection model in the reference (``Map.cu:8-29``).
    """
    H, W = intr.height, intr.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    # un-normalized camera ray with unit z: t along it == camera depth
    dirs_cam = np.stack(
        [(u - intr.cx) / intr.fx, (v - intr.cy) / intr.fy, np.ones_like(u)], axis=-1
    ).reshape(-1, 3)
    R, t = c2w[:3, :3], c2w[:3, 3]
    d = dirs_cam @ R.T
    o = t.astype(np.float64)

    depth = _ray_box_interior(o, d, scene.room)
    for s in scene.spheres:
        depth = np.minimum(depth, _ray_sphere(o, d, s))
    for b in scene.boxes:
        depth = np.minimum(depth, _ray_box_entry(o, d, b))

    depth_mm = depth.reshape(H, W) * 1000.0
    depth_mm[~np.isfinite(depth_mm)] = 0.0
    # out-of-range clipping mirrors the sensor model ([200, 5000] mm valid,
    # TsdfFusion.cu:76-79)
    depth_mm[(depth_mm < 200) | (depth_mm > 5000)] = 0.0
    return depth_mm.astype(np.uint16)


def orbit_trajectory(
    n_frames: int,
    center: np.ndarray = np.array([0.0, 0.0, 0.5]),
    radius: float = 1.6,
    height: float = -0.2,
    degrees_per_frame: float = 0.6,
    phase: float = -90.0,
) -> List[np.ndarray]:
    """Smooth look-at orbit: camera circles ``center`` facing inward.

    Small inter-frame motion (~0.6 deg) keeps the projective-ICP small-motion
    assumption valid, like a hand-held sensor sweep.
    """
    poses = []
    for i in range(n_frames):
        ang = np.deg2rad(phase + i * degrees_per_frame)
        pos = center + np.array([radius * np.cos(ang), height, radius * np.sin(ang)])
        z = center - pos
        z = z / np.linalg.norm(z)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
        poses.append(c2w)
    return poses


class SyntheticDataset:
    """Dataset-protocol wrapper: ``get_depth(i) -> uint16 mm``, ``get_pose(i)``.

    Drop-in replacement for the file-based loaders in
    :mod:`xslam_tpu.io.dataset` (reference ``Dataset.h:18-81``).
    """

    def __init__(
        self,
        n_frames: int = 50,
        intr: Intrinsics | None = None,
        scene: Scene | None = None,
        degrees_per_frame: float = 0.6,
    ):
        from ..geometry.intrinsics import ICL_INTRINSICS

        self.intr = intr or ICL_INTRINSICS
        self.scene = scene or default_scene()
        self.poses = orbit_trajectory(n_frames, degrees_per_frame=degrees_per_frame)
        self._cache: dict[int, np.ndarray] = {}

    def __len__(self):
        return len(self.poses)

    def get_depth(self, i: int) -> np.ndarray:
        if i not in self._cache:
            self._cache[i] = render_depth(self.scene, self.poses[i], self.intr)
        return self._cache[i]

    def get_pose(self, i: int) -> np.ndarray:
        return self.poses[i]

"""Shared small-scale fixtures for pipeline tests (CPU-fast)."""

import numpy as np

from xslam_tpu.geometry.intrinsics import Intrinsics
from xslam_tpu.io.config import SlamConfig
from xslam_tpu.io.synthetic import Box, Scene, Sphere, SyntheticDataset

SMALL_INTR = Intrinsics(fx=120.3, fy=-120.0, cx=79.5, cy=59.5, width=160, height=120)


def small_config(**overrides) -> SlamConfig:
    cfg = SlamConfig(
        depth_width=160,
        depth_height=120,
        fx=SMALL_INTR.fx,
        fy=SMALL_INTR.fy,
        cx=SMALL_INTR.cx,
        cy=SMALL_INTR.cy,
        tsdf_size=(64, 64, 64),
        voxel_size=0.12,
        thres_range=3.0,
        init_xyz=(3.2, 3.2, 3.2),
        num_levels=3,
        end_frame=10,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def small_scene() -> Scene:
    return Scene(
        room=Box(np.array([-3.0, -2.0, -3.0]), np.array([3.0, 2.0, 3.0])),
        spheres=[Sphere(np.array([0.4, 0.3, 1.0]), 0.6)],
        boxes=[Box(np.array([-1.6, 0.4, -0.6]), np.array([-0.6, 2.0, 0.4]))],
    )


def small_dataset(n_frames=8, degrees_per_frame=0.5) -> SyntheticDataset:
    return SyntheticDataset(
        n_frames=n_frames,
        intr=SMALL_INTR,
        scene=small_scene(),
        degrees_per_frame=degrees_per_frame,
    )

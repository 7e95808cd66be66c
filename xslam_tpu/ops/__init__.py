"""Device kernels: preprocessing, fusion, raycasting, ICP, extraction."""

from . import fusion, icp, preprocess, raycast, sampling

__all__ = ["preprocess", "fusion", "raycast", "icp", "sampling"]

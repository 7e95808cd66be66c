"""Offline point-cloud viewer: render a PLY to PNG.

The reference's GL viewer is not open-sourced/buildable (Visualization.h
references unreleased CMesh/Shader and <Windows.h>; SURVEY.md C3). This is
the headless stand-in: orthographic scatter renders of an exported cloud
from three axes, normals as color ((n+1)/2, the reference's color convention,
KinectFusionReconstruction.cpp:361-363).

Usage: python apps/view_cloud.py cloud.ply [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from xslam_tpu.io.ply import read_ply

    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.splitext(src)[0] + ".png"
    pts, nrm = read_ply(src)
    color = np.clip((nrm + 1.0) / 2.0, 0.0, 1.0)

    if len(pts) > 200_000:
        sel = np.random.default_rng(0).choice(len(pts), 200_000, replace=False)
        pts, color = pts[sel], color[sel]

    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    views = [("x", "y", 0, 1), ("x", "z", 0, 2), ("z", "y", 2, 1)]
    for ax, (xl, yl, i, j) in zip(axes, views):
        ax.scatter(pts[:, i], pts[:, j], s=0.3, c=color, linewidths=0)
        ax.set_xlabel(xl)
        ax.set_ylabel(yl)
        ax.set_aspect("equal")
        ax.invert_yaxis()
    fig.suptitle(f"{os.path.basename(src)} — {len(pts)} points")
    fig.tight_layout()
    fig.savefig(dst, dpi=130)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()

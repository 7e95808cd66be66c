"""Render an ICL-NUIM-style on-disk dataset for end-to-end validation.

The reference's canonical run is ICL-NUIM traj2 frames 0-300 through its
file loader (``Experiments/test_xkinect_fusion/main.cpp:46-83``,
``Dataset.cpp:69-125``). Datasets cannot be downloaded in this environment,
so this renders a realistic stand-in with the SAME on-disk contract and
feeds the real loader path end to end:

* 640x480 16-bit depth PNGs at ``depth/<i>.png``, values = mm * 5 (the ICL
  format factor the loader divides back out, ``Dataset.cpp:84``),
* ``livingRoom1n.gt.sim`` ground-truth poses as 4-line blocks (3 matrix rows
  + separator, ``Dataset.cpp:90-118``),
* handheld trajectory with ICL-matched dynamics (0.1-0.5 m/s pans, rotation
  bursts; ``io/synthetic.py::handheld_trajectory``) through the cluttered
  room scene,
* Kinect axial noise (sigma = frac * z^2) on top of mm quantization.

Usage: python apps/make_realistic_dataset.py <out_dir> [n_frames] [noise]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "dataset/ICL_realistic"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 301
    noise = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0015

    from PIL import Image

    from xslam_tpu.geometry.intrinsics import ICL_INTRINSICS
    from xslam_tpu.io.synthetic import (
        apply_sensor_model,
        cluttered_scene,
        handheld_trajectory,
        render_depth,
    )

    scene = cluttered_scene()
    poses = handheld_trajectory(n_frames, seed=11)
    depth_dir = os.path.join(out_dir, "depth")
    os.makedirs(depth_dir, exist_ok=True)

    for i, c2w in enumerate(poses):
        d_mm = render_depth(scene, c2w, ICL_INTRINSICS)
        if noise > 0:
            rng = np.random.default_rng(np.random.SeedSequence([99, i]))
            d_mm = apply_sensor_model(d_mm, rng, noise)
        # ICL PNG convention: value = mm * factor(5); loader divides by 5
        png = np.clip(d_mm.astype(np.uint32) * 5, 0, 65535).astype(np.uint16)
        Image.fromarray(png, mode="I;16").save(
            os.path.join(depth_dir, f"{i}.png")
        )
        if i % 50 == 0:
            print(f"rendered {i}/{n_frames}")

    # .gt.sim: per frame, rows 0-2 of the 3x4 [R|t] block then a blank line
    with open(os.path.join(out_dir, "livingRoom1n.gt.sim"), "w") as f:
        for c2w in poses:
            for r in range(3):
                f.write(" ".join(f"{x:.9f}" for x in c2w[r, :4]) + "\n")
            f.write("\n")
    print(f"wrote {n_frames} frames to {out_dir}")


if __name__ == "__main__":
    main()

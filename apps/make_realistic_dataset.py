"""Render a realistic on-disk dataset for end-to-end loader validation.

The reference's canonical runs go through its two file loaders
(``Experiments/test_xkinect_fusion/main.cpp:46-83``): ICL-NUIM
(``Dataset.cpp:69-125``) and 7-Scenes (``Dataset.cpp:13-67``). Datasets
cannot be downloaded in this environment, so this renders a realistic
stand-in with the SAME on-disk contracts and feeds the real loader paths
end to end:

ICL format (``--format icl``, default):
* 640x480 16-bit depth PNGs at ``depth/<i>.png``, values = mm * 5 (the ICL
  format factor the loader divides back out, ``Dataset.cpp:84``),
* ``livingRoom1n.gt.sim`` ground-truth poses as 4-line blocks (3 matrix rows
  + separator, ``Dataset.cpp:90-118``).

7-Scenes format (``--format 7scenes``):
* ``seq-01/frame-XXXXXX.depth.png`` 16-bit mm depth (factor 1) +
  ``frame-XXXXXX.pose.txt`` 4x4 camera-to-world blocks (``Dataset.cpp:
  13-39``), Kinect intrinsics (fx = fy = 585),
* ``info.txt`` multi-sequence info file: three whitespace rows — start
  frames, end frames, sequence numbers (``Dataset.cpp:41-67``).

Both use a handheld trajectory with sensor-realistic dynamics (rate-limited
rotation, 0.1-0.5 m/s pans; ``io/synthetic.py::handheld_trajectory``)
through the cluttered room scene, plus Kinect axial noise
(sigma = frac * z^2) on top of mm quantization.

Usage: python apps/make_realistic_dataset.py <out_dir> [n_frames] [noise]
           [--format icl|7scenes]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="dataset/ICL_realistic")
    ap.add_argument("n_frames", nargs="?", type=int, default=301)
    ap.add_argument("noise", nargs="?", type=float, default=0.0015)
    ap.add_argument("--format", choices=("icl", "7scenes"), default="icl")
    ap.add_argument("--revisit", action="store_true",
                    help="second half of the trajectory RETRACES the first "
                    "half backwards, so the camera revisits every earlier "
                    "pose — the loop-closure-detection validation sequence")
    ap.add_argument("--blackout", nargs=2, type=int, metavar=("A", "B"),
                    help="zero out the depth of frames [A, B) — sensor "
                    "blackout for the realistic recovery exercise")
    args = ap.parse_args()
    out_dir, n_frames, noise = args.out_dir, args.n_frames, args.noise

    from PIL import Image

    from xslam_tpu.geometry.intrinsics import (
        ICL_INTRINSICS,
        SEVEN_SCENES_INTRINSICS,
    )
    from xslam_tpu.io.synthetic import (
        apply_sensor_model,
        cluttered_scene,
        handheld_trajectory,
        render_depth,
    )

    intr = ICL_INTRINSICS if args.format == "icl" else SEVEN_SCENES_INTRINSICS
    png_factor = 5 if args.format == "icl" else 1

    scene = cluttered_scene()
    if args.revisit:
        m = n_frames // 2 + 1
        half = handheld_trajectory(m, seed=11)
        poses = (half + half[-2::-1])[:n_frames]
    else:
        poses = handheld_trajectory(n_frames, seed=11)
    if args.format == "icl":
        frame_dir = os.path.join(out_dir, "depth")
    else:
        frame_dir = os.path.join(out_dir, "seq-01")
    os.makedirs(frame_dir, exist_ok=True)

    def png_path(i):
        if args.format == "icl":
            return os.path.join(frame_dir, f"{i}.png")
        return os.path.join(frame_dir, f"frame-{i:06d}.depth.png")

    for i, c2w in enumerate(poses):
        d_mm = render_depth(scene, c2w, intr)
        if args.blackout and args.blackout[0] <= i < args.blackout[1]:
            d_mm = np.zeros_like(d_mm)
        if noise > 0:
            rng = np.random.default_rng(np.random.SeedSequence([99, i]))
            d_mm = apply_sensor_model(d_mm, rng, noise)
        png = np.clip(
            d_mm.astype(np.uint32) * png_factor, 0, 65535
        ).astype(np.uint16)
        Image.fromarray(png, mode="I;16").save(png_path(i))
        if args.format == "7scenes":
            np.savetxt(
                os.path.join(frame_dir, f"frame-{i:06d}.pose.txt"),
                c2w, fmt="%.9f",
            )
        if i % 50 == 0:
            print(f"rendered {i}/{n_frames}")

    if args.format == "icl":
        # .gt.sim: per frame, rows 0-2 of the 3x4 [R|t] block then a blank line
        with open(os.path.join(out_dir, "livingRoom1n.gt.sim"), "w") as f:
            for c2w in poses:
                for r in range(3):
                    f.write(" ".join(f"{x:.9f}" for x in c2w[r, :4]) + "\n")
                f.write("\n")
    else:
        # info file: start frames / end frames / sequence numbers
        with open(os.path.join(out_dir, "info.txt"), "w") as f:
            f.write("0\n")
            f.write(f"{n_frames - 1}\n")
            f.write("01\n")
    print(f"wrote {n_frames} {args.format} frames to {out_dir}")


if __name__ == "__main__":
    main()

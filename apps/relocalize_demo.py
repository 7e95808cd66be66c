"""Camera relocalization demo: second-order CSFD optimization through the map.

The BASELINE config "Camera relocalization: end-to-end CSFD optimization
through the SLAM map" as a runnable app: build a TSDF map from the first part
of a sequence (oracle or tracked poses), then relocalize held-out frames
starting from perturbed initializations using the DCSFD Newton optimizer
(full 6x6 Hessians from hyper-dual cross seeds).

Usage: python apps/relocalize_demo.py [config.yaml] [--frames N] [--perturb 0.1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honour CPU-forcing for tests/CI (sitecustomize pins the TPU otherwise)
if os.environ.get("XSLAM_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="configs/synthetic.yaml")
    ap.add_argument("--frames", type=int, default=12, help="map-building frames")
    ap.add_argument("--holdout", type=int, default=3, help="frames to relocalize")
    ap.add_argument("--perturb", type=float, default=0.10, help="init offset (m)")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xslam_tpu.csfd.single import lift
    from xslam_tpu.geometry import se3
    from xslam_tpu.io.config import load_config
    from xslam_tpu.io.dataset import make_dataset
    from xslam_tpu.models.relocalize import relocalize
    from xslam_tpu.ops import fusion

    config = load_config(args.config)
    config.end_frame = args.frames + args.holdout
    ds = make_dataset(config)
    intr = config.intrinsics
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(config.tsdf_size),
        voxel_size=config.voxel_size,
        trunc_dist=config.trunc_dist,
        max_weight=config.max_integration_weight,
    )
    w2v = np.asarray(config.world2volume, np.float32)

    print(f"building map from {args.frames} frames...")
    vol = fusion.create_volume(vol_cfg)
    integ = jax.jit(lambda v, d, r, t: fusion.integrate(v, d, r, t, intr, vol_cfg))
    for i in range(args.frames):
        dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), np.float32)))
        v2c = se3.inverse(c2v)
        vol = integ(vol, dm, se3.rotation(v2c), se3.translation(v2c))

    reloc = jax.jit(
        lambda val, dm, xi: relocalize(val, dm, xi, intr, vol_cfg, iters=args.iters)
    )
    rng = np.random.default_rng(0)
    for k in range(args.holdout):
        fid = args.frames + k
        dm = fusion.scale_depth(jnp.asarray(ds.get_depth(fid)))
        c2v_true = w2v @ ds.get_pose(fid)
        xi_true = se3.log_real(c2v_true)
        delta = np.concatenate(
            [args.perturb * rng.normal(size=3), 0.02 * rng.normal(size=3)]
        ).astype(np.float32)
        out = reloc(vol.value, dm, jnp.asarray(xi_true + delta))
        T_est = np.asarray(se3.exp_real(out.xi))
        T_init = np.asarray(se3.exp_real(jnp.asarray(xi_true + delta)))
        e0 = np.linalg.norm(T_init[:3, 3] - c2v_true[:3, 3])
        e1 = np.linalg.norm(T_est[:3, 3] - c2v_true[:3, 3])
        losses = np.asarray(out.loss_history)
        print(
            f"frame {fid}: init err {e0 * 100:.1f} cm -> {e1 * 100:.1f} cm; "
            f"mean loss {losses[0]:.4f} -> {losses[-1]:.4f}; inliers {int(out.count)}"
        )


if __name__ == "__main__":
    main()

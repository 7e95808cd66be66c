"""Multi-device scaling benchmark for the sharded engine.

Runs the spatially-sharded SLAM step at mesh sizes 1/2/4/8 and reports
frames/s plus scaling efficiency. On a real pod slice the mesh axes ride
ICI; in this environment only one TPU chip is attached, so by default this
runs on a virtual CPU mesh (functional validation of the sharded path and
its collectives — absolute numbers are not TPU numbers; BASELINE.md records
that caveat).

Usage: python bench_scaling.py [n_frames]
"""

import json
import os
import sys
import time

import numpy as np


def main():
    if os.environ.get("JAX_PLATFORMS", "") != "tpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if jax.config.jax_platforms and "axon" in str(jax.config.jax_platforms):
        jax.config.update("jax_platforms", "cpu")

    from xslam_tpu.geometry.intrinsics import Intrinsics
    from xslam_tpu.io.config import SlamConfig
    from xslam_tpu.io.synthetic import SyntheticDataset
    from xslam_tpu.parallel.engine import ShardedXSlamEngine

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    intr = Intrinsics(fx=240.6, fy=-240.0, cx=159.5, cy=119.5, width=320, height=240)
    config = SlamConfig(
        depth_width=intr.width, depth_height=intr.height,
        fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
        tsdf_size=(128, 128, 128), voxel_size=0.06, end_frame=n_frames,
    )
    ds = SyntheticDataset(n_frames=n_frames, intr=intr)
    depths = [ds.get_depth(i) for i in range(n_frames)]

    results = {}
    for n_dev in (1, 2, 4, 8):
        if jax.device_count() < n_dev:
            break
        engine = ShardedXSlamEngine(config, n_devices=n_dev)
        state = engine.init_state()
        state, res = engine.process_frame(state, depths[0])  # compile
        np.asarray(res.camera2world.v)
        times = []
        for i in range(1, n_frames):
            t0 = time.perf_counter()
            state, res = engine.process_frame(state, depths[i])
            np.asarray(res.camera2world.v)
            times.append(time.perf_counter() - t0)
        fps = 1.0 / float(np.mean(times))
        results[n_dev] = fps

    base = results.get(1)
    out = {
        "metric": "sharded_fps_by_devices",
        "value": results.get(max(results), 0.0),
        "unit": "frames/s",
        "fps": {str(k): round(v, 3) for k, v in results.items()},
        "efficiency": {
            str(k): round(v / (base * k), 3) for k, v in results.items() if base
        },
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

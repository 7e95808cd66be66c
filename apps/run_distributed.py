"""Multi-host pod-slice launcher for the sharded engine.

The distributed story (SURVEY.md §2.E): on a pod slice each host runs this
same program; ``jax.distributed.initialize`` discovers the topology, the
global mesh covers every chip, the TSDF volume is X-slab-sharded across all
of them (halo exchange over ICI within a slice / DCN across slices handled
transparently by the collectives), the depth stream is read on host 0 and
broadcast via the replicated-input path.

This environment has a single chip, so this launcher can only be validated
in process-count=1 form plus the virtual-mesh tests
(tests/test_sharded.py, __graft_entry__.dryrun_multichip); on real hardware:

    # on every host of the slice
    python apps/run_distributed.py configs/synthetic.yaml

Launch variables (coordinator address, process id/count) follow the standard
jax.distributed conventions (auto-detected on Cloud TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honour CPU-forcing for tests/CI (sitecustomize pins the TPU otherwise)
if os.environ.get("XSLAM_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    import jax

    if int(os.environ.get("XSLAM_DISTRIBUTED", "0")):
        jax.distributed.initialize()

    from xslam_tpu.io.config import load_config
    from xslam_tpu.io.dataset import make_dataset
    from xslam_tpu.parallel.engine import ShardedXSlamEngine
    from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first

    config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/synthetic.yaml"
    config = load_config(config_path)
    dataset = make_dataset(config)
    n_frames = min(len(dataset), config.end_frame - config.start_frame)

    engine = ShardedXSlamEngine(config)
    state = engine.init_state()
    if jax.process_index() == 0:
        print(
            f"mesh: {engine.mesh.devices.size} devices over "
            f"{jax.process_count()} hosts; volume slab per device: "
            f"{config.tsdf_size[0] // engine.mesh.devices.size} x "
            f"{config.tsdf_size[1]} x {config.tsdf_size[2]}"
        )

    import time

    total = 0.0
    for i in range(n_frames):
        depth = dataset.get_depth(config.start_frame + i)
        t0 = time.perf_counter()
        state, res = engine.process_frame(state, depth)
        pose = np.asarray(res.camera2world.v)
        if i > 0:
            total += time.perf_counter() - t0
        engine.pose_log.append(pose)

    if jax.process_index() == 0 and n_frames > 1:
        fps = (n_frames - 1) / total
        gt = [dataset.get_pose(config.start_frame + i) for i in range(n_frames)]
        ate = ate_rmse(normalize_to_first(engine.pose_log), normalize_to_first(gt))
        print(f"frames/s (all devices): {fps:.2f}; ATE RMSE: {ate:.5f} m")


if __name__ == "__main__":
    main()

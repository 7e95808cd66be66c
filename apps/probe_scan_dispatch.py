"""Probe: why is scan dispatch slower per frame than per-frame dispatch?

BENCH round 3 measured 185 ms/frame for lax.scan chunks of 6 frames vs
92.6 ms/frame for the per-frame dispatch loop — the opposite of the
expected ~30 ms/frame relay-dispatch saving. This times process_frames at
K=1/2/6 against process_frame on the same state/frames to localize the
cost (constant-per-dispatch vs per-iteration).

Run serialized with other TPU work: python -u apps/probe_scan_dispatch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.io.config import SlamConfig
from xslam_tpu.io.synthetic import SyntheticDataset
from xslam_tpu.models.kinfu import XSlamEngine
from xslam_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    n = 16
    march = os.environ.get("XSLAM_PROBE_MARCH", "skip")
    config = SlamConfig(
        end_frame=n,
        volume_layout="brick",
        fusion_mode="brick",
        fusion_brick_cap=6144,
        raycast_normals="screen",
        raycast_march=march,
        model_map_level=1,
        icp_fixed_assoc=True,
    )
    print(f"march={march}")
    ds = SyntheticDataset(n_frames=n, degrees_per_frame=0.4)
    depths = [jnp.asarray(ds.get_depth(i)) for i in range(n)]
    jax.block_until_ready(depths)

    def fetch(res):
        return np.asarray(res.camera2world.v)

    # --- per-frame dispatch -------------------------------------------------
    eng = XSlamEngine(config)
    state = eng.init_state()
    state, res = eng.process_frame(state, depths[0])
    fetch(res)
    t0 = time.perf_counter()
    for i in range(1, 5):
        state, res = eng.process_frame(state, depths[i])
    fetch(res)
    per_frame_ms = (time.perf_counter() - t0) / 4 * 1e3
    print(f"per-frame dispatch: {per_frame_ms:.1f} ms/frame", flush=True)

    # --- scan dispatch, looped and unrolled bodies ---------------------------
    variants = [(1, False), (2, False), (6, False), (4, True)]
    if os.environ.get("XSLAM_PROBE_UNROLL_ONLY"):
        variants = [(4, True)]
    for K, unroll in variants:
        eng = XSlamEngine(config)
        state = eng.init_state()
        stack0 = jnp.stack(depths[0:K])
        stack1 = jnp.stack(depths[K:2 * K])
        t0 = time.perf_counter()
        state, res = eng.process_frames(state, stack0, unroll=unroll)  # compile
        fetch(res)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, res = eng.process_frames(state, stack1, unroll=unroll)
        fetch(res)
        dt = (time.perf_counter() - t0) * 1e3
        tag = "unrolled" if unroll else "scan"
        print(
            f"{tag} K={K}: {dt:.1f} ms/chunk = {dt / K:.1f} ms/frame"
            f" (compile+warm {compile_s:.0f}s)", flush=True,
        )


if __name__ == "__main__":
    main()

"""Benchmark: full SLAM pipeline frames/sec/chip on the canonical workload.

Mirrors the reference's measurement exactly: the timer spans ProcessFrame
only (bilateral + pyramids + 12-iteration 3-level ICP + 256^3 TSDF fusion +
640x480 raycast), mean over frames, FPS = 1000/mean_ms
(``Experiments/test_xkinect_fusion/main.cpp:57-60,83``). Depth frames are
synthetic renders of the default scene (no dataset downloads in this
environment); tracking runs for real (not oracle poses) and the ATE of the
run is reported alongside.

vs_baseline: ratio to the 30 FPS real-time bar — the reference publishes no
numeric FPS (BASELINE.md: "published: {}"), its README claims "real-time"
dense differentiable SLAM on an RTX 4090, so 30 FPS on one TPU chip is the
parity bar.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from xslam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from xslam_tpu.io.config import SlamConfig
    from xslam_tpu.io.synthetic import SyntheticDataset
    from xslam_tpu.models.kinfu import XSlamEngine
    from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    warmup = 2

    # the fast verified configuration: persistent brick-major volume
    # (zero dense<->brick transposes), brick-compacted fusion
    # (bit-equivalent to dense; cap covers the measured ~3.7k ACTIVE bricks
    # with margin), depth-anchored temporal march (window repair around the
    # current depth frame's surface distances with prev-hit fallback and an
    # on-device full-march refresh cond; approximate — validated at 1.7 mm
    # ATE here and 7.3 mm / 0 failures on the realistic 300-frame ICL run,
    # BASELINE.md round 4), pair-table trilinear taps (bit-identical, 2x
    # fewer gather issues), half-resolution model maps, central-difference
    # screen normals, per-level fixed ICP correspondences (all within the
    # tracking-accuracy envelope — tests/test_bricks.py,
    # test_fast_paths.py, test_march_skip.py); the ATE of this exact run is
    # reported alongside the FPS.
    # fusion gathers cost cap*512 regardless of the actual ACTIVE count
    # (static shapes), so the cap is sized to the measured maximum (3733
    # bench / 3662 realistic ACTIVE bricks) + ~10% margin, with the exact
    # dense re-integration as the in-jit overflow safety net (rare slow
    # frame instead of a dropped update)
    config = SlamConfig(
        end_frame=n_frames,
        volume_layout="brick",
        fusion_mode="brick",
        fusion_brick_cap=2560,
        fusion_overflow="dense",
        raycast_normals="screen",
        raycast_march="temporal",
        model_map_level=1,
        icp_fixed_assoc=True,
    )
    # experimental knob overrides (perf A/B runs): XSLAM_BENCH_OVERRIDES as
    # JSON, e.g. '{"raycast_packed_taps": false}' — the canonical bench is
    # the default config above
    import os

    overrides = os.environ.get("XSLAM_BENCH_OVERRIDES")
    if overrides:
        for k, v in json.loads(overrides).items():
            setattr(config, k, v)
    ds = SyntheticDataset(n_frames=n_frames, degrees_per_frame=0.4)
    engine = XSlamEngine(config)
    state = engine.init_state()

    # pre-render and pre-upload all depth frames (dataset IO and the
    # host->device upload are outside the reference's timer too,
    # main.cpp:51-58: it times ProcessFrame only)
    import jax.numpy as jnp

    depths = [jnp.asarray(ds.get_depth(i)) for i in range(n_frames)]
    jax.block_until_ready(depths)

    # dispatch mode: "frame" (default) is the per-frame-dispatch loop
    # mirroring the reference's driver; "scan" processes frames in
    # on-device lax.scan chunks (kinfu.process_frames), numerically
    # identical. Measured round 3 (BASELINE.md): scan does NOT win on this
    # toolchain — the scanned step runs ~same-or-slower per frame (the
    # expected ~30 ms/dispatch relay saving did not materialize; the gap
    # between the stage-profile device sum and the frame loop is real
    # per-frame work, not dispatch overhead) — so the reference-shaped
    # per-frame loop stays the default.
    mode = os.environ.get("XSLAM_BENCH_MODE", "frame")
    chunk = 6
    warmup_s = 0.0

    if mode == "scan":
        n_chunks = n_frames // chunk
        warm_frames = chunk  # first chunk = warmup + compile
        stacked = [jnp.stack(depths[i * chunk:(i + 1) * chunk]) for i in range(n_chunks)]
        poses_chunks = []
        overflow_chunks = []
        state, res = engine.process_frames(state, stacked[0])
        poses_chunks.append(np.asarray(res.camera2world.v))
        overflow_chunks.append(np.asarray(res.fusion_overflow))

        t0 = time.perf_counter()
        results = []
        for c in range(1, n_chunks):
            state, res = engine.process_frames(state, stacked[c])
            results.append(res)
        # close the span by fetching the last pose (block_until_ready can
        # be a no-op under relayed backends)
        np.asarray(results[-1].camera2world.v[-1])
        span = time.perf_counter() - t0
        for res in results:
            poses_chunks.append(np.asarray(res.camera2world.v))
            overflow_chunks.append(np.asarray(res.fusion_overflow))

        engine.pose_log = list(np.concatenate(poses_chunks, axis=0))
        overflowed = bool(np.concatenate(overflow_chunks).any())
        timed = chunk * (n_chunks - 1)
        n_frames = chunk * n_chunks  # for the ATE slice below
        mean_ms = 1000.0 * span / timed
    else:
        # warmup (compile + first dispatches), outside the timed region
        t_warm = time.perf_counter()
        results = []
        for i in range(warmup):
            state, res = engine.process_frame(state, depths[i])
            results.append(res)
        np.asarray(results[-1].camera2world.v)
        warmup_s = time.perf_counter() - t_warm

        t0 = time.perf_counter()
        for i in range(warmup, n_frames):
            state, res = engine.process_frame(state, depths[i])
            results.append(res)
        np.asarray(results[-1].camera2world.v)
        span = time.perf_counter() - t0

        engine.pose_log = [np.asarray(r.camera2world.v) for r in results]
        overflowed = any(bool(r.fusion_overflow) for r in results)
        mean_ms = 1000.0 * span / (n_frames - warmup)
    fps = 1000.0 / mean_ms

    est = normalize_to_first(engine.pose_log)
    gt = normalize_to_first([ds.get_pose(i) for i in range(n_frames)])
    ate = ate_rmse(est, gt)

    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": "slam_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 4),
                "mean_frame_ms": round(mean_ms, 2),
                "ate_rmse_m": round(ate, 5),
                "fusion_overflow": overflowed,
                "frames": n_frames,
                "dispatch": mode,
                # compile+first-dispatch time (cold = remote compile,
                # warm = persistent-cache hit; BASELINE round-4 notes)
                "warmup_s": round(warmup_s, 1),
                "workload": "640x480 depth, 256^3 TSDF @0.03m, 3-level ICP {5,4,3}",
                "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
            }
        )
    )


if __name__ == "__main__":
    main()

"""Multi-device scaling benchmark for the sharded engine.

Runs the spatially-sharded SLAM step at mesh sizes 1/2/4/8 and reports
frames/s plus scaling efficiency, and a per-frame COMMUNICATION BUDGET
parsed from the compiled step's optimized HLO: instruction counts and byte
volumes for every collective kind (all-gather, all-reduce,
collective-permute, reduce-scatter, all-to-all). This is the model behind
any pod-slice efficiency claim: collective bytes/frame vs ICI bandwidth
bounds the achievable scaling before a multi-host run exists.

On a real pod slice the mesh axes ride ICI; in this environment only one
TPU chip is attached, so by default this runs on a virtual CPU mesh
(functional validation of the sharded path and its collectives — absolute
fps numbers are not TPU numbers; BASELINE.md records that caveat). The HLO
collective census is platform-independent apart from XLA backend fusion
choices.

Caveat: counts are static HLO-instruction counts; a collective inside a
while-loop body executes once per iteration (the sharded march keeps its
pmin/psum OUTSIDE the loop precisely to keep the census honest).

Usage: python bench_scaling.py [n_frames]
       python bench_scaling.py --census-canonical   (compile-only census of
           the sharded step at the CANONICAL 256^3 / 640x480 scale on the
           virtual mesh — no execution; replaces the old 8x-scaled
           half-scale extrapolation with compiled-HLO fact)
"""

import json
import os
import re
import sys
import time

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-gather", "all-reduce", "collective-permute", "reduce-scatter",
    "all-to-all",
)


def _shape_bytes(shape_str: str) -> int:
    """Byte size of an HLO result shape ('f32[8,64]', '(f32[2], s32[])')."""
    total = 0
    for m in re.finditer(r"(\w+)\[([0-9,]*)\]", shape_str):
        dt, dims = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_budget(hlo_text: str) -> dict:
    """Census of collective ops in optimized HLO: {kind: {count, bytes}}.

    Bytes are the collective's RESULT size (for all-gather: the assembled
    array; for all-reduce/permute: the reduced/moved payload) — the
    per-frame data volume that must cross ICI links on a real mesh."""
    out = {}
    for kind in _COLLECTIVES:
        count, nbytes = 0, 0
        for line in hlo_text.splitlines():
            if f" {kind}(" in line or f" {kind}-start(" in line:
                m = re.search(r"=\s*(.+?)\s+" + kind, line)
                if m:
                    count += 1
                    nbytes += _shape_bytes(m.group(1))
        if count:
            out[kind] = {"count": count, "bytes": nbytes}
    return out


def census_canonical():
    """Compile (never execute) the sharded step at canonical scale on the
    8-device virtual mesh and print the real collective census — the
    VERDICT r4 ask: make the 137 MB all-gather number a compiled fact."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if jax.config.jax_platforms and "axon" in str(jax.config.jax_platforms):
        jax.config.update("jax_platforms", "cpu")

    from xslam_tpu.io.config import SlamConfig
    from xslam_tpu.parallel.engine import ShardedXSlamEngine

    config = SlamConfig(
        end_frame=2, volume_layout="brick", fusion_mode="brick",
        fusion_brick_cap=2560, fusion_overflow="dense",
        raycast_normals="screen", raycast_march="temporal",
        model_map_level=1, icp_fixed_assoc=True,
    )
    out = {}
    for n_dev in (2, 4, 8):
        engine = ShardedXSlamEngine(config, n_devices=n_dev)
        state = engine.init_state()
        depth0 = np.zeros((config.depth_height, config.depth_width), np.uint16)
        t0 = time.perf_counter()
        hlo = engine._step.lower(
            state, depth0, np.eye(4, dtype=np.float32)
        ).compile().as_text()
        out[n_dev] = {
            "compile_s": round(time.perf_counter() - t0, 1),
            "collectives": {
                kind: {"count": v["count"], "mb": round(v["bytes"] / 1e6, 3)}
                for kind, v in collective_budget(hlo).items()
            },
        }
        print(json.dumps({"n_devices": n_dev, **out[n_dev]}), flush=True)
    print(json.dumps({
        "metric": "canonical_collective_census",
        "workload": "640x480 depth, 256^3 TSDF, temporal brick config",
        "census": out,
    }))


def main():
    if "--census-canonical" in sys.argv:
        return census_canonical()
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
    # the bench.py fast configuration (brick layout) at half scale — the
    # deployment path whose communication budget matters
    config = SlamConfig(
        depth_width=intr.width, depth_height=intr.height,
        fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
        tsdf_size=(128, 128, 128), voxel_size=0.06, end_frame=n_frames,
        volume_layout="brick", fusion_mode="brick", fusion_brick_cap=6144,
        raycast_normals="screen", raycast_march="temporal",
        model_map_level=1, icp_fixed_assoc=True,
    )
    ds = SyntheticDataset(n_frames=n_frames, intr=intr)
    depths = [ds.get_depth(i) for i in range(n_frames)]

    results = {}
    comm = {}
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
        # collective census from the step actually being timed
        state2 = engine.init_state()
        hlo = engine._step.lower(
            state2, depths[0], np.eye(4, dtype=np.float32)
        ).compile().as_text()
        comm[n_dev] = collective_budget(hlo)

    base = results.get(1)
    out = {
        "metric": "sharded_fps_by_devices",
        "value": results.get(max(results), 0.0),
        "unit": "frames/s",
        "fps": {str(k): round(v, 3) for k, v in results.items()},
        "efficiency": {
            str(k): round(v / (base * k), 3) for k, v in results.items() if base
        },
        "collectives_per_frame": {
            str(k): {
                kind: {"count": v["count"], "mb": round(v["bytes"] / 1e6, 3)}
                for kind, v in c.items()
            }
            for k, c in comm.items()
        },
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

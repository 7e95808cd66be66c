"""End-to-end SLAM driver: the L5 experiment app.

Mirrors ``Experiments/test_xkinect_fusion/main.cpp``: YAML config in,
per-frame estimated/gt pose logging (``output/slam/frame-XXXXXX.pose.txt``,
``output/gt/...``), optional final point-cloud PLY export, mean frame time
printed at the end. Adds what the reference leaves to offline tooling: an
ATE RMSE report when ground truth is available.

Usage:
    python apps/run_slam.py <config.yaml> [--sharded] [--frames N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honour CPU-forcing for tests/CI (sitecustomize pins the TPU otherwise)
if os.environ.get("XSLAM_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from xslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np


def save_pose(output_dir: str, frame_id: int, pose: np.ndarray):
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"frame-{frame_id:06d}.pose.txt")
    from xslam_tpu.runtime import native

    if not native.write_pose(path, pose):
        np.savetxt(path, pose, fmt="%.7f")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--sharded", action="store_true", help="use the multi-chip engine")
    ap.add_argument("--frames", type=int, default=None, help="override end_frame")
    ap.add_argument(
        "--mesh", choices=("tetra", "mc"), default=None,
        help="export the final isosurface mesh (output/mesh.ply): 'tetra' = "
        "marching tetrahedra, 'mc' = full 256-case marching cubes "
        "(ops/extract.py)",
    )
    ap.add_argument(
        "--scan", type=int, default=0, metavar="K",
        help="process frames in on-device lax.scan chunks of K (one dispatch "
        "per chunk instead of per frame — amortizes the ~30 ms relay "
        "round-trip; same math as the per-frame loop, kinfu.process_frames)",
    )
    args = ap.parse_args()

    from xslam_tpu.io.config import load_config
    from xslam_tpu.io.dataset import make_dataset
    from xslam_tpu.io.ply import export_ply

    config = load_config(args.config)
    if args.frames is not None:
        config.end_frame = args.frames
    dataset = make_dataset(config)
    step = max(1, config.frame_step)
    frame_ids = list(
        range(config.start_frame, min(len(dataset) + config.start_frame, config.end_frame), step)
    )
    n_frames = len(frame_ids)
    print(f"frame num: {n_frames}")

    print("initialize engine......")
    engine_logs_poses = False
    if args.sharded:
        from xslam_tpu.parallel.engine import ShardedXSlamEngine

        engine = ShardedXSlamEngine(config)
    else:
        from xslam_tpu.models.kinfu import XSlamEngine

        engine = XSlamEngine(config)
    if config.reloc_after_failures > 0:
        # relocalize-on-tracking-loss + keyframing wrapper (the recovery
        # path the reference's commented-out relocalization wrappers imply,
        # KinectFusionReconstruction.cpp:374-436) — engine-agnostic, wraps
        # the sharded engine too
        from xslam_tpu.models.recovery import RecoveringEngine

        engine = RecoveringEngine(config, engine=engine)
        engine_logs_poses = True  # RecoveringEngine appends to pose_log itself
        if args.scan > 1:
            print("note: --scan is incompatible with recovery (per-frame "
                  "host inspection); using the per-frame loop")
    state = engine.init_state()

    out_dir = config.output_dir
    total_time = 0.0
    timed_frames = 0
    print("start slam!")

    def log_frame(i, fid, pose_c2w, align_ok, overflow=False, inliers=None):
        if not engine_logs_poses:
            engine.pose_log.append(pose_c2w)
        if config.log_slam_pose:
            save_pose(os.path.join(out_dir, "slam"), fid, pose_c2w)
        if config.log_gt_pose:
            gt = np.linalg.inv(dataset.get_pose(frame_ids[0])) @ dataset.get_pose(fid)
            save_pose(os.path.join(out_dir, "gt"), fid, gt)
        if not align_ok:
            print(f"frame {i}: align failed!" + (
                f" (inliers={int(inliers)})" if inliers is not None else ""))
        if overflow:
            # brick-fusion ACTIVE list overflow: with fusion_overflow="flag"
            # this frame's map update was PARTIAL (dropped bricks) — surface
            # it; "dense" recovery re-integrates and never sets the flag
            print(f"frame {i}: fusion brick-cap overflow (map update partial)")

    if args.scan > 1 and not engine_logs_poses:
        import jax.numpy as jnp

        K = args.scan
        pos = 0
        while pos < n_frames:
            ids = frame_ids[pos:pos + K]
            depths = jnp.stack([jnp.asarray(dataset.get_depth(f)) for f in ids])
            gts = (
                np.stack([dataset.get_pose(f) for f in ids]).astype(np.float32)
                if config.use_gt_pose else None
            )
            t0 = time.perf_counter()
            state, res = engine.process_frames(state, depths, gt_poses=gts)
            poses = np.asarray(res.camera2world.v)  # host fetch = full sync
            dt = (time.perf_counter() - t0) * 1000.0
            if pos > 0:  # exclude the compile chunk
                total_time += dt
                timed_frames += len(ids)
            oks = np.asarray(res.align_ok)
            ovs = np.asarray(res.fusion_overflow)
            inl = np.asarray(res.inlier_count)
            for j, fid in enumerate(ids):
                log_frame(pos + j, fid, poses[j], bool(oks[j]),
                          overflow=bool(ovs[j]), inliers=inl[j])
            pos += len(ids)
    else:
        for i, fid in enumerate(frame_ids):
            depth = dataset.get_depth(fid)
            gt_pose = dataset.get_pose(fid) if config.use_gt_pose else None

            t0 = time.perf_counter()
            state, res = engine.process_frame(state, depth, gt_pose=gt_pose)
            pose_c2w = np.asarray(res.camera2world.v)  # host fetch = full sync
            dt = (time.perf_counter() - t0) * 1000.0
            if i > 0:  # exclude compile
                total_time += dt
                timed_frames += 1
            log_frame(i, fid, pose_c2w, bool(res.align_ok),
                      overflow=bool(res.fusion_overflow),
                      inliers=np.asarray(res.inlier_count))

    if config.draw_pcd:
        from xslam_tpu.ops.extract import extract_points
        import jax

        pc = jax.jit(
            lambda vol: extract_points(vol, engine.vol_cfg, capacity=1_000_000)
        )(
            engine.dense_volume(state)
            if hasattr(engine, "dense_volume")
            else state.volume
        )
        n = int(pc.count)
        os.makedirs(out_dir, exist_ok=True)
        export_ply(
            os.path.join(out_dir, "pcd.ply"),
            np.asarray(pc.points)[:n],
            np.asarray(pc.normals)[:n],
        )
        print(f"exported {n} points")

    if args.mesh:
        import jax

        from xslam_tpu.io.ply import export_ply_mesh
        from xslam_tpu.ops.extract import extract_mesh, extract_mesh_mc

        fn = extract_mesh_mc if args.mesh == "mc" else extract_mesh
        mesh = jax.jit(
            lambda vol: fn(vol, engine.vol_cfg, capacity=2_000_000)
        )(engine.dense_volume(state) if hasattr(engine, "dense_volume") else state.volume)
        k = int(mesh.count)
        os.makedirs(out_dir, exist_ok=True)
        export_ply_mesh(
            os.path.join(out_dir, "mesh.ply"), np.asarray(mesh.vertices)[:k]
        )
        print(f"exported {k} {args.mesh} triangles")

    if timed_frames:
        print(f"mean frame time = {total_time / timed_frames:.3f} ms")

    # in-repo ATE evaluation (the reference compares pose dirs offline)
    from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first

    gt_poses = [dataset.get_pose(fid) for fid in frame_ids]
    ate = ate_rmse(normalize_to_first(engine.pose_log), normalize_to_first(gt_poses))
    print(f"ATE RMSE = {ate:.5f} m")

    # backend refinement: pose-graph (+ recorded loop closures) + depth-
    # anchored Schur BA over the keyframe log, propagated to the full
    # trajectory and exported alongside the odometry
    if engine_logs_poses and len(getattr(engine, "keyframes", [])) >= 2:
        try:
            refined = engine.refine_trajectory()
        except Exception as e:  # noqa: BLE001 — backend failure must not
            # kill the run: the odometry result above is already reported
            print(f"backend refinement FAILED ({type(e).__name__}): {e}")
            return
        if config.log_slam_pose:
            for i, fid in enumerate(frame_ids[: len(refined)]):
                save_pose(os.path.join(out_dir, "slam_refined"), fid, refined[i])
        ate_ref = ate_rmse(
            normalize_to_first(list(refined)), normalize_to_first(gt_poses)
        )
        print(
            f"refined ATE RMSE = {ate_ref:.5f} m "
            f"({len(engine.keyframes)} keyframes, "
            f"{len(engine.loop_edges)} loop closures)"
        )


if __name__ == "__main__":
    main()

"""Per-stage TPU timing of the SLAM frame pipeline (fast verified config).

Times each stage of ``process_frame`` (models/kinfu.py) as its own jit, in
the bench configuration: persistent brick-major volume, brick fusion,
event-exact skip march at half-resolution model maps, screen normals,
fixed-association ICP. Volume state is produced by running
the fusion stage itself over a few synthetic frames with ground-truth poses
(no full-pipeline compile needed).

Timing through the axon relay: dispatch is async and ``block_until_ready``
can be a no-op, so laps are closed by fetching a tiny scalar slice — a
~25-30 ms relay round-trip per dispatch. To cancel that overhead each stage
is ALSO timed as a ``lax.scan`` of N chained iterations inside one jit
(iteration i's input perturbed by a denormal function of iteration i-1's
output, so XLA can neither CSE nor overlap them); the per-iteration device
time is (T_N - T_1)/(N - 1). Those are the numbers BASELINE.md records.

Usage: python -u apps/profile_stages.py [reps] [scan_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("XSLAM_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from xslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import numpy as np


def fetch(x):
    """Force completion by pulling one scalar to host."""
    return np.asarray(x.reshape(-1)[0])


def lap(fn, *args, reps=3, loop=20):
    """Per-execution time of ``fn(*args)`` via a SUBMIT-ONLY dispatch loop:
    N independent executes queued back-to-back, one tiny fetch at the end.
    Round-4 probe (apps/probe_dispatch_overhead.py): a dispatch costs
    ~1.5 ms (3 ms with a 201 MB carry) and a host FETCH ~25-30 ms — so
    fetch-per-rep timing (the old method) buries stages under fetch
    overhead, while this loop measures device time + ~1.5 ms. The TPU
    executes queued programs serially, so division by N is sound."""
    import jax

    out = fn(*args)  # warm/compile
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")]
    fetch(leaves[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(loop):
            out = fn(*args)
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")]
        fetch(leaves[0])
        ts.append((time.perf_counter() - t0) / loop)
    # subtract the per-dispatch floor measured IN THIS RUN (the relay's
    # floor drifts between ~1.5 and ~5 ms across sessions) + the one
    # closing fetch amortized over the loop
    return max(min(ts) - _dispatch_floor() - 0.025 / loop, 0.0), out


_FLOOR = [None]


def _dispatch_floor(n=40):
    """Per-dispatch floor of a compute-free program, measured once per run."""
    if _FLOOR[0] is None:
        import jax
        import jax.numpy as jnp

        nul = jax.jit(lambda x: x + 1.0)
        x = nul(jnp.zeros((8, 128), jnp.float32))
        fetch(x)
        t0 = time.perf_counter()
        for _ in range(n):
            x = nul(x)
        fetch(x)
        _FLOOR[0] = max((time.perf_counter() - t0 - 0.025) / n, 0.0)
        print(f"per-dispatch floor this run: {1e3 * _FLOOR[0]:.2f} ms", flush=True)
    return _FLOOR[0]


def device_time(fn, *args, scan_n=8, reps=3):
    """Per-iteration device time of ``fn(*args)`` with dispatch overhead
    cancelled: run a lax.scan of k chained iterations in ONE jit for
    k in {1, scan_n} and return (T_n - T_1)/(n - 1).

    Chaining: iteration i perturbs the first float input leaf by a denormal
    derived from iteration i-1's output, so XLA cannot CSE the iterations
    into one or overlap them; the perturbation (~1e-38) is far below any
    working precision."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(args)
    f_idx = next(
        i for i, l in enumerate(leaves)
        if hasattr(l, "dtype") and l.dtype == jnp.float32
    )

    def make(k):
        @jax.jit
        def run(*args):
            leaves0 = jax.tree.flatten(args)[0]

            def body(c, _):
                ls = list(leaves0)
                ls[f_idx] = ls[f_idx] + c
                out = fn(*jax.tree.unflatten(treedef, ls))
                # depend on a FULL reduction of every float output leaf:
                # depending on a single element would let XLA slice away the
                # rest of a map-type stage (verified: refine dropped 98% of
                # its work). nansum: NaN is a legal map value (sentinel) and
                # must not poison the chain. Cost: one read pass over the
                # outputs, negligible vs the gather-bound stages measured.
                lf = [
                    l for l in jax.tree.leaves(out)
                    if hasattr(l, "dtype") and l.dtype == jnp.float32
                ]
                s = sum(jnp.nansum(l) for l in lf)
                c2 = s.astype(jnp.float32) * 1e-38 * 1e-38
                return c2, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return run

    def t_of(k):
        run = make(k)
        fetch(run(*args))  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(run(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, tn = t_of(1), t_of(scan_n)
    return max(tn - t1, 0.0) / (scan_n - 1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scan_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax
    import jax.numpy as jnp

    from xslam_tpu.csfd.single import CSFD, lift
    from xslam_tpu.geometry import se3
    from xslam_tpu.io.config import SlamConfig
    from xslam_tpu.io.synthetic import SyntheticDataset
    from xslam_tpu.ops import bricks, fusion, fusion_brick, icp, preprocess
    from xslam_tpu.ops import raycast, raycast_bricks

    config = SlamConfig(
        volume_layout="brick", fusion_mode="brick", fusion_brick_cap=2560,
        fusion_overflow="dense",
        raycast_normals="screen", raycast_march="skip",
        model_map_level=1, icp_fixed_assoc=True,
    )
    intr = config.intrinsics
    L = config.model_map_level
    model_intr = intr.level(L)
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(config.tsdf_size), voxel_size=config.voxel_size,
        trunc_dist=config.trunc_dist, max_weight=config.max_integration_weight,
    )
    res = vol_cfg.resolution
    w2v_np = np.asarray(config.world2volume, np.float32)
    ds = SyntheticDataset(n_frames=8, degrees_per_frame=0.4)
    levels = config.num_levels

    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- stage jits -------------------------------------------------------
    @jax.jit
    def prep(depth_u16):
        d0 = preprocess.bilateral_filter(depth_u16)
        depths = [d0]
        for i in range(1, levels):
            depths.append(preprocess.pyr_down(depths[-1]))
        vmaps = [preprocess.create_vmap(intr.level(i), depths[i]) for i in range(levels)]
        nmaps = [preprocess.create_nmap(v) for v in vmaps]
        return depths, vmaps, nmaps

    @jax.jit
    def pose_pieces(c2w):
        c2w = lift(c2w)
        w2v = lift(jnp.asarray(w2v_np))
        c2v = se3.matmul(w2v, c2w)
        v2c = se3.inverse(c2v)
        return (se3.rotation(v2c), se3.translation(v2c),
                se3.rotation(c2v), se3.translation(c2v))

    def fuse_fn(vol, depth_u16, r_v2c, t_v2c):
        depth_m = fusion.scale_depth(depth_u16)
        out, _ = fusion_brick.integrate_rows(
            vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
            bi_threshold=config.bi_interpolate_threshold,
            cap=config.fusion_brick_cap,
        )
        return out

    fuse = jax.jit(fuse_fn, donate_argnums=(0,))
    fuse_keep = jax.jit(fuse_fn)  # non-donating variant for repeated timing

    @jax.jit
    def rays_of(r_c2v, t_c2v):
        return raycast._camera_rays(r_c2v, t_c2v, model_intr)

    @jax.jit
    def skip_pack(vol):
        return bricks.skip_rows(vol, res)

    @jax.jit
    def skip_march_stage(packed, ray_start, ray_dir):
        # the round-2 bench march: event-exact skip march at model resolution
        read = raycast_bricks._value_reader(packed, res)
        return raycast.march_skip(
            None, None, ray_start, ray_dir, vol_cfg,
            packed_read=read, shape=res,
        )

    @jax.jit
    def hier_march_stage(vol, packed, ray_start, ray_dir):
        # the round-3 bench march: skip march at HALF the model resolution
        # anchoring a window-repair pass at model resolution
        # (raycast_bricks.raycast_bricks_rays, march_mode="hier_skip")
        read = raycast_bricks._value_reader(packed, res)
        coarse_dir = CSFD(ray_dir.v[:, ::2, ::2], ray_dir.g[:, ::2, ::2])
        coarse = raycast.march_skip(
            None, None, ray_start, coarse_dir, vol_cfg,
            packed_read=read, shape=res,
        )
        return raycast._window_repair(
            None, ray_start, ray_dir.v, coarse, config.raycast_hier_window,
            vol_cfg, read_fn=raycast_bricks._value_reader(vol.value, res),
            shape=res,
        )

    @jax.jit
    def temporal_march_stage(vol, t_anchor, ray_start, ray_dir):
        # the round-4 bench march: depth-anchored window repair
        # (raycast.march_temporal; anchors = current depth's surface
        # distances, built in the engine from vmaps_curr[model_map_level])
        return raycast.march_temporal(
            None, t_anchor, ray_start, ray_dir, vol_cfg,
            window=config.raycast_temporal_window,
            read_fn=raycast_bricks._value_reader(vol.value, res),
            shape=res,
        )

    @jax.jit
    def pair_table_stage(vol):
        return raycast_bricks.interleave_vg(vol)

    v2w = np.linalg.inv(w2v_np).astype(np.float32)

    def refine_stage_fn(vol, ray_start, ray_dir, hit_found, hit_dead, pair_vg=None):
        from xslam_tpu.csfd import vec3

        r_v2w = lift(jnp.asarray(v2w[:3, :3]))
        t_v2w = lift(jnp.asarray(v2w[:3, 3]))
        accept = hit_found < jnp.minimum(hit_dead, raycast.INF_T)

        if pair_vg is not None:

            def trilin_at(p):
                return raycast_bricks.trilinear_pair_bricks(
                    pair_vg, res, vec3.comp(p, 0), vec3.comp(p, 1),
                    vec3.comp(p, 2), vol_cfg.voxel_size,
                )
        else:

            def trilin_at(p):
                return raycast_bricks.trilinear_bricks(
                    vol, res, vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2),
                    vol_cfg.voxel_size,
                )

        shape_only = jax.ShapeDtypeStruct(res, jnp.float32)
        vmap, nmap, v_ok, n_ok = raycast.refine(
            fusion.VolumeState(shape_only, shape_only, shape_only),
            ray_start, ray_dir, hit_found, accept,
            r_v2w, t_v2w, vol_cfg, normals_mode="screen", trilin_fn=trilin_at,
        )
        vmap, nmap = raycast.finalize_maps(vmap, nmap, v_ok, n_ok)
        nmap = raycast.screen_normals(vmap)
        vmaps = [vmap]
        nmaps = [nmap]
        for i in range(1, levels):
            vmaps.append(CSFD(preprocess.resize_vmap(vmaps[-1].v),
                              preprocess.resize_vmap(vmaps[-1].g)))
            from xslam_tpu.models.kinfu import _resize_nmap_dual
            nmaps.append(_resize_nmap_dual(nmaps[-1]))
        return tuple(vmaps), tuple(nmaps)

    refine_stage = jax.jit(refine_stage_fn)
    refine_pair_stage = jax.jit(
        lambda vol, rs, rd, hf, hd, vg: refine_stage_fn(vol, rs, rd, hf, hd, pair_vg=vg)
    )

    @jax.jit
    def icp_stage(w2c, vmaps_curr, nmaps_curr, vmaps_prev, nmaps_prev):
        w2c = lift(w2c)
        c2w_prev = se3.inverse(w2c)
        r_prev = se3.rotation(c2w_prev)
        t_prev = se3.translation(c2w_prev)
        r_prev_inv = se3.rotation(w2c)
        r_curr, t_curr = r_prev, t_prev
        for level in reversed(range(levels)):
            iters = config.icp_iterations[level]
            level_assoc = icp.associate(
                r_curr, t_curr, vmaps_curr[level], r_prev_inv, t_prev,
                intr.level(level + L), vmaps_prev[level], nmaps_prev[level],
            )

            def body(carry, _, level=level, level_assoc=level_assoc):
                r_curr, t_curr = carry
                system = icp.build_system(
                    r_curr, t_curr, vmaps_curr[level], nmaps_curr[level],
                    r_prev_inv, t_prev, intr.level(level + L),
                    vmaps_prev[level], nmaps_prev[level],
                    config.dist_thres, config.angle_thres_sine, assoc=level_assoc,
                )
                x, ok = icp.solve_increment(system)
                inc = se3.euler_xyz_increment(
                    *[CSFD(x.v[i], x.g[i]) for i in range(6)]
                )
                r_inc, t_inc = se3.rotation(inc), se3.translation(inc)
                t_new = se3.matvec(r_inc, t_curr) + t_inc
                r_new = se3.matmul(r_inc, r_curr)
                return (r_new, t_new), None

            (r_curr, t_curr), _ = jax.lax.scan(body, (r_curr, t_curr), None, length=iters)
        return t_curr.v

    # ---- build realistic state with gt poses ------------------------------
    t_all0 = time.perf_counter()
    vol = bricks.create(vol_cfg)
    for i in range(4):
        d = jnp.asarray(ds.get_depth(i))
        r_v2c, t_v2c, _, _ = pose_pieces(jnp.asarray(ds.get_pose(i), jnp.float32))
        vol = fuse(vol, d, r_v2c, t_v2c)
    fetch(vol.value)
    print(f"state built ({time.perf_counter()-t_all0:.1f}s incl. compiles)", flush=True)

    frame = 4
    depth = jnp.asarray(ds.get_depth(frame))
    pose = jnp.asarray(ds.get_pose(frame), jnp.float32)
    r_v2c, t_v2c, r_c2v, t_c2v = pose_pieces(pose)

    results = {}
    dev = {}
    t, prep_out = lap(prep, depth, reps=reps)
    results["preprocess+pyramids+maps"] = t
    _, vmaps_curr, nmaps_curr = prep_out
    # device_time chains through the first f32 leaf, so uint16 depth is
    # passed as f32 and cast back inside
    dev["preprocess+pyramids+maps"] = device_time(
        lambda d: prep(d.astype(jnp.uint16)), depth.astype(jnp.float32),
        scan_n=scan_n, reps=reps,
    )

    t, _ = lap(fuse_keep, vol, depth, r_v2c, t_v2c, reps=reps)
    results["fusion_rows"] = t
    dev["fusion_rows"] = device_time(
        lambda v, d, r, tt: fuse_fn(
            bricks.BrickVolume(v, vol.grad, vol.weight), d.astype(jnp.uint16), r, tt
        ),
        vol.value, depth.astype(jnp.float32), r_v2c, t_v2c,
        scan_n=scan_n, reps=reps,
    )

    t, ray_out = lap(rays_of, r_c2v, t_c2v)
    results["camera_rays"] = t
    ray_dir, ray_start = ray_out
    dev["camera_rays"] = device_time(rays_of, r_c2v, t_c2v, scan_n=scan_n, reps=reps)

    t, packed = lap(skip_pack, vol, reps=reps)
    results["skip_rows_build"] = t
    dev["skip_rows_build"] = device_time(
        lambda v: skip_pack(bricks.BrickVolume(v, vol.grad, vol.weight)),
        vol.value, scan_n=scan_n, reps=reps,
    )

    t, hit = lap(skip_march_stage, packed, ray_start, ray_dir, reps=reps)
    results["skip_march"] = t
    dev["skip_march"] = device_time(
        skip_march_stage, packed, ray_start, ray_dir, scan_n=scan_n, reps=reps
    )

    t, hit_h = lap(hier_march_stage, vol, packed, ray_start, ray_dir, reps=reps)
    results["hier_march (bench)"] = t
    dev["hier_march (bench)"] = device_time(
        lambda v, p, rs, rd: hier_march_stage(
            bricks.BrickVolume(v, vol.grad, vol.weight), p, rs, rd
        ),
        vol.value, packed, ray_start, ray_dir, scan_n=scan_n, reps=reps,
    )

    # depth anchors at model resolution (engine construction: |vmap| at
    # model_map_level)
    anchor = jnp.linalg.norm(
        jnp.nan_to_num(vmaps_curr[L], nan=jnp.inf, posinf=jnp.inf), axis=0
    )
    t, hit_t = lap(temporal_march_stage, vol, anchor, ray_start, ray_dir, reps=reps)
    results["temporal_march (bench)"] = t
    dev["temporal_march (bench)"] = device_time(
        lambda v, a, rs, rd: temporal_march_stage(
            bricks.BrickVolume(v, vol.grad, vol.weight), a, rs, rd
        ),
        vol.value, anchor, ray_start, ray_dir, scan_n=scan_n, reps=reps,
    )

    t, pair_vg = lap(pair_table_stage, vol, reps=reps)
    results["pair_table_build"] = t
    dev["pair_table_build"] = device_time(
        lambda v: pair_table_stage(bricks.BrickVolume(v, vol.grad, vol.weight)),
        vol.value, scan_n=scan_n, reps=reps,
    )

    t, maps = lap(refine_stage, vol, ray_start, ray_dir, hit.t_found, hit.t_dead, reps=reps)
    results["refine+normals+resize"] = t
    vmaps_prev, nmaps_prev = maps
    dev["refine+normals+resize"] = device_time(
        lambda v, rs, rd, hf, hd: refine_stage(
            bricks.BrickVolume(v, vol.grad, vol.weight), rs, rd, hf, hd
        ),
        vol.value, ray_start, ray_dir, hit.t_found, hit.t_dead,
        scan_n=scan_n, reps=reps,
    )

    t, _ = lap(
        refine_pair_stage, vol, ray_start, ray_dir, hit.t_found, hit.t_dead,
        pair_vg, reps=reps,
    )
    results["refine_pair (bench)"] = t
    dev["refine_pair (bench)"] = device_time(
        lambda vg, rs, rd, hf, hd: refine_pair_stage(vol, rs, rd, hf, hd, vg),
        pair_vg, ray_start, ray_dir, hit.t_found, hit.t_dead,
        scan_n=scan_n, reps=reps,
    )

    # round-5 bench default: temporal march (bracketing samples) + sample-
    # reusing refine (one pair-tap dual trilinear Newton polish) + screen
    # normals + resizes — march+refine as the engine composes them
    def temporal_reuse_fn(vol, t_anchor, rs, rd, pair_vg):
        from xslam_tpu.csfd import vec3

        read = raycast_bricks._value_reader(vol.value, res)
        hit, f0, f1 = raycast.march_temporal(
            None, t_anchor, rs, rd, vol_cfg,
            window=config.raycast_temporal_window, read_fn=read, shape=res,
            return_samples=True,
        )
        r_v2w = lift(jnp.asarray(v2w[:3, :3]))
        t_v2w = lift(jnp.asarray(v2w[:3, 3]))
        accept = hit.t_found < jnp.minimum(hit.t_dead, raycast.INF_T)

        def trilin_at(p):
            return raycast_bricks.trilinear_pair_bricks(
                pair_vg, res, vec3.comp(p, 0), vec3.comp(p, 1),
                vec3.comp(p, 2), vol_cfg.voxel_size,
            )

        vmap, nmap, v_ok, n_ok = raycast.refine_from_samples(
            trilin_at, rs, rd, hit.t_found, f0, f1, accept,
            r_v2w, t_v2w, vol_cfg,
        )
        vmap, nmap = raycast.finalize_maps(vmap, nmap, v_ok, n_ok)
        nmap = raycast.screen_normals(vmap)
        vmaps, nmaps = [vmap], [nmap]
        for i in range(1, levels):
            vmaps.append(CSFD(preprocess.resize_vmap(vmaps[-1].v),
                              preprocess.resize_vmap(vmaps[-1].g)))
            from xslam_tpu.models.kinfu import _resize_nmap_dual
            nmaps.append(_resize_nmap_dual(nmaps[-1]))
        return tuple(vmaps), tuple(nmaps)

    temporal_reuse_stage = jax.jit(temporal_reuse_fn)
    t, _ = lap(
        temporal_reuse_stage, vol, anchor, ray_start, ray_dir, pair_vg,
        reps=reps,
    )
    results["march+refine_reuse (bench r5)"] = t
    dev["march+refine_reuse (bench r5)"] = device_time(
        lambda vg, a, rs, rd: temporal_reuse_stage(vol, a, rs, rd, vg),
        pair_vg, anchor, ray_start, ray_dir, scan_n=scan_n, reps=reps,
    )

    w2c_np = np.linalg.inv(np.asarray(ds.get_pose(frame + 1))).astype(np.float32)
    t, _ = lap(
        icp_stage, jnp.asarray(w2c_np),
        tuple(vmaps_curr), tuple(nmaps_curr),
        vmaps_prev, nmaps_prev, reps=reps,
    )
    results["icp_3level_12iter"] = t
    dev["icp_3level_12iter"] = device_time(
        icp_stage, jnp.asarray(w2c_np),
        tuple(vmaps_curr), tuple(nmaps_curr), vmaps_prev, nmaps_prev,
        scan_n=scan_n, reps=reps,
    )

    total = sum(results.values())
    dtotal = sum(dev.values())
    print(
        "\n== stage times: submit-loop (device + ~1.5 ms dispatch) | "
        "chained-scan device estimate ==",
        flush=True,
    )
    for k, v in sorted(dev.items(), key=lambda kv: -kv[1]):
        print(
            f"  {k:28s} {1000*results[k]:8.1f} ms | {1000*v:8.1f} ms"
            f"   ({100*v/dtotal:4.1f}% of device sum)"
        )
    print(
        f"  {'SUM':28s} {1000*total:8.1f} ms | {1000*dtotal:8.1f} ms"
        f"   ({1000.0/(1000*dtotal):.2f} fps-equiv device)"
    )


if __name__ == "__main__":
    main()

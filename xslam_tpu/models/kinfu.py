"""The KinectFusion-style differentiable SLAM engine.

TPU-native re-design of ``KinectFusionReconstruction``
(``XKinectFusion/{include,src}/KinectFusionReconstruction.{h,cpp}``): the
whole per-frame pipeline — bilateral filtering, pyramid construction,
coarse-to-fine projective ICP (levels 2->1->0, iterations {5,4,3}), TSDF
fusion and raycasting of the model maps — runs as ONE jitted function with
the volume donated, so a frame is a single device dispatch with no mid-frame
host synchronization (the reference pays 12 device->host downloads per frame
for the ICP solves, KinectFusionReconstruction.cpp:192-225).

Dual-number (CSFD) state: poses and the TSDF volume carry derivative lanes.
Seeding a direction into the initial pose (or any parameter) propagates
first-order derivatives through tracking and mapping exactly like the
reference's complex perturbation mechanism.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..csfd.single import CSFD, lift
from ..geometry import se3
from ..geometry.intrinsics import Intrinsics
from ..io.config import SlamConfig
from ..ops import fusion, icp, preprocess, raycast


class SlamState(NamedTuple):
    """Device-side engine state (a single pytree, donated across frames)."""

    volume: fusion.VolumeState
    world2camera: CSFD  # (4, 4) dual
    # model-map pyramid from raycasting (dual, world coords)
    vmaps_prev: Tuple[CSFD, ...]
    nmaps_prev: Tuple[CSFD, ...]
    frame_idx: jnp.ndarray  # int32 scalar
    last_align_ok: jnp.ndarray  # bool scalar
    # model-resolution hit distances of the last raycast (INF where no
    # hit) — the anchors of the temporal march (raycast_march="temporal";
    # carried but unused by the other march modes)
    t_prev: jnp.ndarray = np.inf


class FrameResult(NamedTuple):
    camera2world: CSFD  # (4, 4) dual pose estimate of this frame
    align_ok: jnp.ndarray
    inlier_count: jnp.ndarray
    # brick-fusion ACTIVE list overflow this frame (always False for dense
    # fusion and for fusion_overflow="dense", which re-integrates densely)
    fusion_overflow: jnp.ndarray


class XSlamEngine:
    """Host driver: owns config + jitted step, mirrors the public API of
    ``KinectFusionReconstruction`` (SetYamlParameters/ProcessFrame/...)."""

    def __init__(self, config: SlamConfig, multichip: bool = False):
        self.config = config
        self.intr = config.intrinsics
        self.vol_cfg = fusion.VolumeConfig(
            resolution=tuple(config.tsdf_size),
            voxel_size=config.voxel_size,
            trunc_dist=config.trunc_dist,
            max_weight=config.max_integration_weight,
        )
        if config.volume_layout == "brick" and config.fusion_mode != "brick":
            raise ValueError("volume_layout='brick' requires fusion_mode='brick'")
        if config.raycast_march == "temporal" and config.volume_layout != "brick":
            raise ValueError(
                "raycast_march='temporal' requires volume_layout='brick'"
            )
        if config.raycast_refine == "reuse" and (
            config.raycast_march != "temporal" or config.raycast_normals != "screen"
        ):
            raise ValueError(
                "raycast_refine='reuse' requires raycast_march='temporal' "
                "and raycast_normals='screen'"
            )
        self.world2volume = np.asarray(config.world2volume, np.float32)
        self.pose_log: List[np.ndarray] = []  # world2camera_record analogue
        self._step = jax.jit(
            functools.partial(
                process_frame,
                config=config,
                intr=self.intr,
                vol_cfg=self.vol_cfg,
                world2volume=self.world2volume,
            ),
            donate_argnums=(0,),
        )

    def init_state(self) -> SlamState:
        H, W = self.intr.height, self.intr.width
        if self.config.volume_layout == "brick":
            from ..ops import bricks

            vol = bricks.create(self.vol_cfg)
        else:
            vol = fusion.create_volume(self.vol_cfg)
        nan_map = lambda h, w: CSFD(
            jnp.full((3, h, w), jnp.nan, jnp.float32), jnp.zeros((3, h, w), jnp.float32)
        )
        levels = self.config.num_levels
        L = self.config.model_map_level
        vmaps = tuple(nan_map(H >> (i + L), W >> (i + L)) for i in range(levels))
        nmaps = tuple(nan_map(H >> (i + L), W >> (i + L)) for i in range(levels))
        return SlamState(
            volume=vol,
            world2camera=lift(jnp.eye(4, dtype=jnp.float32)),
            vmaps_prev=vmaps,
            nmaps_prev=nmaps,
            frame_idx=jnp.int32(0),
            last_align_ok=jnp.bool_(True),
            t_prev=jnp.full((H >> L, W >> L), jnp.inf, jnp.float32),
        )

    def process_frame(
        self, state: SlamState, depth_u16: np.ndarray, gt_pose: Optional[np.ndarray] = None
    ) -> Tuple[SlamState, FrameResult]:
        """Track + fuse one frame (``ProcessFrame``,
        KinectFusionReconstruction.cpp:147-159). ``gt_pose`` (c2w) is used
        when the config sets ``use_gt_pose`` (oracle-mapping ablation)."""
        if gt_pose is None:
            gt_pose = np.eye(4, dtype=np.float32)
        state, result = self._step(
            state, jnp.asarray(depth_u16), jnp.asarray(gt_pose, np.float32)
        )
        return state, result

    def process_frames(
        self,
        state: SlamState,
        depths_u16: jnp.ndarray,
        gt_poses: Optional[np.ndarray] = None,
        unroll: bool = False,
    ) -> Tuple[SlamState, FrameResult]:
        """Track + fuse a (K, H, W) stack of frames in ONE device dispatch:
        ``lax.scan`` of the per-frame step with the SLAM state as carry.

        Same math as K :meth:`process_frame` calls — the step is a pure
        (state, depth) -> (state, result) function and scanning it changes
        only where the loop lives — but a DIFFERENT compiled program, so
        XLA's fma/fusion choices differ at the 1-ulp level and trajectories
        agree only to the usual chaotic-amplification envelope (first two
        frames bit-equal, ~5e-4 pose drift after 6 frames on the small
        workload; tests/test_e2e_slam.py). This is the production shape for
        offline mapping / benchmarking on remote or relay-attached devices,
        where each dispatch costs a host round-trip that a per-frame Python
        loop pays K times (measured ~30 ms/frame through the axon relay,
        BASELINE.md round 3). Returns the final state and a FrameResult
        pytree with a leading K axis."""
        K = depths_u16.shape[0]
        if gt_poses is None:
            gt_poses = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4))
        key = (K, unroll) + tuple(depths_u16.shape[1:])
        if not hasattr(self, "_scan_steps"):
            self._scan_steps = {}
        if key not in self._scan_steps:
            step = functools.partial(
                process_frame,
                config=self.config,
                intr=self.intr,
                vol_cfg=self.vol_cfg,
                world2volume=self.world2volume,
            )

            def run(state, depths, gts):
                def body(s, frame):
                    d, g = frame
                    s2, res = step(s, d, g)
                    return s2, res

                # unroll=K hands XLA K copies of the step body instead of a
                # while loop — same one-dispatch amortization, none of the
                # loop-context pessimization (HLO ~K× larger, compile slower)
                return jax.lax.scan(body, state, (depths, gts),
                                    unroll=K if unroll else 1)

            self._scan_steps[key] = jax.jit(run, donate_argnums=(0,))
        return self._scan_steps[key](
            state, jnp.asarray(depths_u16), jnp.asarray(gt_poses, np.float32)
        )

    def log_pose(self, result: FrameResult):
        self.pose_log.append(np.asarray(result.camera2world.v))

    def dense_volume(self, state: SlamState) -> fusion.VolumeState:
        """The volume in dense (X, Y, Z) layout regardless of the engine's
        storage layout — for extraction, export, and relocalization
        consumers that take ``VolumeState``."""
        if self.config.volume_layout == "brick":
            from ..ops import bricks

            return bricks.to_dense(state.volume, self.vol_cfg.resolution)
        return state.volume

    def export_model_maps_ply(self, state: SlamState, path: str, level: int = 0):
        """Dump the raycast model maps of ``level`` as a point cloud —
        the debugging helper ``generatePrevPC``
        (KinectFusionReconstruction.cpp:480-508)."""
        from ..io.ply import export_ply

        v = np.asarray(state.vmaps_prev[level].v)
        n = np.asarray(state.nmaps_prev[level].v)
        ok = ~np.isnan(v[0]) & ~np.isnan(n[0])
        export_ply(path, v[:, ok].T, n[:, ok].T)

    def export_current_maps_ply(self, depth_u16, path: str, level: int = 0):
        """Current-frame camera-space maps as a point cloud
        (``generateCurrPC``, KinectFusionReconstruction.cpp:449-478)."""
        import jax.numpy as jnp

        from ..io.ply import export_ply
        from ..ops import preprocess

        d = preprocess.bilateral_filter(jnp.asarray(depth_u16))
        for _ in range(level):
            d = preprocess.pyr_down(d)
        vmap = preprocess.create_vmap(self.intr.level(level), d)
        nmap = preprocess.create_nmap(vmap)
        v, n = np.asarray(vmap), np.asarray(nmap)
        ok = ~np.isnan(v[0]) & ~np.isnan(n[0])
        export_ply(path, v[:, ok].T, n[:, ok].T)


# --------------------------------------------------------------------------
def _pose_estimate(
    state: SlamState,
    vmaps_curr,
    nmaps_curr,
    config: SlamConfig,
    intr: Intrinsics,
):
    """Coarse-to-fine ICP (``PoseEstimate``,
    KinectFusionReconstruction.cpp:177-235). Returns (c2w_new, ok, inliers)."""
    c2w_prev = se3.inverse(state.world2camera)
    r_prev = se3.rotation(c2w_prev)
    t_prev = se3.translation(c2w_prev)
    r_prev_inv = se3.rotation(state.world2camera)  # R^-1 = R of world2camera

    r_curr, t_curr = r_prev, t_prev
    ok = jnp.bool_(True)
    inliers = jnp.int32(0)

    # the model maps may be rendered one or more pyramid levels coarser
    # than the depth (model_map_level): the projective association then
    # targets the model map's own intrinsics
    L = config.model_map_level

    # per-level lax.scan over iterations (identical body per level) keeps the
    # HLO ~12x smaller than unrolling the reference's {5,4,3} loop
    for level in reversed(range(config.num_levels)):
        iters = config.icp_iterations[level]
        if config.icp_fixed_assoc:
            level_assoc = icp.associate(
                r_curr, t_curr, vmaps_curr[level], r_prev_inv, t_prev,
                intr.level(level + L), state.vmaps_prev[level], state.nmaps_prev[level],
            )
        else:
            level_assoc = None

        def body(carry, _, level=level, level_assoc=level_assoc):
            r_curr, t_curr, ok = carry
            system = icp.build_system(
                r_curr, t_curr,
                vmaps_curr[level], nmaps_curr[level],
                r_prev_inv, t_prev, intr.level(level + L),
                state.vmaps_prev[level], state.nmaps_prev[level],
                config.dist_thres, config.angle_thres_sine,
                assoc=level_assoc,
            )
            x, step_ok = icp.solve_increment(system, damping=config.icp_damping)

            def comp(i):
                return CSFD(x.v[i], x.g[i])

            inc = se3.euler_xyz_increment(
                comp(0), comp(1), comp(2), comp(3), comp(4), comp(5)
            )
            r_inc = se3.rotation(inc)
            t_inc = se3.translation(inc)
            # left-multiplied incremental update
            # (KinectFusionReconstruction.cpp:219-221); frozen on failure
            t_new = se3.matvec(r_inc, t_curr) + t_inc
            r_new = se3.matmul(r_inc, r_curr)
            t_curr = CSFD(
                jnp.where(step_ok, t_new.v, t_curr.v), jnp.where(step_ok, t_new.g, t_curr.g)
            )
            r_curr = CSFD(
                jnp.where(step_ok, r_new.v, r_curr.v), jnp.where(step_ok, r_new.g, r_curr.g)
            )
            return (r_curr, t_curr, ok & step_ok), system.inlier_count

        (r_curr, t_curr, ok), level_inliers = jax.lax.scan(
            body, (r_curr, t_curr, ok), None, length=iters
        )
        inliers = level_inliers[-1]

    rows = [
        [se3.elem(r_curr, i, 0), se3.elem(r_curr, i, 1), se3.elem(r_curr, i, 2),
         jax.tree.map(lambda a: a[i], t_curr)]
        for i in range(3)
    ]
    one = lift(jnp.float32(1.0))
    zero = lift(jnp.float32(0.0))
    rows.append([zero, zero, zero, one])
    c2w = se3._stack(rows)
    return c2w, ok, inliers


def process_frame(
    state: SlamState,
    depth_u16: jnp.ndarray,
    gt_pose_c2w: jnp.ndarray,
    *,
    config: SlamConfig,
    intr: Intrinsics,
    vol_cfg: fusion.VolumeConfig,
    world2volume: np.ndarray,
) -> Tuple[SlamState, FrameResult]:
    levels = config.num_levels

    # --- SurfaceMeasure (KinectFusionReconstruction.cpp:280-299) ----------
    depth0 = preprocess.bilateral_filter(depth_u16)
    depths = [depth0]
    for i in range(1, levels):
        depths.append(preprocess.pyr_down(depths[-1]))
    vmaps_curr = [preprocess.create_vmap(intr.level(i), depths[i]) for i in range(levels)]
    nmaps_curr = [preprocess.create_nmap(v) for v in vmaps_curr]

    is_first = state.frame_idx == 0

    # --- AlignDepthToReconstruction --------------------------------------
    if config.use_gt_pose:
        c2w = lift(gt_pose_c2w)
        align_ok = jnp.bool_(True)
        inliers = jnp.int32(0)
    else:
        c2w_est, align_ok, inliers = _pose_estimate(
            state, vmaps_curr, nmaps_curr, config, intr
        )
        # frame 0 keeps the identity pose; a failed alignment keeps the
        # previous pose and skips integration (ProcessFrame:150-154)
        c2w_prev = se3.inverse(state.world2camera)
        if config.min_inlier_fraction > 0:
            # association-support gate: a solve resting on almost no valid
            # correspondences is a degenerate spin, not a pose estimate —
            # the det/NaN guard (KinectFusionReconstruction.cpp:203-210)
            # cannot see this failure class (the system stays well-
            # conditioned while sliding to a wild pose). Python-level
            # branch: the traced HLO is unchanged when the knob is 0.
            L = config.model_map_level
            npix = (intr.height >> L) * (intr.width >> L)
            align_ok = align_ok & (
                inliers >= jnp.int32(int(config.min_inlier_fraction * npix))
            )
        if config.max_translation_per_frame > 0:
            # physically-implausible motion -> same rejection semantics as
            # the det/NaN guard (see SlamConfig.max_translation_per_frame)
            delta = jnp.linalg.norm(c2w_est.v[:3, 3] - c2w_prev.v[:3, 3])
            align_ok = align_ok & (delta <= config.max_translation_per_frame)
        keep_prev = is_first | ~align_ok
        c2w = CSFD(
            jnp.where(keep_prev, c2w_prev.v, c2w_est.v),
            jnp.where(keep_prev, c2w_prev.g, c2w_est.g),
        )
        align_ok = align_ok | is_first

    w2c = se3.inverse(c2w)

    # --- IntegrateFrame (KinectFusionReconstruction.cpp:237-278) ----------
    w2v = lift(jnp.asarray(world2volume))
    c2v = se3.matmul(w2v, c2w)
    v2c = se3.inverse(c2v)
    r_v2c, t_v2c = se3.rotation(v2c), se3.translation(v2c)

    depth_m = fusion.scale_depth(depth_u16)
    do_integrate = align_ok | is_first

    if config.volume_layout == "brick":
        from ..ops import bricks as bricks_mod
        from ..ops import fusion_brick

        NB = bricks_mod.brick_grid(vol_cfg.resolution)
        NB = NB[0] * NB[1] * NB[2]

        def integrate_fn(vol):
            out, overflow = fusion_brick.integrate_rows(
                vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                bi_threshold=config.bi_interpolate_threshold,
                cap=config.fusion_brick_cap,
                classify_fine=config.fusion_classify_fine,
                classify_split=config.fusion_classify_split,
                subcell_cap=config.fusion_subcell_cap,
            )
            if config.fusion_overflow == "dense":
                # overflow recovery without leaving the brick layout: rerun
                # with cap = every brick (exactly the dense update)
                out = jax.lax.cond(
                    overflow,
                    lambda v: fusion_brick.integrate_rows(
                        v, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                        bi_threshold=config.bi_interpolate_threshold, cap=NB,
                        classify_fine=config.fusion_classify_fine,
                classify_split=config.fusion_classify_split,
                    )[0],
                    lambda v: out,
                    vol,
                )
                overflow = jnp.bool_(False)
            return out, overflow
    elif config.fusion_mode == "brick":
        from ..ops import fusion_brick

        def integrate_fn(vol):
            out, overflow = fusion_brick.integrate_brick(
                vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                bi_threshold=config.bi_interpolate_threshold,
                cap=config.fusion_brick_cap,
                classify_fine=config.fusion_classify_fine,
                classify_split=config.fusion_classify_split,
                subcell_cap=config.fusion_subcell_cap,
            )
            if config.fusion_overflow == "dense":
                # overflow recovery: redo the frame with the exact dense
                # path from the pre-frame volume — no map update is ever
                # silently dropped
                out = jax.lax.cond(
                    overflow,
                    lambda v: fusion.integrate(
                        v, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                        bi_threshold=config.bi_interpolate_threshold,
                    ),
                    lambda v: out,
                    vol,
                )
                overflow = jnp.bool_(False)
            return out, overflow
    else:

        def integrate_fn(vol):
            return (
                fusion.integrate(
                    vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                    bi_threshold=config.bi_interpolate_threshold,
                ),
                jnp.bool_(False),
            )

    volume, fusion_overflow = jax.lax.cond(
        do_integrate, integrate_fn, lambda v: (v, jnp.bool_(False)), state.volume
    )

    # --- model maps for the next frame's ICP ------------------------------
    r_c2v, t_c2v = se3.rotation(c2v), se3.translation(c2v)
    v2w = se3.inverse(w2v)
    r_v2w, t_v2w = se3.rotation(v2w), se3.translation(v2w)
    model_intr = intr.level(config.model_map_level)
    if config.volume_layout == "brick":
        from ..ops import raycast_bricks

        # fixed/skip are event-identical -> "skip"; the hier modes map to
        # the skip-anchored hierarchical marches
        brick_march = {
            "fixed": "skip", "skip": "skip",
            "hier": "hier_skip", "hier_skip": "hier_skip",
            "hier2": "hier2_skip", "hier2_skip": "hier2_skip",
            "temporal": "temporal",
        }[config.raycast_march]
        if brick_march == "temporal":
            # anchor each ray at the CURRENT depth frame's surface distance
            # (t = |backprojected vertex|, pose-free since the volume->ray
            # transform is rigid), falling back to the previous raycast's
            # hit distance where depth is invalid. Depth anchors are
            # complete wherever the sensor sees — unlike pure prev-hit
            # anchors, which erode at the pan leading edge faster than the
            # 2x2-min spread heals (measured on the realistic run: coverage
            # decayed from frame ~196 at 1.8 deg/frame until tracking
            # died). The fused map surface lies within (noise + pose error
            # + fusion smoothing) of the depth along each ray — well
            # inside the repair window. Blank/dropout frames lose depth
            # anchors everywhere -> the coverage cond takes the full
            # refresh march, which is the correct blackout behaviour.
            depth_t = jnp.linalg.norm(vmaps_curr[config.model_map_level], axis=0)
            t_anchor = jnp.where(jnp.isfinite(depth_t), depth_t, state.t_prev)
        else:
            t_anchor = None
        vmap0, nmap0, t_hit = raycast_bricks.raycast_bricks(
            volume, r_c2v, t_c2v, r_v2w, t_v2w, model_intr, vol_cfg,
            normals_mode=config.raycast_normals,
            march_mode=brick_march,
            hier_window=config.raycast_hier_window,
            packed_taps=config.raycast_packed_taps,
            skip_gran=config.raycast_skip_gran,
            compact=config.raycast_compact,
            pair_taps=config.raycast_pair_taps,
            quad_taps=config.raycast_quad_taps,
            t_anchor=t_anchor,
            temporal_window=config.raycast_temporal_window,
            temporal_min_coverage=config.raycast_temporal_min_coverage,
            return_hit=True,
            refine_mode=config.raycast_refine,
            temporal_phase1=config.raycast_temporal_phase1,
            temporal_cap_frac=config.raycast_temporal_cap_frac,
        )
    else:
        vmap0, nmap0 = raycast.raycast(
            volume, r_c2v, t_c2v, r_v2w, t_v2w, model_intr, vol_cfg,
            normals_mode=config.raycast_normals,
            march_mode=config.raycast_march,
            hier_window=config.raycast_hier_window,
            packed_taps=config.raycast_packed_taps,
            compact=config.raycast_compact,
        )
        t_hit = state.t_prev  # dense path carries the anchors untouched
    vmaps_prev = [vmap0]
    nmaps_prev = [nmap0]
    for i in range(1, levels):
        vmaps_prev.append(
            CSFD(preprocess.resize_vmap(vmaps_prev[-1].v), preprocess.resize_vmap(vmaps_prev[-1].g))
        )
        nmaps_prev.append(_resize_nmap_dual(nmaps_prev[-1]))

    new_state = SlamState(
        volume=volume,
        world2camera=w2c,
        vmaps_prev=tuple(vmaps_prev),
        nmaps_prev=tuple(nmaps_prev),
        frame_idx=state.frame_idx + config.frame_step,
        last_align_ok=align_ok,
        t_prev=t_hit,
    )
    return new_state, FrameResult(
        camera2world=c2w, align_ok=align_ok, inlier_count=inliers,
        fusion_overflow=fusion_overflow,
    )


def _resize_nmap_dual(n: CSFD) -> CSFD:
    """Dual-aware normal-map downsample: average then renormalize, chaining
    the derivative through the normalization (resizeMapKernel<true>)."""
    from ..csfd import vec3

    H, W = n.v.shape[-2:]
    oh, ow = H // 2, W // 2
    q_v = n.v[:, : oh * 2, : ow * 2].reshape(3, oh, 2, ow, 2)
    q_g = n.g[:, : oh * 2, : ow * 2].reshape(3, oh, 2, ow, 2)
    avg = CSFD(jnp.mean(q_v, axis=(2, 4)), jnp.mean(q_g, axis=(2, 4)))
    any_nan = jnp.any(jnp.isnan(q_v[0]), axis=(1, 3))
    safe = CSFD(jnp.where(any_nan[None], 1.0, avg.v), jnp.where(any_nan[None], 0.0, avg.g))
    normed = vec3.normalized(safe)
    return CSFD(
        jnp.where(any_nan[None], jnp.nan, normed.v),
        jnp.where(any_nan[None], 0.0, normed.g),
    )

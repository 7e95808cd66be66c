"""Multi-chip SLAM engine: the sharded counterpart of models.kinfu.

Composes the shard_map stages of :mod:`.sharded` into one jitted per-frame
step over a ``space`` mesh. Single-chip semantics are preserved exactly
(tested against the unsharded engine on a CPU mesh); communication is
ppermute halos + pmin/psum ray resolution + psum'd ICP systems, all over ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..csfd.single import CSFD, lift
from ..geometry import se3
from ..io.config import SlamConfig
from ..models.kinfu import FrameResult, SlamState, _resize_nmap_dual
from ..ops import fusion, icp, preprocess, raycast
from .mesh import make_space_mesh, replicated, volume_sharding
from .sharded import (
    sharded_associate,
    sharded_icp_system,
    sharded_integrate,
    sharded_integrate_rows,
    sharded_raycast,
    sharded_raycast_bricks,
)


class ShardedXSlamEngine:
    def __init__(self, config: SlamConfig, n_devices: Optional[int] = None):
        self.config = config
        self.intr = config.intrinsics
        self.mesh = make_space_mesh(n_devices)
        self.vol_cfg = fusion.VolumeConfig(
            resolution=tuple(config.tsdf_size),
            voxel_size=config.voxel_size,
            trunc_dist=config.trunc_dist,
            max_weight=config.max_integration_weight,
        )
        n = self.mesh.devices.size
        assert config.tsdf_size[0] % n == 0, "volume X must divide the mesh"
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
        if config.volume_layout == "brick":
            if config.fusion_mode != "brick":
                raise ValueError("volume_layout='brick' requires fusion_mode='brick'")
            assert (config.tsdf_size[0] // n) % 8 == 0, (
                "brick layout needs X-slabs aligned to 8-voxel bricks"
            )
            assert (self.intr.width >> config.model_map_level) % n == 0, (
                "model-map width must divide the mesh (pixel-sharded raycast)"
            )
        self.world2volume = np.asarray(config.world2volume, np.float32)
        self.pose_log = []
        self._step = jax.jit(
            functools.partial(
                _process_frame_sharded,
                config=config,
                intr=self.intr,
                vol_cfg=self.vol_cfg,
                world2volume=self.world2volume,
                mesh=self.mesh,
            ),
            donate_argnums=(0,),
        )

    def init_state(self) -> SlamState:
        H, W = self.intr.height, self.intr.width
        rep = replicated(self.mesh)
        shape = self.vol_cfg.resolution
        if self.config.volume_layout == "brick":
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..ops import bricks
            from .mesh import SPACE_AXIS

            rows = NamedSharding(self.mesh, P(SPACE_AXIS, None))
            z = bricks.create(self.vol_cfg)
            vol = bricks.BrickVolume(
                *(jax.device_put(x, rows) for x in z)
            )
        else:
            vs = volume_sharding(self.mesh)
            vol = fusion.VolumeState(
                value=jax.device_put(jnp.zeros(shape, jnp.float32), vs),
                grad=jax.device_put(jnp.zeros(shape, jnp.float32), vs),
                weight=jax.device_put(jnp.zeros(shape, jnp.float32), vs),
            )
        nan_map = lambda h, w: CSFD(
            jax.device_put(jnp.full((3, h, w), jnp.nan, jnp.float32), rep),
            jax.device_put(jnp.zeros((3, h, w), jnp.float32), rep),
        )
        levels = self.config.num_levels
        L = self.config.model_map_level
        return SlamState(
            volume=vol,
            world2camera=lift(jnp.eye(4, dtype=jnp.float32)),
            vmaps_prev=tuple(nan_map(H >> (i + L), W >> (i + L)) for i in range(levels)),
            nmaps_prev=tuple(nan_map(H >> (i + L), W >> (i + L)) for i in range(levels)),
            frame_idx=jnp.int32(0),
            last_align_ok=jnp.bool_(True),
            t_prev=jax.device_put(
                jnp.full((H >> L, W >> L), jnp.inf, jnp.float32), rep
            ),
        )

    def process_frame(self, state, depth_u16, gt_pose=None):
        if gt_pose is None:
            gt_pose = np.eye(4, dtype=np.float32)
        return self._step(state, jnp.asarray(depth_u16), jnp.asarray(gt_pose, np.float32))

    def process_frames(self, state, depths_u16, gt_poses=None):
        """(K, H, W) frame stack in ONE device dispatch — ``lax.scan`` of the
        sharded step with the SLAM state as carry, mirroring
        ``XSlamEngine.process_frames`` (models/kinfu.py)."""
        K = depths_u16.shape[0]
        if gt_poses is None:
            gt_poses = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4))
        key = (K,) + tuple(depths_u16.shape[1:])
        if not hasattr(self, "_scan_steps"):
            self._scan_steps = {}
        if key not in self._scan_steps:
            step = functools.partial(
                _process_frame_sharded,
                config=self.config,
                intr=self.intr,
                vol_cfg=self.vol_cfg,
                world2volume=self.world2volume,
                mesh=self.mesh,
            )

            def run(state, depths, gts):
                return jax.lax.scan(
                    lambda s, fr: step(s, fr[0], fr[1]), state, (depths, gts)
                )

            self._scan_steps[key] = jax.jit(run, donate_argnums=(0,))
        return self._scan_steps[key](
            state, jnp.asarray(depths_u16), jnp.asarray(gt_poses, np.float32)
        )

    def dense_volume(self, state: SlamState) -> fusion.VolumeState:
        """The volume in dense (X, Y, Z) layout regardless of storage layout
        — for extraction/export/relocalization consumers (same contract as
        ``XSlamEngine.dense_volume``). GSPMD assembles the sharded rows."""
        if self.config.volume_layout == "brick":
            from ..ops import bricks

            return bricks.to_dense(state.volume, self.vol_cfg.resolution)
        return state.volume

    def log_pose(self, result: FrameResult):
        self.pose_log.append(np.asarray(result.camera2world.v))


def _pose_estimate_sharded(state, vmaps_curr, nmaps_curr, config, intr, mesh):
    c2w_prev = se3.inverse(state.world2camera)
    r_prev = se3.rotation(c2w_prev)
    t_prev = se3.translation(c2w_prev)
    r_prev_inv = se3.rotation(state.world2camera)

    r_curr, t_curr = r_prev, t_prev
    ok = jnp.bool_(True)
    inliers = jnp.int32(0)

    # model maps may be rendered coarser than the depth (model_map_level):
    # association then targets the model map's own intrinsics — same as the
    # single-chip fast path
    L = config.model_map_level

    for level in reversed(range(config.num_levels)):
        if config.icp_fixed_assoc:
            level_assoc = sharded_associate(
                r_curr, t_curr, vmaps_curr[level], r_prev_inv, t_prev,
                intr.level(level + L),
                state.vmaps_prev[level], state.nmaps_prev[level], mesh,
            )
        else:
            level_assoc = None

        def body(carry, _, level=level, level_assoc=level_assoc):
            r_curr, t_curr, ok = carry
            system = sharded_icp_system(
                r_curr, t_curr, vmaps_curr[level], nmaps_curr[level],
                r_prev_inv, t_prev, intr.level(level + L),
                state.vmaps_prev[level], state.nmaps_prev[level],
                config.dist_thres, config.angle_thres_sine, mesh,
                assoc=level_assoc,
            )
            x, step_ok = icp.solve_increment(system, damping=config.icp_damping)
            inc = se3.euler_xyz_increment(*[CSFD(x.v[i], x.g[i]) for i in range(6)])
            r_inc, t_inc = se3.rotation(inc), se3.translation(inc)
            t_new = se3.matvec(r_inc, t_curr) + t_inc
            r_new = se3.matmul(r_inc, r_curr)
            t_curr = CSFD(jnp.where(step_ok, t_new.v, t_curr.v), jnp.where(step_ok, t_new.g, t_curr.g))
            r_curr = CSFD(jnp.where(step_ok, r_new.v, r_curr.v), jnp.where(step_ok, r_new.g, r_curr.g))
            return (r_curr, t_curr, ok & step_ok), system.inlier_count

        (r_curr, t_curr, ok), level_inliers = jax.lax.scan(
            body, (r_curr, t_curr, ok), None, length=config.icp_iterations[level]
        )
        inliers = level_inliers[-1]

    rows = [
        [se3.elem(r_curr, i, 0), se3.elem(r_curr, i, 1), se3.elem(r_curr, i, 2),
         jax.tree.map(lambda a: a[i], t_curr)]
        for i in range(3)
    ]
    one, zero = lift(jnp.float32(1.0)), lift(jnp.float32(0.0))
    rows.append([zero, zero, zero, one])
    return se3._stack(rows), ok, inliers


def _process_frame_sharded(
    state, depth_u16, gt_pose_c2w, *, config, intr, vol_cfg, world2volume, mesh
):
    levels = config.num_levels

    depth0 = preprocess.bilateral_filter(depth_u16)
    depths = [depth0]
    for i in range(1, levels):
        depths.append(preprocess.pyr_down(depths[-1]))
    vmaps_curr = [preprocess.create_vmap(intr.level(i), depths[i]) for i in range(levels)]
    nmaps_curr = [preprocess.create_nmap(v) for v in vmaps_curr]

    is_first = state.frame_idx == 0

    if config.use_gt_pose:
        c2w = lift(gt_pose_c2w)
        align_ok = jnp.bool_(True)
        inliers = jnp.int32(0)
    else:
        c2w_est, align_ok, inliers = _pose_estimate_sharded(
            state, vmaps_curr, nmaps_curr, config, intr, mesh
        )
        c2w_prev = se3.inverse(state.world2camera)
        if config.min_inlier_fraction > 0:
            # association-support gate, identical to the single-chip engine
            # (models/kinfu.py): inlier_count is already psum'd across the
            # mesh, so the global count gates against the full model-map
            # pixel budget
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
    w2v = lift(jnp.asarray(world2volume))
    c2v = se3.matmul(w2v, c2w)
    v2c = se3.inverse(c2v)

    depth_m = fusion.scale_depth(depth_u16)
    do_integrate = align_ok | is_first
    n = mesh.devices.size
    r_v2c, t_v2c = se3.rotation(v2c), se3.translation(v2c)

    if config.volume_layout == "brick":
        X, Y, Z = vol_cfg.resolution
        nb_local = (X // n // 8) * (Y // 8) * (Z // 8)
        cap = min(nb_local, max(256, config.fusion_brick_cap // n))

        def integrate_fn(vol):
            out, overflow = sharded_integrate_rows(
                vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                config.bi_interpolate_threshold, mesh, brick_cap=cap,
                classify_fine=config.fusion_classify_fine,
                classify_split=config.fusion_classify_split,
                subcell_cap=config.fusion_subcell_cap,
            )
            if config.fusion_overflow == "dense":
                # overflow recovery without leaving the brick layout: rerun
                # with cap = every local brick (exactly the dense update) —
                # same policy as the single-chip engine (models/kinfu.py)
                out = jax.lax.cond(
                    overflow,
                    lambda v: sharded_integrate_rows(
                        v, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                        config.bi_interpolate_threshold, mesh,
                        brick_cap=nb_local,
                        classify_fine=config.fusion_classify_fine,
                classify_split=config.fusion_classify_split,
                    )[0],
                    lambda v: out,
                    vol,
                )
                overflow = jnp.bool_(False)
            return out, overflow

    else:

        def integrate_fn(vol):
            return sharded_integrate(
                vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                config.bi_interpolate_threshold, mesh,
                fusion_mode=config.fusion_mode,
                brick_cap=max(256, config.fusion_brick_cap // n),
                classify_fine=config.fusion_classify_fine,
                classify_split=config.fusion_classify_split,
                subcell_cap=config.fusion_subcell_cap,
            )

    volume, fusion_overflow = jax.lax.cond(
        do_integrate, integrate_fn, lambda v: (v, jnp.bool_(False)), state.volume
    )

    v2w = se3.inverse(w2v)
    # model maps may be rendered coarser than the depth (model_map_level):
    # raycast at the model map's own intrinsics, like the single-chip engine
    model_intr = intr.level(config.model_map_level)
    t_hit = state.t_prev
    if config.volume_layout == "brick":
        # fixed/skip are event-identical -> "skip"; the hier modes map to the
        # skip-anchored hierarchical marches (same mapping as models/kinfu.py)
        brick_march = {
            "fixed": "skip", "skip": "skip",
            "hier": "hier_skip", "hier_skip": "hier_skip",
            "hier2": "hier2_skip", "hier2_skip": "hier2_skip",
            "temporal": "temporal",
        }[config.raycast_march]
        if brick_march == "temporal":
            # depth-primary anchors, prev-hit fallback — same construction
            # and rationale as the single-chip engine (models/kinfu.py)
            depth_t = jnp.linalg.norm(vmaps_curr[config.model_map_level], axis=0)
            t_anchor = jnp.where(jnp.isfinite(depth_t), depth_t, state.t_prev)
        else:
            t_anchor = None
        vmap0, nmap0, t_hit = sharded_raycast_bricks(
            volume, se3.rotation(c2v), se3.translation(c2v),
            se3.rotation(v2w), se3.translation(v2w), model_intr, vol_cfg, mesh,
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
        if config.raycast_normals == "screen":
            # the pixel-sharded stage defers screen normals (column-boundary
            # pixels need their neighbours); derive them from the assembled
            # vertex map here — GSPMD inserts the one-column halo exchange
            nmap0 = raycast.screen_normals(vmap0)
    else:
        vmap0, nmap0 = sharded_raycast(
            volume, se3.rotation(c2v), se3.translation(c2v),
            se3.rotation(v2w), se3.translation(v2w), model_intr, vol_cfg, mesh,
            normals_mode=config.raycast_normals,
        )
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

"""Frame-to-frame ICP odometry (no map).

A lightweight tracking baseline assembled from the same op set: aligns each
frame against the *previous frame's* measured maps instead of the raycast
model maps (the reference supports only frame-to-model tracking; this is the
standard ablation used to quantify the value of the fused model — and a
cheap dual-capable odometry for seeding relocalization or BA).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..csfd.single import CSFD, lift
from ..geometry import se3
from ..io.config import SlamConfig
from ..ops import icp, preprocess


class OdometryState(NamedTuple):
    world2camera: CSFD  # (4, 4) dual
    vmaps_prev: Tuple[jnp.ndarray, ...]  # real camera-space pyramids
    nmaps_prev: Tuple[jnp.ndarray, ...]
    prev_c2w: CSFD
    frame_idx: jnp.ndarray


class OdometryEngine:
    def __init__(self, config: SlamConfig):
        self.config = config
        self.intr = config.intrinsics
        self.pose_log: List[np.ndarray] = []
        self._step = jax.jit(
            functools.partial(_process_frame, config=config, intr=self.intr),
            donate_argnums=(0,),
        )

    def init_state(self) -> OdometryState:
        H, W = self.intr.height, self.intr.width
        levels = self.config.num_levels
        nan_map = lambda h, w: jnp.full((3, h, w), jnp.nan, jnp.float32)
        return OdometryState(
            world2camera=lift(jnp.eye(4, dtype=jnp.float32)),
            vmaps_prev=tuple(nan_map(H >> i, W >> i) for i in range(levels)),
            nmaps_prev=tuple(nan_map(H >> i, W >> i) for i in range(levels)),
            prev_c2w=lift(jnp.eye(4, dtype=jnp.float32)),
            frame_idx=jnp.int32(0),
        )

    def process_frame(self, state, depth_u16):
        state, res = self._step(state, jnp.asarray(depth_u16))
        return state, res

    def log_pose(self, result):
        self.pose_log.append(np.asarray(result.camera2world.v))


class OdometryResult(NamedTuple):
    camera2world: CSFD
    align_ok: jnp.ndarray
    inlier_count: jnp.ndarray


def _process_frame(state: OdometryState, depth_u16, *, config: SlamConfig, intr):
    levels = config.num_levels
    depth0 = preprocess.bilateral_filter(depth_u16)
    depths = [depth0]
    for i in range(1, levels):
        depths.append(preprocess.pyr_down(depths[-1]))
    vmaps = [preprocess.create_vmap(intr.level(i), depths[i]) for i in range(levels)]
    nmaps = [preprocess.create_nmap(v) for v in vmaps]

    is_first = state.frame_idx == 0
    c2w_prev = se3.inverse(state.world2camera)
    r_prev = se3.rotation(c2w_prev)
    t_prev = se3.translation(c2w_prev)
    r_prev_inv = se3.rotation(state.world2camera)

    # previous-frame maps in world coordinates (dual: chained through the
    # previous pose estimate)
    prev_R = se3.rotation(state.prev_c2w)
    prev_t = se3.translation(state.prev_c2w)

    r_curr, t_curr = r_prev, t_prev
    ok = jnp.bool_(True)
    inliers = jnp.int32(0)

    for level in reversed(range(levels)):

        def body(carry, _, level=level):
            r_curr, t_curr, ok = carry
            vprev_w = se3.matvec(prev_R, lift(state.vmaps_prev[level])) + CSFD(
                prev_t.v[:, None, None], prev_t.g[:, None, None]
            )
            nprev_w = se3.matvec(prev_R, lift(state.nmaps_prev[level]))
            system = icp.build_system(
                r_curr, t_curr, vmaps[level], nmaps[level],
                r_prev_inv, t_prev, intr.level(level), vprev_w, nprev_w,
                config.dist_thres, config.angle_thres_sine,
            )
            x, step_ok = icp.solve_increment(system, damping=config.icp_damping)
            inc = se3.euler_xyz_increment(*[CSFD(x.v[i], x.g[i]) for i in range(6)])
            r_inc, t_inc = se3.rotation(inc), se3.translation(inc)
            t_new = se3.matvec(r_inc, t_curr) + t_inc
            r_new = se3.matmul(r_inc, r_curr)
            t_curr = CSFD(jnp.where(step_ok, t_new.v, t_curr.v), jnp.where(step_ok, t_new.g, t_curr.g))
            r_curr = CSFD(jnp.where(step_ok, r_new.v, r_curr.v), jnp.where(step_ok, r_new.g, r_curr.g))
            return (r_curr, t_curr, ok & step_ok), system.inlier_count

        (r_curr, t_curr, ok), li = jax.lax.scan(
            body, (r_curr, t_curr, ok), None, length=config.icp_iterations[level]
        )
        inliers = li[-1]

    rows = [
        [se3.elem(r_curr, i, 0), se3.elem(r_curr, i, 1), se3.elem(r_curr, i, 2),
         jax.tree.map(lambda a: a[i], t_curr)]
        for i in range(3)
    ]
    one, zero = lift(jnp.float32(1.0)), lift(jnp.float32(0.0))
    rows.append([zero, zero, zero, one])
    c2w_est = se3._stack(rows)

    keep_prev = is_first | ~ok
    c2w = CSFD(
        jnp.where(keep_prev, c2w_prev.v, c2w_est.v),
        jnp.where(keep_prev, c2w_prev.g, c2w_est.g),
    )
    new_state = OdometryState(
        world2camera=se3.inverse(c2w),
        vmaps_prev=tuple(vmaps),
        nmaps_prev=tuple(nmaps),
        prev_c2w=c2w,
        frame_idx=state.frame_idx + 1,
    )
    return new_state, OdometryResult(
        camera2world=c2w, align_ok=ok | is_first, inlier_count=inliers
    )

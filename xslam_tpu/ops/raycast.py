"""TSDF raycasting: render the model vertex/normal maps from a camera pose.

TPU-native re-design of ``XKinectFusion/src/RayCaster.cu``. The per-pixel
while-march becomes a fixed-trip ``lax.fori_loop`` over march steps with
per-pixel ``found``/``dead`` predication (all pixels step in lockstep; the
march itself only gathers the *value* plane — the dual refinement runs once
after the loop, so the expensive 8-tap dual trilinear interpolation
(RayCaster.cu:100-141) happens O(1) times per pixel instead of per step).

March parameters mirror the reference: step = 0.8 * trunc_dist
(RayCaster.cu:350), fixed range [0.2, 5.0] m (RayCaster.cu:222-223), secant
zero-crossing refinement ``Ts = t - step * Ft/(Ftdt - Ft)`` (RayCaster.cu:258-261),
central-difference normals at +-half voxel (RayCaster.cu:272-297).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..csfd import vec3
from ..csfd.single import CSFD, lift, where
from ..geometry.intrinsics import Intrinsics
from .fusion import VolumeConfig, VolumeState
from .sampling import gather3d, trilinear_tsdf

RAY_MIN_M = 0.2
RAY_MAX_M = 5.0


def _read_tsdf_value(value: jnp.ndarray, gx, gy, gz) -> jnp.ndarray:
    """Nearest-voxel value read with the +1e-5 bias (RayCaster.cu:69-78)."""
    return gather3d(value, gx, gy, gz) + 1e-5


def raycast(
    vol: VolumeState,
    r_c2v: CSFD,
    t_c2v: CSFD,
    r_v2w: CSFD,
    t_v2w: CSFD,
    intr: Intrinsics,
    cfg: VolumeConfig,
) -> Tuple[CSFD, CSFD]:
    """Render dual (3, H, W) vertex and normal maps in world coordinates.

    ``r_c2v``/``t_c2v``: camera->volume pose (dual); ``r_v2w``/``t_v2w``:
    volume->world (dual). NaN value lanes mark missed rays, matching the
    qnan sentinels the downstream ICP checks (ICP.cu:203, 223).
    """
    H, W = intr.height, intr.width
    X, Y, Z = vol.value.shape
    voxel = cfg.voxel_size
    step = cfg.trunc_dist * 0.8
    n_steps = int((RAY_MAX_M - RAY_MIN_M) / step) + 1

    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    # get_ray_next (RayCaster.cu:56-62)
    rx = jnp.broadcast_to((u - intr.cx) / intr.fx, (H, W))
    ry = jnp.broadcast_to((v - intr.cy) / intr.fy, (H, W))
    ray_next_cam = vec3.vec3(lift(rx), lift(ry), lift(jnp.ones((H, W), jnp.float32)))

    ray_dir = vec3.normalized(vec3.matvec(r_c2v, ray_next_cam))
    # degenerate-direction guard (RayCaster.cu:211-213)
    dir_v = jnp.where(ray_dir.v == 0.0, 1e-15, ray_dir.v)
    ray_dir = CSFD(dir_v, ray_dir.g)
    ray_start = t_c2v  # (3,) dual

    start_v = ray_start.v[:, None, None]
    dirs_v = ray_dir.v  # (3, H, W)

    def voxel_of(p):
        return jnp.floor(p / voxel).astype(jnp.int32)

    def in_bounds(g):
        return (
            (g[0] >= 0) & (g[0] < X) & (g[1] >= 0) & (g[1] < Y) & (g[2] >= 0) & (g[2] < Z)
        )

    # initial read at clamped entry voxel (RayCaster.cu:226-231)
    p0 = start_v + dirs_v * RAY_MIN_M
    g0 = voxel_of(p0)
    g0c = jnp.stack(
        [
            jnp.clip(g0[0], 0, X - 1),
            jnp.clip(g0[1], 0, Y - 1),
            jnp.clip(g0[2], 0, Z - 1),
        ]
    )
    tsdf0 = _read_tsdf_value(vol.value, g0c[0], g0c[1], g0c[2])

    # ---- march loop: value-plane reads only ------------------------------
    def body(k, carry):
        prev_tsdf, found, dead, t_found = carry
        t_next = RAY_MIN_M + (k + 1).astype(jnp.float32) * step
        p = start_v + dirs_v * t_next
        g = voxel_of(p)
        inside = in_bounds(g)
        tsdf = _read_tsdf_value(vol.value, g[0], g[1], g[2])

        active = ~found & ~dead
        newly_dead = active & (~inside | ((prev_tsdf < 0.0) & (tsdf > 0.0)))
        crossing = active & inside & (prev_tsdf > 0.0) & (tsdf < 0.0)

        t_curr = RAY_MIN_M + k.astype(jnp.float32) * step
        t_found = jnp.where(crossing, t_curr, t_found)
        found = found | crossing
        dead = dead | newly_dead
        return (tsdf, found, dead, t_found)

    zeros = jnp.zeros((H, W), jnp.float32)
    falses = jnp.zeros((H, W), bool)
    _, found, _, t_found = jax.lax.fori_loop(
        0, n_steps, body, (tsdf0, falses, falses, zeros)
    )

    # ---- one-shot dual secant refinement (RayCaster.cu:247-261) ----------
    def point_at(t: CSFD) -> CSFD:
        return vec3.vec3(
            vec3.comp(ray_start, 0) + vec3.comp(ray_dir, 0) * t,
            vec3.comp(ray_start, 1) + vec3.comp(ray_dir, 1) * t,
            vec3.comp(ray_start, 2) + vec3.comp(ray_dir, 2) * t,
        )

    def trilin_at(p: CSFD) -> CSFD:
        return trilinear_tsdf(
            vol.value, vol.grad, vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2), voxel
        )

    t_dual = lift(t_found)
    ft = trilin_at(point_at(t_dual))
    ftdt = trilin_at(point_at(t_dual + step))
    ok = (
        found
        & ~jnp.isnan(ft.v)
        & ~jnp.isnan(ftdt.v)
        & (ft.v >= 0.0)
        & (ftdt.v <= 0.0)
        & (ftdt.v != ft.v)
    )
    coef = ft / CSFD(jnp.where(ok, (ftdt - ft).v, 1.0), jnp.where(ok, (ftdt - ft).g, 0.0))
    ts = t_dual - coef * step

    vertex = point_at(ts)  # volume coords, dual
    vertex_w = vec3.matvec(r_v2w, vertex) + CSFD(t_v2w.v[:, None, None], t_v2w.g[:, None, None])

    nan = jnp.float32(jnp.nan)
    vmap_out = CSFD(
        jnp.where(ok[None], vertex_w.v, nan), jnp.where(ok[None], vertex_w.g, 0.0)
    )

    # ---- central-difference normals (RayCaster.cu:269-304) ---------------
    gv = voxel_of(vertex.v)
    n_ok = ok & jnp.all((gv > 1) & (gv < jnp.array([X, Y, Z])[:, None, None] - 2), axis=0)
    half = voxel * 0.5

    def shifted(axis, sign):
        comps = [vec3.comp(vertex, i) for i in range(3)]
        comps[axis] = comps[axis] + sign * half
        return trilin_at(vec3.vec3(*comps))

    n = vec3.vec3(
        shifted(0, +1) - shifted(0, -1),
        shifted(1, +1) - shifted(1, -1),
        shifted(2, +1) - shifted(2, -1),
    )
    nsq = vec3.squarednorm(n)
    n_ok = n_ok & (nsq.v > 0.0) & ~jnp.isnan(nsq.v)
    safe_n = CSFD(jnp.where(n_ok[None], n.v, 1.0), jnp.where(n_ok[None], n.g, 0.0))
    n_g = vec3.matvec(r_v2w, vec3.normalized(safe_n))
    nmap_out = CSFD(jnp.where(n_ok[None], n_g.v, nan), jnp.where(n_ok[None], n_g.g, 0.0))

    return vmap_out, nmap_out

"""TSDF raycasting: render the model vertex/normal maps from a camera pose.

TPU-native re-design of ``XKinectFusion/src/RayCaster.cu``. The per-pixel
while-march becomes a fixed-trip ``lax.fori_loop`` over march steps with
per-pixel ``found``/``dead`` predication (all pixels step in lockstep; the
march only gathers the *value* plane — the expensive 8-tap dual trilinear
refinement (RayCaster.cu:100-141) runs once per pixel after the loop, not
per step).

March parameters mirror the reference: step = 0.8 * trunc_dist
(RayCaster.cu:350), fixed range [0.2, 5.0] m (RayCaster.cu:222-223), secant
zero-crossing refinement ``Ts = t - step * Ft/(Ftdt - Ft)`` (RayCaster.cu:258-261),
central-difference normals at +-half voxel (RayCaster.cu:269-304).

Sharded operation (multi-chip): the volume may be an X-slab (core plus halo
rows) of a larger volume. ``ShardSpec`` carries the slab's global placement;
a shard claims only zero-crossings whose current sample voxel lies in its
core rows, so each global crossing/death event has exactly one owner and
cross-shard reduction is a min over event times (see
:mod:`xslam_tpu.parallel.sharded`). With the default spec this degenerates
to the single-chip path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..csfd import vec3
from ..csfd.single import CSFD, lift
from ..geometry.intrinsics import Intrinsics
from .fusion import VolumeConfig, VolumeState
from .sampling import gather3d, pack_vg_yz, trilinear_tsdf_packed

RAY_MIN_M = 0.2
RAY_MAX_M = 5.0
INF_T = 1e9


@dataclass(frozen=True)
class ShardSpec:
    """Global placement of a local X-slab: rows [x_base, x_base+local_x) of a
    volume with x_total rows; the shard owns core rows
    [core_start, core_end) (global indices)."""

    x_base: int = 0
    x_total: Optional[int] = None  # None -> local extent is the whole volume
    core_start: int = 0
    core_end: Optional[int] = None


class RaycastHit(NamedTuple):
    """Per-pixel march outcome prior to refinement (shard-combinable)."""

    t_found: jnp.ndarray  # (H, W) first-crossing march time, INF_T if none
    t_dead: jnp.ndarray  # (H, W) first death (neg->pos or volume exit) time


def _resolve(spec: ShardSpec, local_shape) -> Tuple[int, int, int, int]:
    x_total = spec.x_total if spec.x_total is not None else local_shape[0]
    core_end = spec.core_end if spec.core_end is not None else x_total
    return spec.x_base, x_total, spec.core_start, core_end


def trilinear_tsdf_shard(
    value: jnp.ndarray,
    grad: jnp.ndarray,
    px: CSFD,
    py: CSFD,
    pz: CSFD,
    voxel_size: float,
    spec: ShardSpec = ShardSpec(),
) -> CSFD:
    """Dual trilinear TSDF interpolation at metric points (global coords),
    reading from a local slab. Out-of-(global)-bounds -> NaN value.

    Same cell-selection rule as the reference (shift base cell when the
    point is below the voxel centre, RayCaster.cu:117-122) with the +1e-5
    bias of ``readTsdf`` (RayCaster.cu:77)."""
    Xl, Y, Z = value.shape
    x_base, x_total, _, _ = _resolve(spec, value.shape)
    inv_vs = 1.0 / voxel_size

    gx = jnp.floor(px.v * inv_vs).astype(jnp.int32)
    gy = jnp.floor(py.v * inv_vs).astype(jnp.int32)
    gz = jnp.floor(pz.v * inv_vs).astype(jnp.int32)
    ok = (
        (gx > 0) & (gx < x_total - 1) & (gy > 0) & (gy < Y - 1) & (gz > 0) & (gz < Z - 1)
    )

    gx = gx - (px.v < (gx.astype(jnp.float32) + 0.5) * voxel_size)
    gy = gy - (py.v < (gy.astype(jnp.float32) + 0.5) * voxel_size)
    gz = gz - (pz.v < (gz.astype(jnp.float32) + 0.5) * voxel_size)

    a0 = px * inv_vs - (gx.astype(jnp.float32) + 0.5)
    b0 = py * inv_vs - (gy.astype(jnp.float32) + 0.5)
    c0 = pz * inv_vs - (gz.astype(jnp.float32) + 0.5)
    one = lift(1.0, like=a0)
    a1, b1, c1 = one - a0, one - b0, one - c0

    lx = gx - x_base

    def tap(dx, dy, dz) -> CSFD:
        ix, iy, iz = lx + dx, gy + dy, gz + dz
        return CSFD(gather3d(value, ix, iy, iz) + 1e-5, gather3d(grad, ix, iy, iz))

    res = (
        tap(0, 0, 0) * (a1 * b1 * c1)
        + tap(0, 0, 1) * (a1 * b1 * c0)
        + tap(0, 1, 0) * (a1 * b0 * c1)
        + tap(0, 1, 1) * (a1 * b0 * c0)
        + tap(1, 0, 0) * (a0 * b1 * c1)
        + tap(1, 0, 1) * (a0 * b1 * c0)
        + tap(1, 1, 0) * (a0 * b0 * c1)
        + tap(1, 1, 1) * (a0 * b0 * c0)
    )
    nan = jnp.float32(jnp.nan)
    return CSFD(jnp.where(ok, res.v, nan), jnp.where(ok, res.g, 0.0))


def _camera_rays(r_c2v: CSFD, t_c2v: CSFD, intr: Intrinsics) -> Tuple[CSFD, CSFD]:
    H, W = intr.height, intr.width
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    rx = jnp.broadcast_to((u - intr.cx) / intr.fx, (H, W))
    ry = jnp.broadcast_to((v - intr.cy) / intr.fy, (H, W))
    ray_next_cam = vec3.vec3(lift(rx), lift(ry), lift(jnp.ones((H, W), jnp.float32)))
    ray_dir = vec3.normalized(vec3.matvec(r_c2v, ray_next_cam))
    dir_v = jnp.where(ray_dir.v == 0.0, 1e-15, ray_dir.v)  # RayCaster.cu:211-213
    return CSFD(dir_v, ray_dir.g), t_c2v


def march(
    value: jnp.ndarray,
    ray_start: CSFD,
    ray_dir: CSFD,
    cfg: VolumeConfig,
    spec: ShardSpec = ShardSpec(),
) -> RaycastHit:
    """Lockstep fixed-trip ray march over the value plane
    (RayCaster.cu:226-247). Records the first crossing and first death times
    for events whose current sample voxel is in this shard's core."""
    Xl, Y, Z = value.shape
    x_base, x_total, core0, core1 = _resolve(spec, value.shape)
    voxel = cfg.voxel_size
    step = cfg.trunc_dist * 0.8
    n_steps = int((RAY_MAX_M - RAY_MIN_M) / step) + 1

    start_v = ray_start.v[:, None, None]
    dirs_v = ray_dir.v
    H, W = dirs_v.shape[-2:]

    def voxel_of(p):
        return jnp.floor(p / voxel).astype(jnp.int32)

    def read_local(g):
        return gather3d(value, g[0] - x_base, g[1], g[2]) + 1e-5

    def in_global(g):
        return (
            (g[0] >= 0) & (g[0] < x_total) & (g[1] >= 0) & (g[1] < Y)
            & (g[2] >= 0) & (g[2] < Z)
        )

    def owned(g):
        return (g[0] >= core0) & (g[0] < core1)

    p0 = start_v + dirs_v * RAY_MIN_M
    g0 = voxel_of(p0)
    g0c = jnp.stack(
        [jnp.clip(g0[0], 0, x_total - 1), jnp.clip(g0[1], 0, Y - 1), jnp.clip(g0[2], 0, Z - 1)]
    )
    tsdf0 = read_local(g0c)

    inf = jnp.full((H, W), INF_T, jnp.float32)

    def body(k, carry):
        prev_tsdf, t_found, t_dead = carry
        t_next = RAY_MIN_M + (k + 1).astype(jnp.float32) * step
        p = start_v + dirs_v * t_next
        g = voxel_of(p)
        inside = in_global(g)
        own = owned(g)
        tsdf = read_local(g)

        t_curr = RAY_MIN_M + k.astype(jnp.float32) * step
        # death: out-of-volume exit — global geometry, every shard agrees —
        # or a neg->pos transition owned by this shard's core
        death = (~inside) | (own & inside & (prev_tsdf < 0.0) & (tsdf > 0.0))
        crossing = own & inside & (prev_tsdf > 0.0) & (tsdf < 0.0)

        t_found = jnp.where(crossing & (t_curr < t_found), t_curr, t_found)
        t_dead = jnp.where(death & (t_curr < t_dead), t_curr, t_dead)
        return (tsdf, t_found, t_dead)

    _, t_found, t_dead = jax.lax.fori_loop(0, n_steps, body, (tsdf0, inf, inf))
    return RaycastHit(t_found=t_found, t_dead=t_dead)


BRICK = 8  # voxels per empty-space-skip brick edge
DIST_CAP = 5  # brick-distance field saturation


def brick_distance_field(value: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Per-brick L-inf distance (capped) to the nearest brick that can host a
    march event (a brick containing an observed negative voxel), dilated so
    any event's previous sample also lies in the zero-distance zone.

    This is the raycaster's empty-space-skipping acceleration structure —
    the TPU answer to the reference's brute-force fixed stepping: rays
    sphere-trace through free space in O(1) brick jumps. Cost: a handful of
    elementwise passes over the volume + (X/8)^3-sized dilations per frame.
    """
    X, Y, Z = value.shape
    neg = (value < 0.0) & (weight > 0.0)
    bricks = neg.reshape(X // BRICK, BRICK, Y // BRICK, BRICK, Z // BRICK, BRICK)
    interesting = jnp.any(bricks, axis=(1, 3, 5))

    def dilate(m):
        for ax in range(3):
            m = m | jnp.roll(m, 1, ax) | jnp.roll(m, -1, ax)
        return m

    # one dilation covers the <= 1-brick reach of an event's prev sample
    m = dilate(interesting)
    dist = jnp.where(m, 0, DIST_CAP).astype(jnp.int32)
    cur = m
    for k in range(1, DIST_CAP):
        cur = dilate(cur)
        dist = jnp.minimum(dist, jnp.where(cur, k, DIST_CAP))
    return dist


JUMP_BASE = 1000.0  # sentinel offset encoding brick-jump distances


def skip_volume(value: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Pack the brick distance field into the value volume: voxels in bricks
    at L-inf brick-distance >= 2 from any event-capable brick store
    ``JUMP_BASE + dist`` (their true TSDF values can never be read by a
    correct march — no event's sample lands there), everything else stores
    the real value. One gather then serves both the skip decision and the
    sample."""
    dist = brick_distance_field(value, weight)
    dist_vox = jnp.repeat(
        jnp.repeat(jnp.repeat(dist, BRICK, 0), BRICK, 1), BRICK, 2
    ).astype(jnp.float32)
    return jnp.where(dist_vox >= 2.0, JUMP_BASE + dist_vox, value)


def march_skip(
    value: jnp.ndarray,
    weight: jnp.ndarray,
    ray_start: CSFD,
    ray_dir: CSFD,
    cfg: VolumeConfig,
    packed_read=None,
    shape=None,
    own_fn=None,
    jump_unit: int = BRICK,
) -> RaycastHit:
    """Empty-space-skipping march (single-chip): identical event semantics to
    :func:`march` — in skip regions all TSDF values are non-negative, so the
    virtual skipped samples can never produce a crossing or a sign-death, and
    a sentinel positive ``prev`` preserves the event conditions exactly.
    Dynamic trip count via ``lax.while_loop`` (the per-ray early-out the
    CUDA reference gets from its ``break``); one gather per step from the
    jump-packed volume.

    ``packed_read``/``shape`` inject an alternative jump-packed volume
    reader (g -> biased values) — used by the brick-major layout
    (:mod:`xslam_tpu.ops.raycast_bricks`) so both layouts share these exact
    event semantics. ``own_fn`` (g -> bool) restricts claimed sign events to
    voxels owned by this shard (exit-deaths stay global — every shard
    agrees on them); see :mod:`xslam_tpu.parallel.sharded`. ``jump_unit``
    (voxels) is the cell edge the packed distances were computed at (8 =
    brick, 4 = sub-brick, ops/bricks.py::skip_rows4).

    The march tracks an INTEGER step counter and quantizes jumps DOWN to
    whole steps, so every evaluated sample lands exactly on the fixed
    march's grid ``t = RAY_MIN + k*step`` — events are bit-identical to
    :func:`march` (an un-quantized metric jump would de-phase the sample
    grid after the first jump and shift crossing times by sub-step
    amounts)."""
    if packed_read is None:
        X, Y, Z = value.shape
        packed = skip_volume(value, weight)

        def packed_read(g):
            return gather3d(packed, g[0], g[1], g[2]) + 1e-5
    else:
        X, Y, Z = shape
    voxel = cfg.voxel_size
    step = cfg.trunc_dist * 0.8
    # steps skipped per unit of packed distance: floor keeps every landing
    # on-grid and strictly inside the safe (d-1)-cell L-inf bound
    steps_per_cell = jump_unit * voxel / step
    n_steps = int((RAY_MAX_M - RAY_MIN_M) / step) + 1  # march()'s sample set

    start_v = ray_start.v[:, None, None]
    dirs_v = ray_dir.v
    H, W = dirs_v.shape[-2:]

    read_packed = packed_read

    def in_global(g):
        return (
            (g[0] >= 0) & (g[0] < X) & (g[1] >= 0) & (g[1] < Y) & (g[2] >= 0) & (g[2] < Z)
        )

    # initial clamped read at entry (RayCaster.cu:226-231)
    p0 = start_v + dirs_v * RAY_MIN_M
    g0 = jnp.floor(p0 / voxel).astype(jnp.int32)
    g0c = jnp.stack(
        [jnp.clip(g0[0], 0, X - 1), jnp.clip(g0[1], 0, Y - 1), jnp.clip(g0[2], 0, Z - 1)]
    )
    prev0 = jnp.minimum(read_packed(g0c), 1.0)  # packed cells read as free space

    inf = jnp.full((H, W), INF_T, jnp.float32)
    k0 = jnp.zeros((H, W), jnp.int32)
    done0 = jnp.zeros((H, W), bool)

    def cond(carry):
        k, prev, t_found, t_dead, done = carry
        return jnp.any(~done)

    def body(carry):
        k, prev, t_found, t_dead, done = carry
        kf = k.astype(jnp.float32)
        t_next = RAY_MIN_M + (kf + 1.0) * step  # march()'s exact grid
        p = start_v + dirs_v * t_next
        g = jnp.floor(p / voxel).astype(jnp.int32)
        inside = in_global(g)

        c = read_packed(g)
        is_jump = c >= JUMP_BASE - 0.5
        d = c - JUMP_BASE
        can_jump = inside & is_jump & ~done
        tsdf = c  # true value wherever is_jump is False

        active = ~done
        fine = active & ~can_jump
        own = own_fn(g) if own_fn is not None else True
        death = fine & (~inside | (own & (prev < 0.0) & (tsdf > 0.0) & inside))
        crossing = fine & inside & own & (prev > 0.0) & (tsdf < 0.0)

        t_curr = RAY_MIN_M + kf * step
        t_found = jnp.where(crossing, t_curr, t_found)
        t_dead = jnp.where(death, t_curr, t_dead)
        done = done | crossing | death | (k + 1 >= n_steps)

        n_jump = jnp.maximum(
            1, jnp.floor((d - 1.0) * steps_per_cell).astype(jnp.int32)
        )
        k_new = jnp.where(can_jump, k + n_jump, k + 1)
        prev_new = jnp.where(can_jump, 1.0, tsdf)
        return (k_new, prev_new, t_found, t_dead, done)

    _, _, t_found, t_dead, _ = jax.lax.while_loop(
        cond, body, (k0, prev0, inf, inf, done0)
    )
    return RaycastHit(t_found=t_found, t_dead=t_dead)


# compaction schedule for march_skip_compact: (steps, capacity fraction of
# the ray count) per phase. Sized from the measured per-ray iteration
# distribution of the bench scene at 4^3 skip granularity (BASELINE.md:
# alive fractions after {20, 32, 44} iterations = {0.59, 0.18, 0.015});
# capacities carry 1.3-8x margin, and the final exact sweep makes ANY
# schedule correct — a bad schedule only costs speed.
COMPACT_PHASES = ((20, 1.0), (12, 0.75), (12, 0.375), (12, 0.125))


def march_skip_compact(
    value: jnp.ndarray,
    weight: jnp.ndarray,
    ray_start: CSFD,
    ray_dir: CSFD,
    cfg: VolumeConfig,
    packed_read=None,
    shape=None,
    own_fn=None,
    jump_unit: int = BRICK,
    phases=COMPACT_PHASES,
) -> RaycastHit:
    """:func:`march_skip` with survivor compaction — bit-identical events,
    ~1.7x fewer gather issues on the bench scene.

    The lockstep ``while_loop`` march pays (max ray path length) x (all
    rays) gathers because finished rays keep issuing dummy gathers until the
    slowest grazing ray exits (measured: mean 24 vs max 53 iterations at
    gran 4, BASELINE.md). Here the march runs in fixed-step phases; between
    phases the not-done rays are compacted (``jnp.nonzero`` with a static
    capacity) so later phases gather only for survivors. Every ray's state
    ``(k, prev, done, t_found, t_dead)`` is self-contained — the integer
    step counter pins each ray to the fixed march's exact sample grid
    regardless of which batch it marches in — so compaction cannot change
    events. A final full-width ``while_loop`` sweep finishes any rays the
    static capacities could not hold (normally zero iterations), making the
    result exact for EVERY schedule and scene."""
    if packed_read is None:
        X, Y, Z = value.shape
        packed = skip_volume(value, weight)

        def packed_read(g):
            return gather3d(packed, g[0], g[1], g[2]) + 1e-5
    else:
        X, Y, Z = shape
    voxel = cfg.voxel_size
    step = cfg.trunc_dist * 0.8
    steps_per_cell = jump_unit * voxel / step
    n_steps = int((RAY_MAX_M - RAY_MIN_M) / step) + 1

    dirs_v = ray_dir.v
    H, W = dirs_v.shape[-2:]
    N = H * W
    dirs_f = dirs_v.reshape(3, N)
    start_f = ray_start.v[:, None]  # (3, 1)
    read_packed = packed_read

    def in_global(g):
        return (
            (g[0] >= 0) & (g[0] < X) & (g[1] >= 0) & (g[1] < Y)
            & (g[2] >= 0) & (g[2] < Z)
        )

    def step_once(state, dirs):
        """One exact march step on flat per-ray state (march_skip's body)."""
        k, prev, done, t_found, t_dead = state
        kf = k.astype(jnp.float32)
        t_next = RAY_MIN_M + (kf + 1.0) * step
        p = start_f + dirs * t_next
        g = jnp.floor(p / voxel).astype(jnp.int32)
        inside = in_global(g)

        c = read_packed(g)
        is_jump = c >= JUMP_BASE - 0.5
        d = c - JUMP_BASE
        can_jump = inside & is_jump & ~done
        tsdf = c

        fine = ~done & ~can_jump
        own = own_fn(g) if own_fn is not None else True
        death = fine & (~inside | (own & (prev < 0.0) & (tsdf > 0.0) & inside))
        crossing = fine & inside & own & (prev > 0.0) & (tsdf < 0.0)

        t_curr = RAY_MIN_M + kf * step
        t_found = jnp.where(crossing, t_curr, t_found)
        t_dead = jnp.where(death, t_curr, t_dead)
        done = done | crossing | death | (k + 1 >= n_steps)

        n_jump = jnp.maximum(
            1, jnp.floor((d - 1.0) * steps_per_cell).astype(jnp.int32)
        )
        k_new = jnp.where(can_jump, k + n_jump, k + 1)
        prev_new = jnp.where(can_jump, 1.0, tsdf)
        return (k_new, prev_new, done, t_found, t_dead)

    # initial clamped read at entry (RayCaster.cu:226-231)
    p0 = start_f + dirs_f * RAY_MIN_M
    g0 = jnp.floor(p0 / voxel).astype(jnp.int32)
    g0c = jnp.stack(
        [jnp.clip(g0[0], 0, X - 1), jnp.clip(g0[1], 0, Y - 1), jnp.clip(g0[2], 0, Z - 1)]
    )
    prev0 = jnp.minimum(read_packed(g0c), 1.0)

    # padded (N+1) global state; index N is a permanently-done sentinel that
    # absorbs the fill slots of under-full compactions
    def pad1(a, v):
        return jnp.concatenate([a, jnp.full((1,), v, a.dtype)])

    state = (
        pad1(jnp.zeros(N, jnp.int32), 0),
        pad1(prev0, 1.0),
        pad1(jnp.zeros(N, bool), True),
        pad1(jnp.full(N, INF_T, jnp.float32), INF_T),
        pad1(jnp.full(N, INF_T, jnp.float32), INF_T),
    )
    dirs_p = jnp.concatenate([dirs_f, jnp.ones((3, 1), dirs_f.dtype)], axis=1)

    for steps_i, frac in phases:
        if frac >= 1.0:
            sel = None
            sub = tuple(a[:N] for a in state)
            sdirs = dirs_f
        else:
            cap = max(1, int(round(N * frac)))
            (sel,) = jnp.nonzero(~state[2][:N], size=cap, fill_value=N)
            sub = tuple(a[sel] for a in state)
            sdirs = dirs_p[:, sel]
        sub = jax.lax.fori_loop(
            0, steps_i, lambda _, s: step_once(s, sdirs), sub
        )
        if sel is None:
            state = tuple(a.at[:N].set(o) for a, o in zip(state, sub))
        else:
            # duplicate fill indices all target the sentinel slot with
            # identical values; writes at N land in-bounds and are ignored
            state = tuple(a.at[sel].set(o) for a, o in zip(state, sub))

    # exact full-width sweep for anything the capacities missed (normally
    # zero body iterations: the cond costs one reduction)
    full = tuple(a[:N] for a in state)

    def cond(s):
        return jnp.any(~s[2])

    full = jax.lax.while_loop(cond, lambda s: step_once(s, dirs_f), full)
    _, _, _, t_found, t_dead = full
    return RaycastHit(
        t_found=t_found.reshape(H, W), t_dead=t_dead.reshape(H, W)
    )


def march_hier(
    value: jnp.ndarray,
    ray_start: CSFD,
    ray_dir: CSFD,
    cfg: VolumeConfig,
    window: int = 12,
    weight: Optional[jnp.ndarray] = None,
) -> RaycastHit:
    """Hierarchical march (approximate): march every 2nd pixel at full
    length, then march each full-res pixel only inside a ``window``-step
    interval anchored at its coarse 2x2 neighbourhood's earliest event.

    ~3x fewer volume reads than :func:`march`. Approximation: pixels whose
    true first event lies more than ``window`` steps after the neighbourhood
    anchor (deep silhouette edges) can miss or mis-time; downstream ICP
    gates reject such pixels, and end-to-end tracking accuracy is asserted
    by tests. Not bit-equivalent to the reference — opt-in via
    ``SlamConfig.raycast_march = "hier"``.

    If ``weight`` is given, the coarse pass uses the empty-space-skipping
    march (:func:`march_skip` — identical events to :func:`march`, dynamic
    trip count), producing the exact same anchors with fewer volume reads
    (``SlamConfig.raycast_march = "hier_skip"``).
    """
    X, Y, Z = value.shape
    voxel = cfg.voxel_size
    step = cfg.trunc_dist * 0.8
    H, W = ray_dir.v.shape[-2:]

    coarse_dir = CSFD(ray_dir.v[:, ::2, ::2], ray_dir.g[:, ::2, ::2])
    if weight is not None:
        coarse = march_skip(value, weight, ray_start, coarse_dir, cfg)
    else:
        coarse = march(value, ray_start, coarse_dir, cfg)
    return _window_repair(value, ray_start, ray_dir.v, coarse, window, cfg)


def march_hier2(
    value: jnp.ndarray,
    ray_start: CSFD,
    ray_dir: CSFD,
    cfg: VolumeConfig,
    window: int = 8,
    window_mid: int = 12,
) -> RaycastHit:
    """Two-level hierarchical march: full-length march at quarter
    resolution, ``window_mid``-step repair at half resolution, then a
    ``window``-step repair at full resolution (anchors tighten as the
    pyramid refines, so the final window can be short). Roughly half the
    volume reads of :func:`march_hier`; same approximation class
    (silhouette-edge events beyond the window are missed — gated
    downstream). Opt-in via ``SlamConfig.raycast_march = "hier2"``."""
    q_dir = ray_dir.v[:, ::4, ::4]
    h_dir = ray_dir.v[:, ::2, ::2]
    coarse = march(
        value, ray_start, CSFD(q_dir, ray_dir.g[:, ::4, ::4]), cfg
    )
    mid = _window_repair(value, ray_start, h_dir, coarse, window_mid, cfg)
    return _window_repair(value, ray_start, ray_dir.v, mid, window, cfg)


def march_temporal(
    value: jnp.ndarray,
    t_prev: jnp.ndarray,
    ray_start: CSFD,
    ray_dir: CSFD,
    cfg: VolumeConfig,
    window: int = 12,
    read_fn=None,
    shape=None,
    return_samples: bool = False,
):
    """Anchored march (approximate): window-repair every pixel around a
    per-pixel anchor distance — no coarse march at all, so the whole march
    costs ``window`` lockstep samples/ray.

    ``t_prev`` (H, W) is the anchor map. The engines anchor primarily at
    the CURRENT depth frame's surface distance (t = |backprojected
    vertex|; the fused map surface lies within noise + pose error + fusion
    smoothing of it — centimetres, well inside a window step of 0.072 m)
    with the previous raycast's hit distance as fallback where depth is
    invalid. Pure previous-hit anchoring is NOT sufficient: anchors erode
    at a pan's leading edge faster than neighbourhood spread heals
    (measured on the realistic 300-frame run). Anchors are min-pooled 2x2
    and fed through :func:`_window_repair`'s 2x2 neighbourhood-min, so
    each pixel anchors at the earliest candidate in its ~4x4
    neighbourhood. Pixels with no finite anchor produce no event this
    frame — silhouette/dropout misses go NaN and are ICP-gated (the hier
    approximation class); callers bootstrap / refresh with a full march
    via the anchor-coverage cond."""
    H, W = ray_dir.v.shape[-2:]
    tp = jnp.where(jnp.isfinite(t_prev), t_prev, INF_T)
    tp_half = jnp.min(
        tp[: (H // 2) * 2, : (W // 2) * 2].reshape(H // 2, 2, W // 2, 2),
        axis=(1, 3),
    )
    coarse = RaycastHit(t_found=tp_half, t_dead=jnp.full_like(tp_half, INF_T))
    return _window_repair(
        value, ray_start, ray_dir.v, coarse, window, cfg,
        read_fn=read_fn, shape=shape, return_samples=return_samples,
    )


def march_temporal_compact(
    value: jnp.ndarray,
    t_prev: jnp.ndarray,
    ray_start: CSFD,
    ray_dir: CSFD,
    cfg: VolumeConfig,
    window: int = 12,
    phase1: int = 4,
    cap_frac: float = 0.16,
    read_fn=None,
    shape=None,
    return_samples: bool = False,
):
    """:func:`march_temporal` with survivor compaction — EVENT-IDENTICAL to
    the plain ``window``-step repair, ~half the gather issues.

    The anchored repair is gather-bound at (window+1) lockstep reads per
    ray, but the anchors are good: on the canonical bench 99.94% of
    window-12 events land within the first 4 steps (round-5 CPU
    measurement) — the lockstep tail exists only for silhouette/dropout
    pixels. Phases: (1) ``phase1`` full-width steps for every ray; (2) the
    not-done rays are compacted (``jnp.nonzero`` with static capacity
    ``cap_frac * N``) and march the remaining steps alone; (3) an exact
    full-width ``while_loop`` sweep finishes anything the capacity could
    not hold (normally zero iterations — e.g. frozen-pose stretches where
    anchors and rays diverge), making the events exact for EVERY schedule
    and scene, the :func:`march_skip_compact` discipline. Each ray's state
    ``(k, prev, t_found, t_dead, f0, f1, done)`` is self-contained on its
    own anchor grid, so compaction cannot change events."""
    H, W = ray_dir.v.shape[-2:]
    if shape is None:
        shape = value.shape
    X, Y, Z = shape
    step = cfg.trunc_dist * 0.8

    # anchor construction identical to march_temporal
    tp = jnp.where(jnp.isfinite(t_prev), t_prev, INF_T)
    tp_half = jnp.min(
        tp[: (H // 2) * 2, : (W // 2) * 2].reshape(H // 2, 2, W // 2, 2),
        axis=(1, 3),
    )
    t_event = jnp.minimum(tp_half, jnp.full_like(tp_half, INF_T))

    def nbhd_min(a):
        pads = jnp.pad(a, ((0, 1), (0, 1)), constant_values=INF_T)
        return jnp.minimum(
            jnp.minimum(pads[:-1, :-1], pads[1:, :-1]),
            jnp.minimum(pads[:-1, 1:], pads[1:, 1:]),
        )

    t0_full = jnp.repeat(jnp.repeat(nbhd_min(t_event), 2, 0), 2, 1)[:H, :W]
    has_anchor = t0_full < INF_T
    k0 = jnp.maximum(
        jnp.floor((jnp.where(has_anchor, t0_full, RAY_MIN_M) - RAY_MIN_M) / step) - 1.0,
        0.0,
    )
    t_begin = (RAY_MIN_M + k0 * step).reshape(-1)

    N = H * W
    dirs_f = ray_dir.v.reshape(3, N)
    start_f = ray_start.v[:, None]

    if read_fn is None:

        def read_fn(g):
            return gather3d(value, g[0], g[1], g[2]) + 1e-5

    read_value = read_fn

    def in_global(g):
        return (
            (g[0] >= 0) & (g[0] < X) & (g[1] >= 0) & (g[1] < Y)
            & (g[2] >= 0) & (g[2] < Z)
        )

    p0 = start_f + dirs_f * t_begin
    g0 = jnp.floor(p0 / cfg.voxel_size).astype(jnp.int32)
    g0c = jnp.stack(
        [jnp.clip(g0[0], 0, X - 1), jnp.clip(g0[1], 0, Y - 1),
         jnp.clip(g0[2], 0, Z - 1)]
    )
    tsdf0 = read_value(g0c)
    anchors_f = has_anchor.reshape(-1)

    def step_once(state, dirs, t_begin_s, anchors_s):
        k, prev, t_found, t_dead, f0, f1, done = state
        kf = k.astype(jnp.float32)
        t_curr = t_begin_s + kf * step
        t_next = t_curr + step
        p = dirs * t_next + start_f
        g = jnp.floor(p / cfg.voxel_size).astype(jnp.int32)
        live = anchors_s & (t_curr < RAY_MAX_M) & ~done
        inside = in_global(g) & live
        tsdf = read_value(g)

        death = live & (~in_global(g) | (inside & (prev < 0.0) & (tsdf > 0.0)))
        crossing = inside & (prev > 0.0) & (tsdf < 0.0)
        record = crossing & (t_curr < t_found)
        t_found = jnp.where(record, t_curr, t_found)
        f0 = jnp.where(record, prev, f0)
        f1 = jnp.where(record, tsdf, f1)
        t_dead = jnp.where(death & (t_curr < t_dead), t_curr, t_dead)
        done = (
            done | crossing | death | ~anchors_s
            | (k + 1 >= window) | (t_curr >= RAY_MAX_M)
        )
        return (k + 1, tsdf, t_found, t_dead, f0, f1, done)

    inf = jnp.full((N,), INF_T, jnp.float32)
    state = (
        jnp.zeros(N, jnp.int32), tsdf0, inf, inf,
        jnp.ones(N, jnp.float32), -jnp.ones(N, jnp.float32),
        ~anchors_f,
    )

    # phase 1: full-width lockstep
    state = jax.lax.fori_loop(
        0, min(phase1, window),
        lambda _, s: step_once(s, dirs_f, t_begin, anchors_f), state,
    )

    if window > phase1:
        # phase 2: compact the not-done rays (padded sentinel slot at N)
        cap = max(1, int(round(N * cap_frac)))

        def pad1(a, v):
            return jnp.concatenate([a, jnp.full((1,), v, a.dtype)])

        padded = (
            pad1(state[0], 0), pad1(state[1], 1.0), pad1(state[2], INF_T),
            pad1(state[3], INF_T), pad1(state[4], 1.0), pad1(state[5], -1.0),
            pad1(state[6], True),
        )
        tb_p = pad1(t_begin, RAY_MIN_M)
        an_p = pad1(anchors_f, False)
        dirs_p = jnp.concatenate([dirs_f, jnp.ones((3, 1), dirs_f.dtype)], axis=1)

        (sel,) = jnp.nonzero(~state[6], size=cap, fill_value=N)
        sub = tuple(a[sel] for a in padded)
        sdirs = dirs_p[:, sel]
        stb = tb_p[sel]
        san = an_p[sel]
        sub = jax.lax.fori_loop(
            0, window - phase1,
            lambda _, s: step_once(s, sdirs, stb, san), sub,
        )
        padded = tuple(a.at[sel].set(o) for a, o in zip(padded, sub))
        state = tuple(a[:N] for a in padded)

        # exact full-width sweep for anything the capacity missed
        # (normally zero body iterations: the cond costs one reduction)
        state = jax.lax.while_loop(
            lambda s: jnp.any(~s[6]),
            lambda s: step_once(s, dirs_f, t_begin, anchors_f),
            state,
        )

    _, _, t_found, t_dead, f0, f1, _ = state
    hit = RaycastHit(
        t_found=t_found.reshape(H, W), t_dead=t_dead.reshape(H, W)
    )
    if return_samples:
        return hit, f0.reshape(H, W), f1.reshape(H, W)
    return hit


def _window_repair(
    value: jnp.ndarray,
    ray_start: CSFD,
    dirs_v: jnp.ndarray,
    coarse: RaycastHit,
    window: int,
    cfg: VolumeConfig,
    read_fn=None,
    shape=None,
    own_fn=None,
    return_samples: bool = False,
):
    """March each pixel of ``dirs_v`` (3, H, W) only inside a ``window``-step
    interval anchored at its 2x2 coarse-neighbourhood's earliest event.
    ``coarse`` is the hit map one pyramid level above ``dirs_v`` (2x
    subsampled relative to it — not necessarily half the *full* resolution:
    ``march_hier2`` repairs quarter->half->full).

    ``read_fn``/``shape`` inject an alternative value-volume reader (see
    :func:`march_skip`). ``return_samples``: additionally return the two
    bracketing sample values ``(f0 > 0 at t_found, f1 < 0 at
    t_found + step)`` of each recorded crossing — the sample-reusing
    refinement (:func:`refine_from_samples`) consumes them; pixels without
    a crossing carry (1, -1)."""
    if shape is None:
        shape = value.shape
    X, Y, Z = shape
    voxel = cfg.voxel_size
    step = cfg.trunc_dist * 0.8
    H, W = dirs_v.shape[-2:]

    # earliest event per coarse pixel; INF where none
    t_event = jnp.minimum(coarse.t_found, coarse.t_dead)

    def nbhd_min(a):
        pads = jnp.pad(a, ((0, 1), (0, 1)), constant_values=INF_T)
        m = jnp.minimum(
            jnp.minimum(pads[:-1, :-1], pads[1:, :-1]),
            jnp.minimum(pads[:-1, 1:], pads[1:, 1:]),
        )
        return m  # (ch, cw)

    t0_coarse = nbhd_min(t_event)
    t0_full = jnp.repeat(jnp.repeat(t0_coarse, 2, 0), 2, 1)[:H, :W]
    has_anchor = t0_full < INF_T
    # anchor on the global march grid so window samples coincide exactly
    # with the full march's sample times
    k0 = jnp.floor((jnp.where(has_anchor, t0_full, RAY_MIN_M) - RAY_MIN_M) / step) - 1.0
    k0 = jnp.maximum(k0, 0.0)
    t_begin = RAY_MIN_M + k0 * step

    start_v = ray_start.v[:, None, None]

    def voxel_of(p):
        return jnp.floor(p / voxel).astype(jnp.int32)

    if read_fn is None:

        def read_fn(g):
            return gather3d(value, g[0], g[1], g[2]) + 1e-5

    read_value = read_fn

    def in_global(g):
        return (
            (g[0] >= 0) & (g[0] < X) & (g[1] >= 0) & (g[1] < Y) & (g[2] >= 0) & (g[2] < Z)
        )

    p0 = start_v + dirs_v * t_begin
    g0 = voxel_of(p0)
    g0c = jnp.stack(
        [jnp.clip(g0[0], 0, X - 1), jnp.clip(g0[1], 0, Y - 1), jnp.clip(g0[2], 0, Z - 1)]
    )
    tsdf0 = read_value(g0c)

    inf = jnp.full((H, W), INF_T, jnp.float32)

    f0_init = jnp.ones((H, W), jnp.float32)
    f1_init = -jnp.ones((H, W), jnp.float32)

    def body(k, carry):
        prev_tsdf, t_found, t_dead, f0, f1 = carry
        t_curr = t_begin + k.astype(jnp.float32) * step
        t_next = t_curr + step
        p = start_v + dirs_v * t_next
        g = voxel_of(p)
        # the reference's loop condition is on t_curr (RayCaster.cu:236) —
        # the final iteration's sample may lie beyond the max range
        live = has_anchor & (t_curr < RAY_MAX_M)
        inside = in_global(g) & live
        tsdf = read_value(g)

        own = own_fn(g) if own_fn is not None else True
        death = live & (
            ~in_global(g) | (own & inside & (prev_tsdf < 0.0) & (tsdf > 0.0))
        )
        crossing = own & inside & (prev_tsdf > 0.0) & (tsdf < 0.0)

        record = crossing & (t_curr < t_found)
        t_found = jnp.where(record, t_curr, t_found)
        f0 = jnp.where(record, prev_tsdf, f0)
        f1 = jnp.where(record, tsdf, f1)
        t_dead = jnp.where(death & (t_curr < t_dead), t_curr, t_dead)
        return (tsdf, t_found, t_dead, f0, f1)

    _, t_found, t_dead, f0, f1 = jax.lax.fori_loop(
        0, window, body, (tsdf0, inf, inf, f0_init, f1_init)
    )
    hit = RaycastHit(t_found=t_found, t_dead=t_dead)
    if return_samples:
        return hit, f0, f1
    return hit


def refine(
    vol: VolumeState,
    ray_start: CSFD,
    ray_dir: CSFD,
    hit_t: jnp.ndarray,
    accept: jnp.ndarray,
    r_v2w: CSFD,
    t_v2w: CSFD,
    cfg: VolumeConfig,
    spec: ShardSpec = ShardSpec(),
    normals_mode: str = "tsdf",
    packed_taps: bool = True,
    trilin_fn=None,
) -> Tuple[CSFD, CSFD, jnp.ndarray, jnp.ndarray]:
    """Secant refinement + vertex/normal computation at ``hit_t`` for pixels
    where ``accept``. Returns (vmap_w, nmap_w, v_ok, n_ok) with zeros (not
    NaN) outside the masks, so shards can psum-combine; the caller converts
    to NaN sentinels.

    ``normals_mode``: "tsdf" = central differences of the interpolated TSDF
    (reference behaviour, 6 trilinear evals); "screen" = skip here (caller
    derives normals from the combined vertex map, see
    :func:`screen_normals`).

    ``packed_taps``: fetch trilinear taps from a :func:`pack_vg_yz` row
    table (2 row gathers per dual trilinear instead of 16 scalar gathers —
    bit-identical, ~8x fewer gather issues; the table build is a handful of
    elementwise volume passes)."""
    voxel = cfg.voxel_size
    step = cfg.trunc_dist * 0.8
    Xl, Y, Z = vol.value.shape
    x_base, x_total, _, _ = _resolve(spec, vol.value.shape)

    def point_at(t: CSFD) -> CSFD:
        return vec3.vec3(
            vec3.comp(ray_start, 0) + vec3.comp(ray_dir, 0) * t,
            vec3.comp(ray_start, 1) + vec3.comp(ray_dir, 1) * t,
            vec3.comp(ray_start, 2) + vec3.comp(ray_dir, 2) * t,
        )

    if trilin_fn is not None:
        trilin_at = trilin_fn
    elif packed_taps:
        packed = pack_vg_yz(vol.value, vol.grad)

        def trilin_at(p: CSFD) -> CSFD:
            return trilinear_tsdf_packed(
                packed, vol.value.shape,
                vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2), voxel,
                x_base=x_base, x_total=x_total,
            )
    else:

        def trilin_at(p: CSFD) -> CSFD:
            return trilinear_tsdf_shard(
                vol.value, vol.grad,
                vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2), voxel, spec,
            )

    t_dual = lift(jnp.where(accept, hit_t, RAY_MIN_M))
    ft = trilin_at(point_at(t_dual))
    ftdt = trilin_at(point_at(t_dual + step))
    ok = (
        accept
        & ~jnp.isnan(ft.v)
        & ~jnp.isnan(ftdt.v)
        & (ft.v >= 0.0)
        & (ftdt.v <= 0.0)
        & (ftdt.v != ft.v)
    )
    denom = CSFD(jnp.where(ok, (ftdt - ft).v, 1.0), jnp.where(ok, (ftdt - ft).g, 0.0))
    ts = t_dual - (ft / denom) * step

    vertex = point_at(ts)  # volume coords, dual
    vertex_w = vec3.matvec(r_v2w, vertex) + CSFD(
        t_v2w.v[:, None, None], t_v2w.g[:, None, None]
    )
    vmap = CSFD(
        jnp.where(ok[None], jnp.nan_to_num(vertex_w.v), 0.0),
        jnp.where(ok[None], jnp.nan_to_num(vertex_w.g), 0.0),
    )

    if normals_mode == "screen":
        zeros = CSFD(jnp.zeros_like(vmap.v), jnp.zeros_like(vmap.g))
        return vmap, zeros, ok, jnp.zeros_like(ok)

    # central-difference normals with the reference's interior margin
    # (RayCaster.cu:270-271)
    gv = jnp.floor(vertex.v / voxel).astype(jnp.int32)
    n_ok = ok & (
        (gv[0] > 1) & (gv[0] < x_total - 2)
        & (gv[1] > 1) & (gv[1] < Y - 2)
        & (gv[2] > 1) & (gv[2] < Z - 2)
    )
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
    nmap = CSFD(
        jnp.where(n_ok[None], jnp.nan_to_num(n_g.v), 0.0),
        jnp.where(n_ok[None], jnp.nan_to_num(n_g.g), 0.0),
    )
    return vmap, nmap, ok, n_ok


def refine_from_samples(
    trilin_at,
    ray_start: CSFD,
    ray_dir: CSFD,
    hit_t: jnp.ndarray,
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    accept: jnp.ndarray,
    r_v2w: CSFD,
    t_v2w: CSFD,
    cfg: VolumeConfig,
) -> Tuple[CSFD, CSFD, jnp.ndarray, jnp.ndarray]:
    """Sample-reusing refinement: secant on the march's own bracketing
    samples + ONE exact dual trilinear as a Newton polish.

    The exact :func:`refine` evaluates TWO dual trilinears per pixel (ft at
    t, ftdt at t+step; ``RayCaster.cu:245-261``) — 13.5 ms/frame of the
    round-4 budget. The anchored march has just READ the two bracketing
    nearest-voxel samples (``f0 > 0`` at ``hit_t``, ``f1 < 0`` one step
    later): their secant root ``ts0`` lands within ~half a voxel of the
    surface, and one exact dual trilinear ``F(ts0)`` turns it into a Newton
    step with the march-sample slope ``(f1 - f0)/step``, landing within
    O(err^2 x field curvature) of the exact trilinear-secant root (the TSDF
    is trilinear, hence near-linear along a ray inside a cell). Halves the
    refinement's gather issues.

    Derivative statement: ``F.g`` (the seeded-parameter derivative of the
    interpolated field at the refined point) is EXACT; the returned
    ``ts.g = -F.g / slope`` is the implicit-function-theorem derivative
    with an O(step)-accurate finite-difference slope — first-order
    consistent, not bit-exact like :func:`refine`'s dual secant.
    Approximation class: validated end-to-end (ATE envelope + realistic
    runs) like the hier/temporal marches; opt-in via
    ``SlamConfig.raycast_refine = "reuse"``. Pixels whose Newton
    correction exceeds one march step (the local linear model failed —
    trilinear/nearest-sample sign disagreement at silhouettes) are
    rejected to NaN and gated by ICP like any dropout."""
    step = cfg.trunc_dist * 0.8

    def point_at(t: CSFD) -> CSFD:
        return vec3.vec3(
            vec3.comp(ray_start, 0) + vec3.comp(ray_dir, 0) * t,
            vec3.comp(ray_start, 1) + vec3.comp(ray_dir, 1) * t,
            vec3.comp(ray_start, 2) + vec3.comp(ray_dir, 2) * t,
        )

    ok0 = accept & (f1 < f0)
    slope = jnp.where(ok0, (f1 - f0) / step, -1.0)  # < 0 on crossings
    t0 = jnp.where(accept, hit_t, RAY_MIN_M)
    ts0 = t0 - f0 / slope  # in (t0, t0 + step) when bracketed
    F = trilin_at(point_at(lift(jnp.where(ok0, ts0, RAY_MIN_M))))
    ok = ok0 & ~jnp.isnan(F.v) & (jnp.abs(F.v) <= -slope * step)
    ts = CSFD(
        jnp.where(ok, ts0 - F.v / slope, t0),
        jnp.where(ok, -F.g / slope, 0.0),
    )

    vertex = point_at(ts)  # volume coords, dual
    vertex_w = vec3.matvec(r_v2w, vertex) + CSFD(
        t_v2w.v[:, None, None], t_v2w.g[:, None, None]
    )
    vmap = CSFD(
        jnp.where(ok[None], jnp.nan_to_num(vertex_w.v), 0.0),
        jnp.where(ok[None], jnp.nan_to_num(vertex_w.g), 0.0),
    )
    zeros = CSFD(jnp.zeros_like(vmap.v), jnp.zeros_like(vmap.g))
    return vmap, zeros, ok, jnp.zeros_like(ok)


def screen_normals(vmap: CSFD, central: bool = True) -> CSFD:
    """Dual world-space normals from raycast-vertex cross products.

    A TPU-native alternative to the reference's 6 extra trilinear TSDF
    interpolations per pixel (96 gathers, RayCaster.cu:272-297): zero
    gathers. ``central=True`` (default) uses central differences
    ``(v[+1]-v[-1]) x`` — unbiased to first order, which matters when the
    model maps are rendered at a coarser pyramid level (forward differences
    tilt the normals enough at half resolution to derail ICP: measured
    0.44 m vs 0.02 m ATE on the 6-frame small workload). ``central=False``
    is the one-sided formula of the current-frame normal map
    (``computeNmapKernel``, Map.cu:32-70). Normal orientation is irrelevant
    to the ICP normal equations (J and r flip sign together).
    """
    import jax.numpy as jnp

    from .preprocess import _shift2d

    def shift(m: CSFD, dy, dx) -> CSFD:
        return CSFD(_shift2d(m.v, dy, dx, fill=jnp.nan), _shift2d(m.g, dy, dx))

    if central:
        xp, xm = shift(vmap, 0, 1), shift(vmap, 0, -1)
        yp, ym = shift(vmap, 1, 0), shift(vmap, -1, 0)
        a = xp - xm
        b = yp - ym
        ok = (
            ~jnp.isnan(vmap.v[0]) & ~jnp.isnan(xp.v[0]) & ~jnp.isnan(xm.v[0])
            & ~jnp.isnan(yp.v[0]) & ~jnp.isnan(ym.v[0])
        )
    else:
        v01 = shift(vmap, 0, 1)
        v10 = shift(vmap, 1, 0)
        a = v01 - vmap
        b = v10 - vmap
        ok = ~jnp.isnan(vmap.v[0]) & ~jnp.isnan(v01.v[0]) & ~jnp.isnan(v10.v[0])
    n = vec3.cross(a, b)
    nsq = vec3.squarednorm(n)
    ok = ok & (nsq.v > 0.0) & ~jnp.isnan(nsq.v)
    safe = CSFD(jnp.where(ok[None], n.v, 1.0), jnp.where(ok[None], n.g, 0.0))
    out = vec3.normalized(safe)
    nan = jnp.float32(jnp.nan)
    return CSFD(jnp.where(ok[None], out.v, nan), jnp.where(ok[None], out.g, 0.0))


def finalize_maps(vmap, nmap, v_ok, n_ok) -> Tuple[CSFD, CSFD]:
    """Install the NaN sentinels the downstream consumers check."""
    nan = jnp.float32(jnp.nan)
    vm = CSFD(jnp.where(v_ok[None], vmap.v, nan), jnp.where(v_ok[None], vmap.g, 0.0))
    nm = CSFD(jnp.where(n_ok[None], nmap.v, nan), jnp.where(n_ok[None], nmap.g, 0.0))
    return vm, nm


MARCH_MODES = ("fixed", "skip", "hier", "hier_skip", "hier2")


def raycast(
    vol: VolumeState,
    r_c2v: CSFD,
    t_c2v: CSFD,
    r_v2w: CSFD,
    t_v2w: CSFD,
    intr: Intrinsics,
    cfg: VolumeConfig,
    normals_mode: str = "tsdf",
    march_mode: str = "fixed",
    hier_window: int = 12,
    packed_taps: bool = True,
    compact: bool = False,
) -> Tuple[CSFD, CSFD]:
    """Single-chip raycast: march + refine + NaN sentinels.

    ``packed_taps``: route refinement through the :func:`pack_vg_yz` row
    table (fewer gather issues, but an 8-float-per-voxel transient — disable
    for large volumes where 4x the value+grad footprint doesn't fit).
    ``compact``: use the survivor-compacted skip march
    (:func:`march_skip_compact`, bit-identical events)."""
    if march_mode not in MARCH_MODES:
        raise ValueError(
            f"unknown raycast march_mode {march_mode!r}; expected one of {MARCH_MODES}"
        )
    ray_dir, ray_start = _camera_rays(r_c2v, t_c2v, intr)
    if march_mode == "skip":
        march_fn = march_skip_compact if compact else march_skip
        hit = march_fn(vol.value, vol.weight, ray_start, ray_dir, cfg)
    elif march_mode == "hier":
        hit = march_hier(vol.value, ray_start, ray_dir, cfg, window=hier_window)
    elif march_mode == "hier_skip":
        hit = march_hier(
            vol.value, ray_start, ray_dir, cfg, window=hier_window,
            weight=vol.weight,
        )
    elif march_mode == "hier2":
        hit = march_hier2(vol.value, ray_start, ray_dir, cfg, window=hier_window)
    else:
        hit = march(vol.value, ray_start, ray_dir, cfg)
    accept = hit.t_found < jnp.minimum(hit.t_dead, INF_T)
    vmap, nmap, v_ok, n_ok = refine(
        vol, ray_start, ray_dir, hit.t_found, accept, r_v2w, t_v2w, cfg,
        normals_mode=normals_mode, packed_taps=packed_taps,
    )
    vmap, nmap = finalize_maps(vmap, nmap, v_ok, n_ok)
    if normals_mode == "screen":
        nmap = screen_normals(vmap)
    return vmap, nmap

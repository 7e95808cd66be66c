"""Raycasting directly from the persistent brick-major volume.

Composes the exact event/refinement semantics of :mod:`xslam_tpu.ops.raycast`
(march step 0.8*trunc over [0.2, 5.0] m, secant refinement, RayCaster.cu:
226-304) with brick-major readers (:mod:`xslam_tpu.ops.bricks`):

* empty-space skipping costs one ``jnp.where`` over rows per frame (the
  dense layout paid a voxel-level repeat + full rewrite),
* there is no packed-tap table rebuild (~36 ms/frame at 256^3 on v5e —
  apps/probe_layout.py): trilinear taps are plain scalar gathers from the
  brick rows, bit-identical to the dense ``trilinear_tsdf_shard``.

The default strategy is the hier_skip march: a full-length skip march at
half the target resolution anchors a ``window``-step repair pass at the
target resolution (same approximation class as ``raycast.march_hier``,
gated downstream by the ICP validity tests).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..csfd import vec3
from ..csfd.single import CSFD, lift
from ..geometry.intrinsics import Intrinsics
from . import bricks
from .bricks import BrickVolume
from .fusion import VolumeConfig
from .raycast import (
    INF_T,
    RaycastHit,
    _camera_rays,
    _window_repair,
    finalize_maps,
    march_skip,
    refine,
    refine_from_samples,
    screen_normals,
)

BRICK_MARCH_MODES = ("skip", "hier_skip", "hier2_skip", "temporal")


def _value_reader(plane, res):
    def read(g):
        return bricks.gather(plane, res, g[0], g[1], g[2]) + 1e-5

    return read


def trilinear_bricks(
    bvol: BrickVolume, res, px: CSFD, py: CSFD, pz: CSFD, voxel_size: float
) -> CSFD:
    """Dual trilinear TSDF interpolation from brick rows — bit-identical to
    :func:`xslam_tpu.ops.raycast.trilinear_tsdf_shard` on the corresponding
    dense volumes (same base-cell shift, RayCaster.cu:117-122; same +1e-5
    bias, RayCaster.cu:77; same tap summation order)."""
    X, Y, Z = res
    inv_vs = 1.0 / voxel_size

    gx = jnp.floor(px.v * inv_vs).astype(jnp.int32)
    gy = jnp.floor(py.v * inv_vs).astype(jnp.int32)
    gz = jnp.floor(pz.v * inv_vs).astype(jnp.int32)
    ok = (
        (gx > 0) & (gx < X - 1) & (gy > 0) & (gy < Y - 1) & (gz > 0) & (gz < Z - 1)
    )

    gx = gx - (px.v < (gx.astype(jnp.float32) + 0.5) * voxel_size)
    gy = gy - (py.v < (gy.astype(jnp.float32) + 0.5) * voxel_size)
    gz = gz - (pz.v < (gz.astype(jnp.float32) + 0.5) * voxel_size)

    a0 = px * inv_vs - (gx.astype(jnp.float32) + 0.5)
    b0 = py * inv_vs - (gy.astype(jnp.float32) + 0.5)
    c0 = pz * inv_vs - (gz.astype(jnp.float32) + 0.5)
    one = lift(1.0, like=a0)
    a1, b1, c1 = one - a0, one - b0, one - c0

    def tap(dx, dy, dz) -> CSFD:
        ix, iy, iz = gx + dx, gy + dy, gz + dz
        return CSFD(
            bricks.gather(bvol.value, res, ix, iy, iz) + 1e-5,
            bricks.gather(bvol.grad, res, ix, iy, iz),
        )

    out = (
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
    return CSFD(jnp.where(ok, out.v, nan), jnp.where(ok, out.g, 0.0))


def interleave_vg(bvol: BrickVolume) -> jnp.ndarray:
    """(NB*512, 2) row table: row ``flat_index(res, x, y, z)`` holds
    ``[value, grad]`` of that voxel. One lane-interleave pass over the two
    planes (~1 ms at 256^3 — no parity swizzles, no neighbour stitching,
    unlike the dense ``pack_vg_yz`` / brick ``pack_vg_z9`` builds)."""
    return jnp.stack([bvol.value, bvol.grad], axis=-1).reshape(-1, 2)


def interleave_vg4(bvol: BrickVolume, res) -> jnp.ndarray:
    """(NB*512, 4) quad table: row ``flat_index(res, x, y, z)`` holds
    ``[v(z), g(z), v(z+1), g(z+1)]`` — the (z, z+1) tap pair of BOTH planes
    in ONE 4-wide row gather. The z+1 entries come from a lane shift within
    the brick row plus the bz+1 brick's z=0 lane (brick order is bz-fastest,
    bricks.py::flat_index), so the pair is correct across brick boundaries;
    rows whose z+1 would leave the volume are never consumed (the trilinear
    base-cell mask bounds gz to [0, Z-2] for consumed pixels)."""
    NB = bvol.value.shape[0]
    v = bvol.value.reshape(NB, 64, 8)
    g = bvol.grad.reshape(NB, 64, 8)
    # z+1 = next lane; last lane (z=7) from the NEXT brick row's z=0 lane
    # (wraps at the global last row — unconsumed by construction)
    vn = jnp.roll(v, -1, axis=0)[:, :, :1]
    gn = jnp.roll(g, -1, axis=0)[:, :, :1]
    vz1 = jnp.concatenate([v[:, :, 1:], vn], axis=2)
    gz1 = jnp.concatenate([g[:, :, 1:], gn], axis=2)
    return jnp.stack([v, g, vz1, gz1], axis=-1).reshape(-1, 4)


def trilinear_quad_bricks(
    vg4: jnp.ndarray, res, px: CSFD, py: CSFD, pz: CSFD, voxel_size: float
) -> CSFD:
    """Dual trilinear TSDF interpolation from an :func:`interleave_vg4`
    table: 4 row gathers per interpolation (one per (x, y) cell corner;
    each row carries the (z, z+1) tap pair of both planes) — half of
    :func:`trilinear_pair_bricks`'s 8 issues, a quarter of
    :func:`trilinear_bricks`'s 16. Bit-identical on consumed pixels: the
    base-cell mask (RayCaster.cu:100-113 semantics) keeps every tap of a
    consumed pixel strictly in bounds, so the fetched f32 bits and the tap
    summation order (same as :func:`trilinear_bricks`) are unchanged."""
    X, Y, Z = res
    inv_vs = 1.0 / voxel_size

    gx = jnp.floor(px.v * inv_vs).astype(jnp.int32)
    gy = jnp.floor(py.v * inv_vs).astype(jnp.int32)
    gz = jnp.floor(pz.v * inv_vs).astype(jnp.int32)
    ok = (
        (gx > 0) & (gx < X - 1) & (gy > 0) & (gy < Y - 1) & (gz > 0) & (gz < Z - 1)
    )

    gx = gx - (px.v < (gx.astype(jnp.float32) + 0.5) * voxel_size)
    gy = gy - (py.v < (gy.astype(jnp.float32) + 0.5) * voxel_size)
    gz = gz - (pz.v < (gz.astype(jnp.float32) + 0.5) * voxel_size)

    a0 = px * inv_vs - (gx.astype(jnp.float32) + 0.5)
    b0 = py * inv_vs - (gy.astype(jnp.float32) + 0.5)
    c0 = pz * inv_vs - (gz.astype(jnp.float32) + 0.5)
    one = lift(1.0, like=a0)
    a1, b1, c1 = one - a0, one - b0, one - c0

    gzc = jnp.clip(gz, 0, Z - 1)

    def tap_pair(dx, dy):
        idx = bricks.flat_index(
            res,
            jnp.clip(gx + dx, 0, X - 1),
            jnp.clip(gy + dy, 0, Y - 1),
            gzc,
        )
        r = jnp.take(vg4, idx.reshape(-1), axis=0, mode="clip").reshape(
            *jnp.shape(gx), 4
        )
        t0 = CSFD(r[..., 0] + 1e-5, r[..., 1])
        t1 = CSFD(r[..., 2] + 1e-5, r[..., 3])
        return t0, t1

    p00_0, p00_1 = tap_pair(0, 0)
    p01_0, p01_1 = tap_pair(0, 1)
    p10_0, p10_1 = tap_pair(1, 0)
    p11_0, p11_1 = tap_pair(1, 1)

    out = (
        p00_0 * (a1 * b1 * c1)
        + p00_1 * (a1 * b1 * c0)
        + p01_0 * (a1 * b0 * c1)
        + p01_1 * (a1 * b0 * c0)
        + p10_0 * (a0 * b1 * c1)
        + p10_1 * (a0 * b1 * c0)
        + p11_0 * (a0 * b0 * c1)
        + p11_1 * (a0 * b0 * c0)
    )
    nan = jnp.float32(jnp.nan)
    return CSFD(jnp.where(ok, out.v, nan), jnp.where(ok, out.g, 0.0))


def trilinear_pair_bricks(
    vg: jnp.ndarray, res, px: CSFD, py: CSFD, pz: CSFD, voxel_size: float
) -> CSFD:
    """Dual trilinear TSDF interpolation fetching each tap's (value, grad)
    as ONE 2-wide row gather from an :func:`interleave_vg` table — 8 gather
    issues per interpolation instead of :func:`trilinear_bricks`'s 16,
    at the measured scalar-gather cost per row (2/4/8-wide row gathers all
    cost ~6.7-7.2 ns on v5e, apps/probe_gather_chain.py). Bit-identical to
    :func:`trilinear_bricks` (same base-cell shift RayCaster.cu:117-122,
    same +1e-5 bias RayCaster.cu:77, same bounds fills, same summation
    order; the gathered f32 values are the same bits)."""
    X, Y, Z = res
    inv_vs = 1.0 / voxel_size

    gx = jnp.floor(px.v * inv_vs).astype(jnp.int32)
    gy = jnp.floor(py.v * inv_vs).astype(jnp.int32)
    gz = jnp.floor(pz.v * inv_vs).astype(jnp.int32)
    ok = (
        (gx > 0) & (gx < X - 1) & (gy > 0) & (gy < Y - 1) & (gz > 0) & (gz < Z - 1)
    )

    gx = gx - (px.v < (gx.astype(jnp.float32) + 0.5) * voxel_size)
    gy = gy - (py.v < (gy.astype(jnp.float32) + 0.5) * voxel_size)
    gz = gz - (pz.v < (gz.astype(jnp.float32) + 0.5) * voxel_size)

    a0 = px * inv_vs - (gx.astype(jnp.float32) + 0.5)
    b0 = py * inv_vs - (gy.astype(jnp.float32) + 0.5)
    c0 = pz * inv_vs - (gz.astype(jnp.float32) + 0.5)
    one = lift(1.0, like=a0)
    a1, b1, c1 = one - a0, one - b0, one - c0

    def tap(dx, dy, dz) -> CSFD:
        ix, iy, iz = gx + dx, gy + dy, gz + dz
        okt = (ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
        idx = bricks.flat_index(
            res,
            jnp.clip(ix, 0, X - 1),
            jnp.clip(iy, 0, Y - 1),
            jnp.clip(iz, 0, Z - 1),
        )
        r = jnp.take(vg, idx.reshape(-1), axis=0, mode="clip").reshape(
            *jnp.shape(ix), 2
        )
        return CSFD(
            jnp.where(okt, r[..., 0], 0.0) + 1e-5,
            jnp.where(okt, r[..., 1], 0.0),
        )

    out = (
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
    return CSFD(jnp.where(ok, out.v, nan), jnp.where(ok, out.g, 0.0))


def trilinear_packed_bricks(
    table: jnp.ndarray, res, px: CSFD, py: CSFD, pz: CSFD, voxel_size: float
) -> CSFD:
    """Dual trilinear TSDF interpolation from a :func:`pack_vg_z9` row table:
    4 row gathers (one per (x, y) cell corner; each row carries the full
    (z, z+1) tap pair of both planes) instead of the 16 scalar gathers of
    :func:`trilinear_bricks` — bit-identical to it (tap values extracted with
    exact one-hot dots; same base-cell shift RayCaster.cu:117-122, same
    +1e-5 bias RayCaster.cu:77, same tap summation order)."""
    X, Y, Z = res
    inv_vs = 1.0 / voxel_size

    gx = jnp.floor(px.v * inv_vs).astype(jnp.int32)
    gy = jnp.floor(py.v * inv_vs).astype(jnp.int32)
    gz = jnp.floor(pz.v * inv_vs).astype(jnp.int32)
    ok = (
        (gx > 0) & (gx < X - 1) & (gy > 0) & (gy < Y - 1) & (gz > 0) & (gz < Z - 1)
    )

    gx = gx - (px.v < (gx.astype(jnp.float32) + 0.5) * voxel_size)
    gy = gy - (py.v < (gy.astype(jnp.float32) + 0.5) * voxel_size)
    gz = gz - (pz.v < (gz.astype(jnp.float32) + 0.5) * voxel_size)

    a0 = px * inv_vs - (gx.astype(jnp.float32) + 0.5)
    b0 = py * inv_vs - (gy.astype(jnp.float32) + 0.5)
    c0 = pz * inv_vs - (gz.astype(jnp.float32) + 0.5)
    one = lift(1.0, like=a0)
    a1, b1, c1 = one - a0, one - b0, one - c0

    gzc = jnp.clip(gz, 0, Z - 1)
    zidx = gzc & 7

    def fetch(ix, iy):
        row = bricks.flat_index(
            res, jnp.clip(ix, 0, X - 1), jnp.clip(iy, 0, Y - 1), gzc
        ) >> 3
        return jnp.take(table, row.reshape(-1), axis=0, mode="clip").reshape(
            *jnp.shape(gx), 18
        )

    r00 = fetch(gx, gy)
    r01 = fetch(gx, gy + 1)
    r10 = fetch(gx + 1, gy)
    r11 = fetch(gx + 1, gy + 1)

    # exact tap extraction: one-hot dot over the 9 z-lanes (adding exact
    # zeros preserves the gathered value bit-for-bit)
    lanes = jnp.arange(9, dtype=jnp.int32)
    oh0 = (lanes == zidx[..., None]).astype(jnp.float32)
    oh1 = (lanes == (zidx + 1)[..., None]).astype(jnp.float32)

    def tap(r, dz) -> CSFD:
        oh = oh0 if dz == 0 else oh1
        return CSFD(
            jnp.sum(r[..., :9] * oh, axis=-1) + 1e-5,
            jnp.sum(r[..., 9:] * oh, axis=-1),
        )

    out = (
        tap(r00, 0) * (a1 * b1 * c1)
        + tap(r00, 1) * (a1 * b1 * c0)
        + tap(r01, 0) * (a1 * b0 * c1)
        + tap(r01, 1) * (a1 * b0 * c0)
        + tap(r10, 0) * (a0 * b1 * c1)
        + tap(r10, 1) * (a0 * b1 * c0)
        + tap(r11, 0) * (a0 * b0 * c1)
        + tap(r11, 1) * (a0 * b0 * c0)
    )
    nan = jnp.float32(jnp.nan)
    return CSFD(jnp.where(ok, out.v, nan), jnp.where(ok, out.g, 0.0))


def raycast_bricks(
    bvol: BrickVolume,
    r_c2v: CSFD,
    t_c2v: CSFD,
    r_v2w: CSFD,
    t_v2w: CSFD,
    intr: Intrinsics,
    cfg: VolumeConfig,
    normals_mode: str = "screen",
    march_mode: str = "hier_skip",
    hier_window: int = 12,
    packed_taps: bool = True,
    skip_gran: int = 8,
    compact: bool = False,
    pair_taps: bool = False,
    quad_taps: bool = False,
    t_anchor=None,
    temporal_window: int = 12,
    temporal_min_coverage: float = 0.5,
    return_hit: bool = False,
    refine_mode: str = "secant2",
    temporal_phase1: int = 0,
    temporal_cap_frac: float = 0.16,
):
    """Raycast the model maps at ``intr``'s resolution from a brick-major
    volume. ``march_mode``: "skip" = full-length skip march at target
    resolution (identical events to the reference's fixed march);
    "hier_skip" = skip march at half target resolution + ``hier_window``-step
    repair (approximate, see raycast.march_hier). ``packed_taps``: refine
    through a :func:`pack_vg_z9` row table (4 row gathers per dual trilinear
    instead of 16 scalar gathers, bit-identical). ``pair_taps``: refine
    through an :func:`interleave_vg` pair table (8 two-wide row gathers,
    bit-identical; takes precedence over ``packed_taps``). ``quad_taps``:
    refine through an :func:`interleave_vg4` quad table (4 four-wide row
    gathers, bit-identical; takes precedence over both)."""
    if march_mode not in BRICK_MARCH_MODES:
        raise ValueError(
            f"unknown brick march_mode {march_mode!r}; expected one of {BRICK_MARCH_MODES}"
        )
    ray_dir, ray_start = _camera_rays(r_c2v, t_c2v, intr)
    return raycast_bricks_rays(
        bvol, ray_start, ray_dir, r_v2w, t_v2w, cfg,
        normals_mode=normals_mode, march_mode=march_mode,
        hier_window=hier_window, packed_taps=packed_taps,
        skip_gran=skip_gran, compact=compact, pair_taps=pair_taps,
        quad_taps=quad_taps, t_anchor=t_anchor,
        temporal_window=temporal_window,
        temporal_min_coverage=temporal_min_coverage, return_hit=return_hit,
        refine_mode=refine_mode, temporal_phase1=temporal_phase1,
        temporal_cap_frac=temporal_cap_frac,
    )


def raycast_bricks_rays(
    bvol: BrickVolume,
    ray_start: CSFD,
    ray_dir: CSFD,
    r_v2w: CSFD,
    t_v2w: CSFD,
    cfg: VolumeConfig,
    normals_mode: str = "screen",
    march_mode: str = "skip",
    hier_window: int = 12,
    packed=None,
    apply_screen: bool = True,
    packed_taps: bool = True,
    skip_gran: int = 8,
    compact: bool = False,
    pair_taps: bool = False,
    quad_taps: bool = False,
    t_anchor=None,
    temporal_window: int = 12,
    temporal_min_coverage: float = 0.5,
    return_hit: bool = False,
    refine_mode: str = "secant2",
    temporal_phase1: int = 0,
    temporal_cap_frac: float = 0.16,
):
    """March + refine for an explicit ray bundle (``ray_dir`` may be any
    column/row slice of a camera's rays — used by the pixel-sharded
    multi-chip path, :mod:`xslam_tpu.parallel.sharded`). ``packed`` injects
    precomputed jump-packed rows; ``apply_screen=False`` defers
    screen-normal computation to the caller (the sharded path computes them
    on the assembled map so column-boundary pixels see their neighbours);
    ``packed_taps`` routes refinement trilinears through the
    :func:`pack_vg_z9` row table (bit-identical, 4x fewer gather issues);
    ``skip_gran`` (8 or 4 voxels) is the skip-field cell edge — 4 halves the
    fine-step band around surfaces with identical events (bricks.py);
    ``compact`` uses the survivor-compacted march
    (:func:`xslam_tpu.ops.raycast.march_skip_compact`, identical events)."""
    res = cfg.resolution

    if skip_gran not in (4, 8):
        raise ValueError(f"skip_gran must be 4 or 8, got {skip_gran}")
    # the jump-packed skip volume is only consumed by the skip-march paths;
    # for the temporal march it belongs INSIDE the refresh cond branch (a
    # lax.cond executes only the taken branch, so the ~per-frame full-volume
    # pack is paid only on actual refresh frames, not the ~99% of frames the
    # anchored window march serves)
    packed_injected = packed

    def build_packed():
        if packed_injected is not None:
            return packed_injected
        return (
            bricks.skip_rows(bvol, res) if skip_gran == 8
            else bricks.skip_rows4(bvol, res)
        )

    value_read = _value_reader(bvol.value, res)

    if refine_mode not in ("secant2", "reuse"):
        raise ValueError(f"unknown refine_mode {refine_mode!r}")
    # sample-reusing refinement needs the march's bracketing samples — only
    # the window-repair marches record them; restrict to temporal (the mode
    # it was built for) and fall back to the exact secant elsewhere
    reuse = refine_mode == "reuse" and march_mode == "temporal"

    def hier2_hit():
        # two-level hierarchy (raycast.march_hier2 composed on brick
        # readers): full-length skip march at QUARTER resolution, 12-step
        # repair at half, ``hier_window``-step repair at full — roughly
        # half the gather issues of hier_skip, same approximation class
        # (silhouette events beyond a window are missed; gated downstream)
        packed_read = _value_reader(build_packed(), res)
        q_dir = CSFD(ray_dir.v[:, ::4, ::4], ray_dir.g[:, ::4, ::4])
        coarse = march_skip(
            None, None, ray_start, q_dir, cfg,
            packed_read=packed_read, shape=res, jump_unit=skip_gran,
        )
        mid = _window_repair(
            None, ray_start, ray_dir.v[:, ::2, ::2], coarse, 12, cfg,
            read_fn=value_read, shape=res,
        )
        return _window_repair(
            None, ray_start, ray_dir.v, mid, hier_window, cfg,
            read_fn=value_read, shape=res, return_samples=reuse,
        )

    if march_mode == "skip":
        from .raycast import march_skip_compact

        march_fn = march_skip_compact if compact else march_skip
        hit = march_fn(
            None, None, ray_start, ray_dir, cfg,
            packed_read=_value_reader(build_packed(), res), shape=res,
            jump_unit=skip_gran,
        )
    elif march_mode == "hier2_skip":
        hit = hier2_hit()
    elif march_mode == "temporal":
        # window-repair anchored at the previous frame's hit map — no
        # coarse march at all (raycast.march_temporal). The on-device cond
        # falls back to the full hier2_skip march whenever anchor coverage
        # is below threshold (bootstrap frame, post-relocalization pose
        # jump, accumulated silhouette decay): self-healing, scan-safe.
        if t_anchor is None:
            raise ValueError("march_mode='temporal' requires t_anchor")
        from .raycast import march_temporal, march_temporal_compact

        if temporal_phase1 > 0:
            def temporal_hit():
                return march_temporal_compact(
                    None, t_anchor, ray_start, ray_dir, cfg,
                    window=temporal_window, phase1=temporal_phase1,
                    cap_frac=temporal_cap_frac, read_fn=value_read,
                    shape=res, return_samples=reuse,
                )
        else:
            def temporal_hit():
                return march_temporal(
                    None, t_anchor, ray_start, ray_dir, cfg,
                    window=temporal_window, read_fn=value_read, shape=res,
                    return_samples=reuse,
                )

        frac = jnp.mean(jnp.isfinite(t_anchor).astype(jnp.float32))
        hit = jax.lax.cond(
            frac >= temporal_min_coverage,
            temporal_hit,
            hier2_hit,
        )
    else:
        coarse_dir = CSFD(ray_dir.v[:, ::2, ::2], ray_dir.g[:, ::2, ::2])
        coarse = march_skip(
            None, None, ray_start, coarse_dir, cfg,
            packed_read=_value_reader(build_packed(), res), shape=res,
            jump_unit=skip_gran,
        )
        hit = _window_repair(
            None, ray_start, ray_dir.v, coarse, hier_window, cfg,
            read_fn=value_read, shape=res,
        )

    if reuse:
        hit, f_bracket0, f_bracket1 = hit
    accept = hit.t_found < jnp.minimum(hit.t_dead, INF_T)

    if quad_taps:
        vg4 = interleave_vg4(bvol, res)

        def trilin_at(p: CSFD) -> CSFD:
            return trilinear_quad_bricks(
                vg4, res, vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2),
                cfg.voxel_size,
            )
    elif pair_taps:
        vg = interleave_vg(bvol)

        def trilin_at(p: CSFD) -> CSFD:
            return trilinear_pair_bricks(
                vg, res, vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2),
                cfg.voxel_size,
            )
    elif packed_taps:
        table = bricks.pack_vg_z9(bvol, res)

        def trilin_at(p: CSFD) -> CSFD:
            return trilinear_packed_bricks(
                table, res, vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2),
                cfg.voxel_size,
            )
    else:

        def trilin_at(p: CSFD) -> CSFD:
            return trilinear_bricks(
                bvol, res, vec3.comp(p, 0), vec3.comp(p, 1), vec3.comp(p, 2),
                cfg.voxel_size,
            )

    shape_only = jax.ShapeDtypeStruct(res, jnp.float32)
    from .fusion import VolumeState

    if reuse:
        if normals_mode != "screen":
            raise ValueError(
                "refine_mode='reuse' computes no TSDF normals — use "
                "raycast_normals='screen'"
            )
        vmap, nmap, v_ok, n_ok = refine_from_samples(
            trilin_at, ray_start, ray_dir, hit.t_found,
            f_bracket0, f_bracket1, accept, r_v2w, t_v2w, cfg,
        )
    else:
        vmap, nmap, v_ok, n_ok = refine(
            VolumeState(value=shape_only, grad=shape_only, weight=shape_only),
            ray_start, ray_dir, hit.t_found, accept, r_v2w, t_v2w, cfg,
            normals_mode=normals_mode, trilin_fn=trilin_at,
        )
    vmap, nmap = finalize_maps(vmap, nmap, v_ok, n_ok)
    if normals_mode == "screen" and apply_screen:
        nmap = screen_normals(vmap)
    if return_hit:
        # surface-hit distances (INF where none) — the next frame's
        # temporal anchors
        return vmap, nmap, hit.t_found
    return vmap, nmap

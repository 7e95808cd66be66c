"""Brick-compacted TSDF fusion: conservative culling of depth gathers.

The dense fusion kernel (``tsdfFusionKernal``, TsdfFusion.cu:85-171 — and our
:func:`xslam_tpu.ops.fusion.integrate`) samples the depth image once per
voxel. On TPU gathers are scalar-issue (~8 ns), so 256^3 voxels cost ~140 ms
of pure gather time per frame. This module classifies 8^3 voxel bricks
*conservatively* into three classes and only issues depth gathers for the
bricks that need them:

- **NONE**: provably no voxel updates (behind camera, outside the image
  bounds, or entirely beyond the truncation band behind the surface).
- **FAR**: provably every voxel takes the saturated free-space branch
  (``sdf > trunc_dist`` -> tsdf := 1 with zero derivative): the update is
  computed for the whole volume elementwise with no depth sample at all.
- **ACTIVE**: everything else (surface band, depth discontinuity cones,
  partially-visible bricks, invalid-pixel footprints): compacted into a
  fixed-capacity list, row-gathered in brick-major layout, updated with the
  exact dense math, and scattered back.

Classification uses min/max depth mip pyramids and interval arithmetic on
each brick's bounding sphere; every test errs toward ACTIVE, so the result
is bit-identical to dense fusion (verified by tests) while the depth-gather
count drops from 16.7M to ``cap * 512`` (2-4M typical).
"""

from __future__ import annotations

import builtins

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..csfd.single import CSFD
from ..geometry.intrinsics import Intrinsics
from .fusion import VolumeConfig, VolumeState, _voxel_update
from .sampling import gather2d

BRICK = 8
# Footprint-window tile sizes. A ~1.15x ladder (22 levels) instead of the
# round-1 power-of-2 ladder: the window-coverage fix bumps a misaligned
# footprint one LEVEL up, and with 2x level steps the bumped bounds were
# loose enough to swell the 120-frame-orbit ACTIVE max from ~2200 to 3135
# (round-5 measurement); the dense ladder brings it back to 2410 (mean
# 2142) at the cost of a few extra cheap depth-image reductions per frame.
# Any covering window is conservative, so ladder choice cannot affect
# correctness (bit-equality tests).
MIP_LEVELS = (
    8, 9, 10, 11, 12, 14, 16, 18, 20, 23, 26, 30, 34, 39, 45, 52, 60, 69,
    80, 92, 106, 128,
)  # tile sizes in pixels


def _mip_sizes(H, W):
    return [ts for ts in MIP_LEVELS if H // ts >= 1 and W // ts >= 1]


def _depth_mips(depth_m: jnp.ndarray):
    """Per-tile (min over valid, max over valid, all-valid) at several tile
    sizes, with edge tiles PADDED to full image coverage so every in-image
    footprint has a conservative window (round-1 dropped partial edge tiles,
    forcing whole edge strips to ACTIVE). Pad semantics: min=+inf / max=-inf
    (padding never bounds — sampled pixels are always in-image) and
    valid=True (the all-valid gate only matters under ``fully_inside``,
    where the window never reaches padding-only cells)."""
    H, W = depth_m.shape
    valid = depth_m > 0.0
    sizes = _mip_sizes(H, W)
    d_min_src = jnp.where(valid, depth_m, jnp.inf)
    d_max_src = jnp.where(valid, depth_m, -jnp.inf)
    mins, maxs, allv = [], [], []
    for ts in sizes:
        h, w = -(-H // ts), -(-W // ts)
        py, px = h * ts - H, w * ts - W
        mn = jnp.pad(d_min_src, ((0, py), (0, px)), constant_values=jnp.inf)
        mx = jnp.pad(d_max_src, ((0, py), (0, px)), constant_values=-jnp.inf)
        va = jnp.pad(valid, ((0, py), (0, px)), constant_values=True)
        mins.append(jnp.min(mn.reshape(h, ts, w, ts), axis=(1, 3)))
        maxs.append(jnp.max(mx.reshape(h, ts, w, ts), axis=(1, 3)))
        allv.append(jnp.all(va.reshape(h, ts, w, ts), axis=(1, 3)))
    return sizes, mins, maxs, allv


def _footprint_bounds(mips, level, cu, cv, per_cell: bool = False):
    """2x2-cell conservative (min, max, all_valid) at a chosen mip level.

    ``level`` is per-brick. All levels' (min, max, all_valid) cells are
    packed into one concatenated ``(N, 3)`` row table so the selected
    level's 2x2 window costs 4 row gathers per brick (TPU row gathers are
    as cheap as scalar gathers — BASELINE.md), instead of gathering every
    level and selecting (12 gathers x n_levels). With ``per_cell`` the
    four cells' individual (min, max, valid) are returned too (the split
    classifier's per-sub-window tests)."""
    sizes, mins, maxs, allv = mips
    n = len(sizes)
    rows, offsets, off = [], [], 0
    for li in range(n):
        h, w = mins[li].shape
        rows.append(
            jnp.stack(
                [mins[li].reshape(-1), maxs[li].reshape(-1),
                 allv[li].reshape(-1).astype(jnp.float32)],
                axis=1,
            )
        )
        offsets.append(off)
        off += h * w
    table = jnp.concatenate(rows, axis=0)

    ts_arr = jnp.asarray(sizes, jnp.int32)[level]
    mh_arr = jnp.asarray([m.shape[0] for m in mins], jnp.int32)[level]
    mw_arr = jnp.asarray([m.shape[1] for m in mins], jnp.int32)[level]
    base = jnp.asarray(offsets, jnp.int32)[level]
    cu0 = jnp.clip(cu // ts_arr, 0, mw_arr - 1)
    cv0 = jnp.clip(cv // ts_arr, 0, mh_arr - 1)

    def cell(dy, dx):
        y = jnp.clip(cv0 + dy, 0, mh_arr - 1)
        x = jnp.clip(cu0 + dx, 0, mw_arr - 1)
        idx = base + y * mw_arr + x
        return jnp.take(table, idx.reshape(-1), axis=0, mode="clip").reshape(
            *idx.shape, 3
        )

    c = [cell(0, 0), cell(0, 1), cell(1, 0), cell(1, 1)]
    mn = jnp.minimum(jnp.minimum(c[0][..., 0], c[1][..., 0]),
                     jnp.minimum(c[2][..., 0], c[3][..., 0]))
    mx = jnp.maximum(jnp.maximum(c[0][..., 1], c[1][..., 1]),
                     jnp.maximum(c[2][..., 1], c[3][..., 1]))
    av = (c[0][..., 2] * c[1][..., 2] * c[2][..., 2] * c[3][..., 2]) > 0.5
    if per_cell:
        return mn, mx, av, c, cu0, cv0, ts_arr
    return mn, mx, av


class BrickAux(NamedTuple):
    """Split-classifier output: per-brick class + the window metadata the
    fusion core needs to apply per-voxel sub-window masks (class 4)."""

    cls: jnp.ndarray  # (nbx, nby, nbz) int32: 0 NONE / 1 FAR / 2 ACTIVE /
    #                   3 FAR_PARTIAL / 4 MIXED (per-voxel far/none cells)
    farbits: jnp.ndarray  # int32 4-bit mask: cell (dy, dx) far <=> bit dy*2+dx
    win_u0: jnp.ndarray  # window origin (pixels)
    win_v0: jnp.ndarray
    win_ts: jnp.ndarray  # window cell edge (pixels)


def classify_bricks(
    depth_m: jnp.ndarray,
    r_v2c_v: jnp.ndarray,
    t_v2c_v: jnp.ndarray,
    intr: Intrinsics,
    cfg: VolumeConfig,
    res: Tuple[int, int, int],
    x_offset=0,
    cell: int = BRICK,
) -> jnp.ndarray:
    """Per-cell class on a ``cell``-voxel grid: 0 = NONE, 1 = FAR,
    2 = ACTIVE. ``x_offset`` (voxels) shifts the x origin for X-sharded
    slabs. ``cell`` defaults to the brick edge; ``cell=4`` classifies 4^3
    subcells — smaller footprints select finer depth mips, so the interval
    bounds tighten and the depth-discontinuity ACTIVE cones shrink (see
    :func:`classify_bricks_fine`)."""
    return classify_bricks_full(
        depth_m, r_v2c_v, t_v2c_v, intr, cfg, res, x_offset=x_offset,
        cell=cell, split=False,
    ).cls


def classify_bricks_full(
    depth_m: jnp.ndarray,
    r_v2c_v: jnp.ndarray,
    t_v2c_v: jnp.ndarray,
    intr: Intrinsics,
    cfg: VolumeConfig,
    res: Tuple[int, int, int],
    x_offset=0,
    cell: int = BRICK,
    split: bool = False,
) -> BrickAux:
    """:func:`classify_bricks` with the footprint-SPLIT tightening.

    ``split=True`` additionally runs the far/none interval tests per
    2x2-window CELL (quarter footprints): each cell's own [dmin_i, dmax_i]
    depth bounds pair with its own (tighter) lambda interval, so the
    product intervals decouple across depth discontinuities — the residual
    "interval cone looseness" the round-4 diagnosis measured (2056
    classified vs 774 ideal ACTIVE bricks). Tightened conclusions, all
    strictly conservative w.r.t. the exact per-voxel update
    (``TsdfFusion.cu:85-171`` semantics; bit-equality-tested):

    * NONE if every cell is provably behind-band (``none_i``),
    * FAR / FAR_PARTIAL if every cell is provably far on valid pixels
      (``far_i``),
    * **MIXED (class 4)** if every cell is ``far_i`` OR ``none_i``: the
      fusion core applies the far update to exactly the voxels whose
      sampled pixel lands in a far cell (an elementwise per-voxel bit
      test — zero depth gathers) and provably skips the rest.

    The brick-level global tests are kept OR'd in (they can win when a
    cell rect pokes outside the footprint bbox), so ``split=True`` is a
    strict superset of the round-4 classifier."""
    X, Y, Z = res
    nb = (X // cell, Y // cell, Z // cell)
    vs = cfg.voxel_size

    x_off_m = x_offset * vs
    bx0 = (jnp.arange(nb[0], dtype=jnp.float32))[:, None, None] * (cell * vs) + x_off_m
    by0 = (jnp.arange(nb[1], dtype=jnp.float32))[None, :, None] * (cell * vs)
    bz0 = (jnp.arange(nb[2], dtype=jnp.float32))[None, None, :] * (cell * vs)
    return _classify_boxes(
        depth_m, r_v2c_v, t_v2c_v, intr, cfg, bx0, by0, bz0, cell * vs,
        split=split,
    )


def _classify_boxes(
    depth_m, r_v2c_v, t_v2c_v, intr, cfg, bx0, by0, bz0, bm,
    split=False, mips=None,
):
    """Interval classification of arbitrary axis-aligned ``bm``-edge boxes
    (origins ``bx0/by0/bz0``, any broadcastable shapes — the grid
    classifiers pass a full grid; the subcell fusion stage passes the
    compacted candidates' 4^3 subcell origins). Semantics documented on
    :func:`classify_bricks_full`."""
    H, W = depth_m.shape

    # project all 8 box corners: tight image-space bbox + camera-z interval
    R, t = r_v2c_v, t_v2c_v
    us, vs_, zs = [], [], []
    # frustum-plane maxima: a voxel can update only if z > 0 and its
    # projection is inside the per-voxel gate u in [2.5, W-0.5), v in
    # [2.5, H-0.5) (fusion._voxel_update's floor(img-0.5) bounds) — for
    # z > 0 each bound is a HALF-SPACE a*x + b*y + c*z >= 0 in camera
    # coords (multiply through by z; sign-safe for negative fy). A brick
    # whose corner-hull maximum of a plane form is negative contains no
    # point satisfying it, hence no updating voxel -> NONE. Unlike the
    # projected-bbox test this is valid for z-straddling / behind-ish
    # bricks (the camera sits INSIDE the volume: measured 1.3k such bricks
    # were previously stuck ACTIVE because projection intervals explode
    # near z = 0).
    planes = (
        (intr.fx, 0.0, intr.cx - 2.5),
        (-intr.fx, 0.0, (W - 0.5) - intr.cx),
        (0.0, intr.fy, intr.cy - 2.5),
        (0.0, -intr.fy, (H - 0.5) - intr.cy),
    )
    plane_max = [None] * 4
    for dx in (0.0, bm):
        for dy in (0.0, bm):
            for dz in (0.0, bm):
                px, py, pz = bx0 + dx, by0 + dy, bz0 + dz
                cx_ = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
                cy_ = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
                cz_ = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]
                zs.append(cz_)
                zc = jnp.maximum(cz_, 1e-6)
                us.append(intr.fx * cx_ / zc + intr.cx)
                vs_.append(intr.fy * cy_ / zc + intr.cy)
                for pi, (a, b, c) in enumerate(planes):
                    val = a * cx_ + b * cy_ + c * cz_
                    plane_max[pi] = (
                        val if plane_max[pi] is None
                        else jnp.maximum(plane_max[pi], val)
                    )
    frustum_out = (
        (plane_max[0] < 0.0) | (plane_max[1] < 0.0)
        | (plane_max[2] < 0.0) | (plane_max[3] < 0.0)
    )
    zmin = zs[0]
    zmax = zs[0]
    for z in zs[1:]:
        zmin = jnp.minimum(zmin, z)
        zmax = jnp.maximum(zmax, z)

    # exact camera-distance interval of the solid brick: the brick is an
    # axis-aligned box in volume coords, so point-to-box distances from the
    # camera origin (in volume coords, o = -R^T t) are exact — much tighter
    # than the round-1 corner-min - half-diagonal bound
    ox = -(R[0, 0] * t[0] + R[1, 0] * t[1] + R[2, 0] * t[2])
    oy = -(R[0, 1] * t[0] + R[1, 1] * t[1] + R[2, 1] * t[2])
    oz = -(R[0, 2] * t[0] + R[1, 2] * t[1] + R[2, 2] * t[2])

    def axis_interval(b0, o):
        lo = jnp.abs(o - jnp.clip(o, b0, b0 + bm))
        hi = jnp.maximum(jnp.abs(b0 - o), jnp.abs(b0 + bm - o))
        return lo, hi

    dxl, dxh = axis_interval(bx0, ox)
    dyl, dyh = axis_interval(by0, oy)
    dzl, dzh = axis_interval(bz0, oz)
    dist_min = jnp.maximum(jnp.sqrt(dxl * dxl + dyl * dyl + dzl * dzl), 1e-3)
    dist_max = jnp.sqrt(dxh * dxh + dyh * dyh + dzh * dzh)

    umin, umax = us[0], us[0]
    vmin, vmax = vs_[0], vs_[0]
    for u_ in us[1:]:
        umin = jnp.minimum(umin, u_)
        umax = jnp.maximum(umax, u_)
    for v_ in vs_[1:]:
        vmin = jnp.minimum(vmin, v_)
        vmax = jnp.maximum(vmax, v_)
    # convexity margin: voxel-centre samples are at +0.5*vs inside corners,
    # projection of the convex hull == hull of corner projections (z>0)
    umin, umax = umin - 1.0, umax + 1.0
    vmin, vmax = vmin - 1.0, vmax + 1.0

    fully_behind = zmax < 0.0
    z_safe = zmin > 1e-3

    # the per-voxel gate is floor(img - 0.5) in (1, W-1) (sampling.py /
    # TsdfFusion.cu:123-124), i.e. img in [2.5, W-0.5); bounds chosen so
    # "fully outside" and "fully inside" are both conservative w.r.t. it
    fully_outside = z_safe & (
        (umax < 2.5) | (umin > W - 0.5) | (vmax < 2.5) | (vmin > H - 0.5)
    )
    fully_inside = (
        z_safe & (umin >= 2.5) & (umax <= W - 1.5) & (vmin >= 2.5) & (vmax <= H - 1.5)
    )
    pr = jnp.where(z_safe, 0.5 * jnp.maximum(umax - umin, vmax - vmin), jnp.inf)
    u = 0.5 * (umin + umax)
    v = 0.5 * (vmin + vmax)

    # choose the mip whose 2x2-cell window covers the footprint. cell >= pr
    # makes the window WIDE enough (2*ts >= the 2*pr footprint) but not
    # necessarily ALIGNED: the window is anchored at the cell containing
    # floor(umin), and a 2*pr-wide footprint starting near the end of a
    # cell straddles THREE cells when pr > ts/2 — the uncovered tail's
    # depths then escape [dmin, dmax] and can silently flip a far/none
    # proof (found by apps/probe_classifier_coverage.py: a real
    # 22-voxel dense-vs-brick divergence on a random pose; regression
    # test tests/test_fusion_brick.py). Fix: bump one level where the
    # aligned window fails to cover the clipped footprint bbox — at
    # level+1 the cell is >= 2*pr, and a <= 2*pr segment anchored at the
    # cell of its own left edge always fits in 2 such cells, so one bump
    # provably suffices (re-checked by the probe).
    if mips is None:
        mips = _depth_mips(depth_m)
    sizes = mips[0]
    sizes_f = jnp.asarray(sizes, jnp.float32)
    base_level = jnp.searchsorted(sizes_f, pr.reshape(-1)).reshape(pr.shape)

    cu = jnp.clip((u - pr).astype(jnp.int32), 0, W - 1)
    cv = jnp.clip((v - pr).astype(jnp.int32), 0, H - 1)

    # the SMALLEST level >= base whose ALIGNED 2x2 window actually covers
    # the clipped footprint bbox. A wide-enough (ts >= pr) window can still
    # be misaligned (a 2*pr footprint straddling three cells) — and with a
    # dense (non-doubling) ladder a single +1 bump does not guarantee
    # coverage either (the round-5 fix's one-bump proof needed ts' >= 2*pr;
    # caught immediately by the bit-equality tests when the 22-level ladder
    # landed). Scanning levels top-down keeps the smallest covering one:
    # pure elementwise arithmetic, no extra gathers.
    ucl = jnp.clip(umax, 0.0, W - 1.0)
    vcl = jnp.clip(vmax, 0.0, H - 1.0)
    level = jnp.full(base_level.shape, len(sizes), base_level.dtype)
    for li in reversed(range(len(sizes))):
        ts_l = int(sizes[li])
        cover = (
            (ucl < (((cu // ts_l) + 2) * ts_l))
            & (vcl < (((cv // ts_l) + 2) * ts_l))
        )
        level = jnp.where(cover & (base_level <= li), li, level)
    level_ok = level < len(sizes)
    level = jnp.clip(level, 0, len(sizes) - 1)
    dmin, dmax, all_valid, cells, cu0, cv0, ts_sel = _footprint_bounds(
        mips, level, cu, cv, per_cell=True
    )

    # per-brick lambda = |(pixel ray) direction| interval over the footprint
    # bbox clipped to the image (sampled pixels are always in-image):
    # lam(u,v) = sqrt(((u-cx)/fx)^2 + ((v-cy)/fy)^2 + 1)
    ucl0 = jnp.clip(umin, 0.0, W - 1.0)
    ucl1 = jnp.clip(umax, 0.0, W - 1.0)
    vcl0 = jnp.clip(vmin, 0.0, H - 1.0)
    vcl1 = jnp.clip(vmax, 0.0, H - 1.0)

    def coord_interval(c0, c1, centre, f):
        a0, a1 = jnp.abs(c0 - centre), jnp.abs(c1 - centre)
        inside = (c0 <= centre) & (centre <= c1)
        lo = jnp.where(inside, 0.0, jnp.minimum(a0, a1)) / builtins.abs(f)
        hi = jnp.maximum(a0, a1) / builtins.abs(f)
        return lo, hi

    xl_lo, xl_hi = coord_interval(ucl0, ucl1, intr.cx, intr.fx)
    yl_lo, yl_hi = coord_interval(vcl0, vcl1, intr.cy, intr.fy)
    lam_min = jnp.sqrt(xl_lo * xl_lo + yl_lo * yl_lo + 1.0)
    lam_max = jnp.sqrt(xl_hi * xl_hi + yl_hi * yl_hi + 1.0)

    proj_ok = z_safe & level_ok

    # NONE: entirely beyond the band behind the surface. Valid for PARTIAL
    # bricks too: out-of-image / invalid-depth voxels never update, and the
    # window bounds cover exactly the in-image valid pixels (a footprint
    # with no valid pixel gives dmax = -inf -> NONE automatically).
    sdf_upper = dmax * lam_max - dist_min
    none_by_band = proj_ok & (sdf_upper < -cfg.trunc_dist)
    # FAR: every voxel in-image, every sample valid, provably sdf > trunc
    sdf_lower = dmin * lam_min - dist_max
    provably_far = proj_ok & all_valid & (sdf_lower > cfg.trunc_dist)

    if split:
        # per-cell far/none tests: each window cell's own depth bounds
        # pair with a lambda interval over (cell rect +- the 0.5 px
        # round-to-sample slack) INTERSECTED with the footprint bbox —
        # pixels a voxel can sample inside cell i lie in both. Continuous
        # projections of gated voxels live in (2, W-0.5), so the clip
        # upper bound is W-0.5 (not W-1).
        ts_f = ts_sel.astype(jnp.float32)
        ub_lo, ub_hi = jnp.clip(umin, 0.0, W - 0.5), jnp.clip(umax, 0.0, W - 0.5)
        vb_lo, vb_hi = jnp.clip(vmin, 0.0, H - 0.5), jnp.clip(vmax, 0.0, H - 0.5)
        far_cells, none_cells = [], []
        for ci, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            x0 = ((cu0 + dx) * ts_sel).astype(jnp.float32) - 0.5
            y0 = ((cv0 + dy) * ts_sel).astype(jnp.float32) - 0.5
            ux0 = jnp.maximum(jnp.clip(x0, 0.0, W - 0.5), ub_lo)
            ux1 = jnp.minimum(jnp.clip(x0 + ts_f, 0.0, W - 0.5), ub_hi)
            uy0 = jnp.maximum(jnp.clip(y0, 0.0, H - 0.5), vb_lo)
            uy1 = jnp.minimum(jnp.clip(y0 + ts_f, 0.0, H - 0.5), vb_hi)
            xi_lo, xi_hi = coord_interval(ux0, jnp.maximum(ux1, ux0), intr.cx, intr.fx)
            yi_lo, yi_hi = coord_interval(uy0, jnp.maximum(uy1, uy0), intr.cy, intr.fy)
            lam_lo = jnp.sqrt(xi_lo * xi_lo + yi_lo * yi_lo + 1.0)
            lam_hi = jnp.sqrt(xi_hi * xi_hi + yi_hi * yi_hi + 1.0)
            mn_i = cells[ci][..., 0]
            mx_i = cells[ci][..., 1]
            av_i = cells[ci][..., 2] > 0.5
            # empty intersection (cell fully outside the bbox) -> no
            # attributable pixels; a degenerate lam interval is harmless
            # for attribution but must not prove anything, EXCEPT the
            # trivially-true cases mn_i = +inf / mx_i = -inf (no valid
            # depth in the cell at all)
            empty = (ux1 < ux0) | (uy1 < uy0)
            far_cells.append(
                av_i & (
                    jnp.isposinf(mn_i)
                    | (~empty & (mn_i * lam_lo - dist_max > cfg.trunc_dist))
                )
            )
            none_cells.append(
                jnp.isneginf(mx_i)
                | (~empty & (mx_i * lam_hi - dist_min < -cfg.trunc_dist))
            )
        far4 = proj_ok & far_cells[0] & far_cells[1] & far_cells[2] & far_cells[3]
        none4 = proj_ok & none_cells[0] & none_cells[1] & none_cells[2] & none_cells[3]
        fn0 = far_cells[0] | none_cells[0]
        fn1 = far_cells[1] | none_cells[1]
        fn2 = far_cells[2] | none_cells[2]
        fn3 = far_cells[3] | none_cells[3]
        mixed = proj_ok & fn0 & fn1 & fn2 & fn3
        farbits = (
            far_cells[0].astype(jnp.int32)
            + 2 * far_cells[1].astype(jnp.int32)
            + 4 * far_cells[2].astype(jnp.int32)
            + 8 * far_cells[3].astype(jnp.int32)
        )
        none_by_band = none_by_band | none4
        provably_far = provably_far | far4
        mixed = mixed & ~none_by_band & ~provably_far
    else:
        mixed = jnp.zeros_like(none_by_band)
        farbits = jnp.zeros(none_by_band.shape, jnp.int32)

    far = provably_far & fully_inside
    # FAR_PARTIAL (class 3): the same proof without full visibility — every
    # IN-IMAGE voxel is provably far (sdf_lower is over the clipped
    # footprint's valid pixels); the fusion core applies the far update
    # under the exact per-voxel in-image mask (no depth gathers), so these
    # bricks no longer burn ACTIVE depth-gather budget
    far_partial = provably_far & ~fully_inside

    none = fully_behind | fully_outside | frustum_out | none_by_band
    cls = jnp.where(none, 0, 2)
    cls = jnp.where(far & ~none, 1, cls)
    cls = jnp.where(far_partial & ~none, 3, cls)
    cls = jnp.where(mixed & ~none, 4, cls)
    # classes 1/3 apply the far update row/mask-wide: every cell is far
    farbits = jnp.where((cls == 1) | (cls == 3), 15, farbits)
    return BrickAux(
        cls=cls.astype(jnp.int32),
        farbits=farbits.astype(jnp.int32),
        win_u0=(cu0 * ts_sel).astype(jnp.int32),
        win_v0=(cv0 * ts_sel).astype(jnp.int32),
        win_ts=ts_sel.astype(jnp.int32),
    )


def classify_bricks_fine(
    depth_m: jnp.ndarray,
    r_v2c_v: jnp.ndarray,
    t_v2c_v: jnp.ndarray,
    intr: Intrinsics,
    cfg: VolumeConfig,
    res: Tuple[int, int, int],
    x_offset=0,
) -> jnp.ndarray:
    """Per-BRICK class derived from 4^3-subcell interval tests: NONE iff
    every subcell is NONE, FAR iff every subcell is FAR, FAR_PARTIAL iff
    every subcell is far-ish, else ACTIVE. Strictly conservative like
    :func:`classify_bricks` (each subcell runs the same interval
    arithmetic on a smaller box with a finer depth-mip footprint) and
    somewhat tighter (bench scene: 2056 -> 1901 ACTIVE bricks; the big
    wins — frustum culling of z-straddling bricks and the masked
    FAR_PARTIAL class — already live in the brick-level classifier, which
    went 3733 -> 2056). Costs ~8x the classification arithmetic (still
    elementwise/VPU); opt-in via ``SlamConfig.fusion_classify_fine`` for
    workloads where the residual cone looseness matters."""
    sub = classify_bricks(
        depth_m, r_v2c_v, t_v2c_v, intr, cfg, res, x_offset=x_offset, cell=4
    )
    nbx, nby, nbz = res[0] // BRICK, res[1] // BRICK, res[2] // BRICK
    s = sub.reshape(nbx, 2, nby, 2, nbz, 2)
    all_none = jnp.all(s == 0, axis=(1, 3, 5))
    all_far = jnp.all(s == 1, axis=(1, 3, 5))
    # every subcell provably far on its in-image part -> the masked far
    # update is valid brick-wide (class 3); a NONE subcell may be
    # none-by-band (in-image voxels that must NOT update), so mixes with
    # NONE stay ACTIVE
    all_farish = jnp.all((s == 1) | (s == 3), axis=(1, 3, 5))
    cls = jnp.where(all_none, 0, jnp.where(all_far, 1, jnp.where(all_farish, 3, 2)))
    return cls.astype(jnp.int32)


def to_bricks(v: jnp.ndarray) -> jnp.ndarray:
    X, Y, Z = v.shape
    return (
        v.reshape(X // BRICK, BRICK, Y // BRICK, BRICK, Z // BRICK, BRICK)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, BRICK * BRICK * BRICK)
    )


def from_bricks(b: jnp.ndarray, res) -> jnp.ndarray:
    X, Y, Z = res
    return (
        b.reshape(X // BRICK, Y // BRICK, Z // BRICK, BRICK, BRICK, BRICK)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(X, Y, Z)
    )


def integrate_brick(
    vol: VolumeState,
    depth_m: jnp.ndarray,
    r_v2c: CSFD,
    t_v2c: CSFD,
    intr: Intrinsics,
    cfg: VolumeConfig,
    bi_threshold: float = 0.0,
    cap: int = 8192,
    x_offset: int = 0,
    classify_fine: bool = False,
    classify_split: bool = False,
    subcell_cap: int = 0,
):
    """Brick-compacted fusion. Returns (VolumeState, overflowed_flag).

    ``cap`` bounds the ACTIVE brick list (and thus the static depth-gather
    count at ``cap*512``). If a frame exceeds it, the overflow bricks are
    left unfused this frame and the flag is set — callers may retry with the
    dense path (the default engine asserts this does not happen on the
    canonical workloads)."""
    res = vol.value.shape
    cls, aux = _classify(
        depth_m, r_v2c, t_v2c, intr, cfg, res, x_offset, classify_fine,
        classify_split,
    )
    vb, gb, wb, overflow = _integrate_rows_core(
        to_bricks(vol.value), to_bricks(vol.grad), to_bricks(vol.weight),
        cls, depth_m, r_v2c, t_v2c, intr, cfg, bi_threshold, cap, x_offset, res,
        aux=aux, subcell_cap=subcell_cap,
    )
    out = VolumeState(
        value=from_bricks(vb, res), grad=from_bricks(gb, res), weight=from_bricks(wb, res)
    )
    return out, overflow


def integrate_rows(
    bvol,
    depth_m: jnp.ndarray,
    r_v2c: CSFD,
    t_v2c: CSFD,
    intr: Intrinsics,
    cfg: VolumeConfig,
    bi_threshold: float = 0.0,
    cap: int = 8192,
    x_offset: int = 0,
    classify_fine: bool = False,
    classify_split: bool = False,
    subcell_cap: int = 0,
):
    """Brick-compacted fusion over a persistent brick-major volume
    (:class:`xslam_tpu.ops.bricks.BrickVolume`): same math as
    :func:`integrate_brick` with zero dense<->brick transposes (the round-1
    layout paid ~50 ms/frame in them — apps/probe_layout.py). Returns
    (BrickVolume, overflowed_flag)."""
    from .bricks import BrickVolume

    res = cfg.resolution
    cls, aux = _classify(
        depth_m, r_v2c, t_v2c, intr, cfg, res, x_offset, classify_fine,
        classify_split,
    )
    vb, gb, wb, overflow = _integrate_rows_core(
        bvol.value, bvol.grad, bvol.weight,
        cls, depth_m, r_v2c, t_v2c, intr, cfg, bi_threshold, cap, x_offset, res,
        aux=aux, subcell_cap=subcell_cap,
    )
    return BrickVolume(value=vb, grad=gb, weight=wb), overflow


def _classify(
    depth_m, r_v2c, t_v2c, intr, cfg, res, x_offset, classify_fine,
    classify_split,
):
    """Shared classifier dispatch: returns (flat cls, flat BrickAux-or-None).
    ``classify_fine`` (4^3 subcell conjunction) takes precedence over
    ``classify_split`` (per-window-cell tests + MIXED class)."""
    if classify_fine:
        cls = classify_bricks_fine(
            depth_m, r_v2c.v, t_v2c.v, intr, cfg, res, x_offset=x_offset
        ).reshape(-1)
        return cls, None
    out = classify_bricks_full(
        depth_m, r_v2c.v, t_v2c.v, intr, cfg, res, x_offset=x_offset,
        split=classify_split,
    )
    aux = (
        BrickAux(*(a.reshape(-1) for a in out)) if classify_split else None
    )
    return out.cls.reshape(-1), aux


def _integrate_rows_core(
    vb, gb, wb, cls, depth_m, r_v2c, t_v2c, intr, cfg, bi_threshold, cap,
    x_offset, res, aux=None, subcell_cap=0,
):
    """Shared fusion core over brick-major rows: FAR pass (elementwise, no
    gathers) + ACTIVE pass (compact, row-gather, exact update, row-scatter).
    ``aux`` (flat :class:`BrickAux`, from the split classifier) enables the
    MIXED class-4 rows: the far update is additionally masked by a
    per-voxel window-cell bit test (still zero depth gathers)."""
    X, Y, Z = res
    NB = (X // BRICK) * (Y // BRICK) * (Z // BRICK)
    vs = cfg.voxel_size

    # ---- FAR pass: elementwise, no gathers --------------------------------
    # class 1 = every voxel far; class 3 = every IN-IMAGE voxel far — the
    # mask recomputes the exact per-voxel gate of fusion._voxel_update
    # (z > 0, floor(img-0.5) in (1, W-1)) from index math: pure VPU work
    # fused into the elementwise update, no gathers. For class-1 rows the
    # mask is provably all-true (fully_inside), keeping the historical
    # bit-exact behaviour. Class 4 (split classifier): far iff the voxel's
    # SAMPLED pixel (round(img), the nearest-neighbour fetch of
    # fusion._voxel_update) lands in a provably-far window cell; voxels in
    # provably-behind-band cells are skipped, exactly as dense would.
    far_rows = ((cls == 1) | (cls == 3) | (cls == 4))[:, None]
    H, W = depth_m.shape
    nby_, nbz_ = (res[1] // BRICK), (res[2] // BRICK)
    bids = jnp.arange(vb.shape[0], dtype=jnp.int32)
    bxa = bids // (nby_ * nbz_)
    bya = (bids // nbz_) % nby_
    bza = bids % nbz_
    lxa = (np.arange(BRICK**3) // (BRICK * BRICK)).astype(np.float32)
    lya = ((np.arange(BRICK**3) // BRICK) % BRICK).astype(np.float32)
    lza = (np.arange(BRICK**3) % BRICK).astype(np.float32)
    fx_ = ((bxa * BRICK).astype(jnp.float32)[:, None] + lxa[None, :] + 0.5 + x_offset) * vs
    fy_ = ((bya * BRICK).astype(jnp.float32)[:, None] + lya[None, :] + 0.5) * vs
    fz_ = ((bza * BRICK).astype(jnp.float32)[:, None] + lza[None, :] + 0.5) * vs
    Rv, tv = r_v2c.v, t_v2c.v
    ccx = Rv[0, 0] * fx_ + Rv[0, 1] * fy_ + Rv[0, 2] * fz_ + tv[0]
    ccy = Rv[1, 0] * fx_ + Rv[1, 1] * fy_ + Rv[1, 2] * fz_ + tv[1]
    ccz = Rv[2, 0] * fx_ + Rv[2, 1] * fy_ + Rv[2, 2] * fz_ + tv[2]
    inv_z = 1.0 / ccz
    img_u = ccx * intr.fx * inv_z + intr.cx
    img_v = ccy * intr.fy * inv_z + intr.cy
    iu = jnp.floor(img_u - 0.5)
    iv = jnp.floor(img_v - 0.5)
    far_mask = far_rows & (inv_z >= 0) & (iu > 1) & (iu < W - 1) & (iv > 1) & (iv < H - 1)
    if aux is not None:
        psx = jnp.round(img_u).astype(jnp.int32)
        psy = jnp.round(img_v).astype(jnp.int32)
        cellx = jnp.clip((psx - aux.win_u0[:, None]) // aux.win_ts[:, None], 0, 1)
        celly = jnp.clip((psy - aux.win_v0[:, None]) // aux.win_ts[:, None], 0, 1)
        bit = (aux.farbits[:, None] >> (celly * 2 + cellx)) & 1
        far_mask = far_mask & (bit > 0)
    w_new = jnp.minimum(wb + 1.0, float(cfg.max_weight))
    # far branch: tsdf sample = (1, 0) (TsdfFusion.cu:154-155)
    val_far = (vb * wb + 1.0) / (wb + 1.0)
    grd_far = (gb * wb) / (wb + 1.0)
    vb = jnp.where(far_mask, val_far, vb)
    gb = jnp.where(far_mask, grd_far, gb)
    wb = jnp.where(far_mask, w_new, wb)

    # ---- ACTIVE pass: compact, gather rows, exact update, scatter ---------
    active = cls == 2
    pos = jnp.cumsum(active.astype(jnp.int32)) - 1
    n_active = pos[-1] + 1
    overflow = n_active > cap
    slot = jnp.where(active & (pos < cap), pos, cap)
    ids = jnp.full((cap + 1,), NB, jnp.int32).at[slot].set(
        jnp.arange(NB, dtype=jnp.int32)
    )[:cap]
    valid_row = ids < NB
    ids_c = jnp.minimum(ids, NB - 1)

    v_rows = jnp.take(vb, ids_c, axis=0)
    g_rows = jnp.take(gb, ids_c, axis=0)
    w_rows = jnp.take(wb, ids_c, axis=0)

    # voxel metric coords for each row: brick origin + local offsets
    nby, nbz = Y // BRICK, Z // BRICK
    bx = ids_c // (nby * nbz)
    by = (ids_c // nbz) % nby
    bz = ids_c % nbz
    lx = (np.arange(BRICK * BRICK * BRICK) // (BRICK * BRICK)).astype(np.float32)
    ly = ((np.arange(BRICK * BRICK * BRICK) // BRICK) % BRICK).astype(np.float32)
    lz = (np.arange(BRICK * BRICK * BRICK) % BRICK).astype(np.float32)
    gx = ((bx * BRICK).astype(jnp.float32)[:, None] + lx[None, :] + 0.5 + x_offset) * vs
    gy = ((by * BRICK).astype(jnp.float32)[:, None] + ly[None, :] + 0.5) * vs
    gz = ((bz * BRICK).astype(jnp.float32)[:, None] + lz[None, :] + 0.5) * vs

    if subcell_cap == 0:
        v_new, g_new, w_new_rows = _voxel_update(
            gx, gy, gz, v_rows, g_rows, w_rows, depth_m, r_v2c, t_v2c, intr,
            cfg, bi_threshold,
        )
    else:
        # ---- two-stage subcell fusion -------------------------------------
        # Re-classify the compacted candidates at 4^3-subcell granularity
        # (the interval machinery on (cap, 8) box origins — 4 window row
        # gathers per subcell, ~82k at cap 2560 vs the 1M a full-grid
        # subcell classify would cost): far/none subcells resolve
        # ELEMENTWISE on the gathered rows, and only ACTIVE subcells issue
        # depth gathers, compacted into 8 per-subcell-id lists with STATIC
        # lane patterns (64 voxels each). Depth-gather bill falls from
        # cap*512 to 8*subcell_cap*64 + the classification fetches.
        sxa = (np.arange(8) // 4).astype(np.float32) * 4.0
        sya = ((np.arange(8) // 2) % 2).astype(np.float32) * 4.0
        sza = (np.arange(8) % 2).astype(np.float32) * 4.0
        box_x = ((bx * BRICK).astype(jnp.float32)[:, None] + sxa[None] + x_offset) * vs
        box_y = ((by * BRICK).astype(jnp.float32)[:, None] + sya[None]) * vs
        box_z = ((bz * BRICK).astype(jnp.float32)[:, None] + sza[None]) * vs
        scls = _classify_boxes(
            depth_m, r_v2c.v, t_v2c.v, intr, cfg, box_x, box_y, box_z,
            4.0 * vs,
        ).cls  # (cap, 8)

        # lane -> subcell id (static): l = lx*64 + ly*8 + lz
        l_arr = np.arange(BRICK**3)
        sub_of_lane = (
            (l_arr // 64 // 4) * 4 + ((l_arr // 8) % 8 // 4) * 2 + (l_arr % 8 // 4)
        ).astype(np.int64)
        scls_vox = scls[:, sub_of_lane]  # (cap, 512), static fancy index

        # far-ish subcells: elementwise far update under the exact per-
        # voxel gate (identical math to the global far pass above)
        Rv2, tv2 = r_v2c.v, t_v2c.v
        rcx = Rv2[0, 0] * gx + Rv2[0, 1] * gy + Rv2[0, 2] * gz + tv2[0]
        rcy = Rv2[1, 0] * gx + Rv2[1, 1] * gy + Rv2[1, 2] * gz + tv2[1]
        rcz = Rv2[2, 0] * gx + Rv2[2, 1] * gy + Rv2[2, 2] * gz + tv2[2]
        r_invz = 1.0 / rcz
        r_iu = jnp.floor(rcx * intr.fx * r_invz + intr.cx - 0.5)
        r_iv = jnp.floor(rcy * intr.fy * r_invz + intr.cy - 0.5)
        r_gate = (
            (r_invz >= 0) & (r_iu > 1) & (r_iu < W - 1)
            & (r_iv > 1) & (r_iv < H - 1)
        )
        far_v = ((scls_vox == 1) | (scls_vox == 3)) & r_gate
        v_new = jnp.where(far_v, (v_rows * w_rows + 1.0) / (w_rows + 1.0), v_rows)
        g_new = jnp.where(far_v, (g_rows * w_rows) / (w_rows + 1.0), g_rows)
        w_new_rows = jnp.where(
            far_v, jnp.minimum(w_rows + 1.0, float(cfg.max_weight)), w_rows
        )

        # ACTIVE subcells: per-subcell-id compaction with static lanes
        lx4 = (np.arange(64) // 16).astype(np.float32)
        ly4 = ((np.arange(64) // 4) % 4).astype(np.float32)
        lz4 = (np.arange(64) % 4).astype(np.float32)
        for s in range(8):
            lanes = np.nonzero(sub_of_lane == s)[0]  # static (64,)
            mask_s = valid_row & (scls[:, s] == 2)
            pos_s = jnp.cumsum(mask_s.astype(jnp.int32)) - 1
            overflow = overflow | (pos_s[-1] + 1 > subcell_cap)
            slot_s = jnp.where(mask_s & (pos_s < subcell_cap), pos_s, subcell_cap)
            rsel = jnp.full((subcell_cap + 1,), cap, jnp.int32).at[slot_s].set(
                jnp.arange(cap, dtype=jnp.int32)
            )[:subcell_cap]
            valid_s = rsel < cap
            rsel_c = jnp.minimum(rsel, cap - 1)

            vv = v_new[rsel_c][:, lanes]
            gg = g_new[rsel_c][:, lanes]
            ww = w_new_rows[rsel_c][:, lanes]
            bxs = bx[rsel_c].astype(jnp.float32) * BRICK + sxa[s]
            bys = by[rsel_c].astype(jnp.float32) * BRICK + sya[s]
            bzs = bz[rsel_c].astype(jnp.float32) * BRICK + sza[s]
            cgx = (bxs[:, None] + lx4[None] + 0.5 + x_offset) * vs
            cgy = (bys[:, None] + ly4[None] + 0.5) * vs
            cgz = (bzs[:, None] + lz4[None] + 0.5) * vs
            v2, g2, w2 = _voxel_update(
                cgx, cgy, cgz, vv, gg, ww, depth_m, r_v2c, t_v2c, intr, cfg,
                bi_threshold,
            )
            keep_s = valid_s[:, None]
            v2 = jnp.where(keep_s, v2, vv)
            g2 = jnp.where(keep_s, g2, gg)
            w2 = jnp.where(keep_s, w2, ww)
            rs = jnp.where(valid_s, rsel_c, cap)  # cap = dropped row
            pad_row = jnp.zeros((1, BRICK**3), jnp.float32)
            v_new = jnp.concatenate([v_new, pad_row]).at[
                rs[:, None], lanes[None, :]
            ].set(v2)[:cap]
            g_new = jnp.concatenate([g_new, pad_row]).at[
                rs[:, None], lanes[None, :]
            ].set(g2)[:cap]
            w_new_rows = jnp.concatenate([w_new_rows, pad_row]).at[
                rs[:, None], lanes[None, :]
            ].set(w2)[:cap]

    keep = valid_row[:, None]
    v_new = jnp.where(keep, v_new, v_rows)
    g_new = jnp.where(keep, g_new, g_rows)
    w_new_rows = jnp.where(keep, w_new_rows, w_rows)

    scatter_ids = jnp.where(valid_row, ids_c, NB)  # NB = dropped row
    vb = jnp.concatenate([vb, jnp.zeros((1, vb.shape[1]), vb.dtype)]).at[scatter_ids].set(v_new)[:NB]
    gb = jnp.concatenate([gb, jnp.zeros((1, gb.shape[1]), gb.dtype)]).at[scatter_ids].set(g_new)[:NB]
    wb = jnp.concatenate([wb, jnp.zeros((1, wb.shape[1]), wb.dtype)]).at[scatter_ids].set(w_new_rows)[:NB]
    return vb, gb, wb, overflow

"""Gather-based image/volume sampling primitives.

The reference's kernels do pointer arithmetic into pitched 2D buffers
(``PtrStep``); on TPU these become flat int32 gathers that XLA lowers to
HBM gather HLOs. All samplers take *dual* coordinates (CSFD) where the
derivative lane flows through the interpolation weights — this is how CSFD
derivatives pass through image sampling (``TsdfFusion.cu:126-143``) and
trilinear volume interpolation (``RayCaster.cu:100-141``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..csfd.single import CSFD, lift


def gather2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray, fill=0.0) -> jnp.ndarray:
    """img[(iy, ix)] with out-of-bounds -> fill. Any index shape."""
    H, W = img.shape
    ok = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    flat = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    vals = jnp.take(img.reshape(-1), flat.reshape(-1), mode="clip").reshape(iy.shape)
    return jnp.where(ok, vals, fill)


def gather3d(vol: jnp.ndarray, ix, iy, iz, fill=0.0) -> jnp.ndarray:
    """vol[(ix, iy, iz)] from an (X, Y, Z) volume, out-of-bounds -> fill."""
    X, Y, Z = vol.shape
    ok = (ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
    flat = (jnp.clip(ix, 0, X - 1) * Y + jnp.clip(iy, 0, Y - 1)) * Z + jnp.clip(iz, 0, Z - 1)
    vals = jnp.take(vol.reshape(-1), flat.reshape(-1), mode="clip").reshape(
        jnp.shape(ix)
    )
    return jnp.where(ok, vals, fill)


def bilinear_depth_sample(
    depth: jnp.ndarray, image_x: CSFD, image_y: CSFD, threshold: float
) -> tuple[CSFD, jnp.ndarray]:
    """Depth lookup used by TSDF fusion (``TsdfFusion.cu:120-143``).

    Bilinear interpolation *in dual image coordinates* (derivative flows
    through the weights) gated by a depth-discontinuity check: if the 2x2
    neighbourhood spread exceeds ``threshold`` or any corner is invalid (0),
    fall back to nearest-neighbour (which carries no coordinate derivative).

    Returns (sampled depth as CSFD, in-bounds mask). The bounds follow the
    reference exactly: corner (floor(x-0.5), floor(y-0.5)) must lie in
    [2, W-2) x [2, H-2).
    """
    H, W = depth.shape
    cx = jnp.floor(image_x.v - 0.5).astype(jnp.int32)
    cy = jnp.floor(image_y.v - 0.5).astype(jnp.int32)
    in_bounds = (cx > 1) & (cy > 1) & (cx < W - 1) & (cy < H - 1)

    d00 = gather2d(depth, cy, cx)
    d10 = gather2d(depth, cy, cx + 1)
    d01 = gather2d(depth, cy + 1, cx)
    d11 = gather2d(depth, cy + 1, cx + 1)
    near_x = jnp.round(image_x.v).astype(jnp.int32)
    near_y = jnp.round(image_y.v).astype(jnp.int32)
    d_near = gather2d(depth, near_y, near_x)

    spread = jnp.maximum(jnp.maximum(d00, d01), jnp.maximum(d10, d11)) - jnp.minimum(
        jnp.minimum(d00, d01), jnp.minimum(d10, d11)
    )
    all_valid = (d00 != 0.0) & (d01 != 0.0) & (d10 != 0.0) & (d11 != 0.0)
    use_interp = (spread < threshold) & all_valid

    a = image_x - (cx.astype(jnp.float32) + 0.5)
    b = image_y - (cy.astype(jnp.float32) + 0.5)
    one = lift(1.0, like=a)
    interp = (
        d00 * ((one - a) * (one - b))
        + d10 * (a * (one - b))
        + d01 * ((one - a) * b)
        + d11 * (a * b)
    )
    out = CSFD(
        jnp.where(use_interp, interp.v, d_near),
        jnp.where(use_interp, interp.g, 0.0),
    )
    return out, in_bounds


def pack_vg_yz(value: jnp.ndarray, grad: jnp.ndarray) -> jnp.ndarray:
    """Pack (value, grad) volumes into y/z-parity row tables for
    single-row-gather dual trilinear taps.

    TPU gathers issue one row per cycle regardless of row width up to ~8
    floats (measured: a scalar gather and an 8-float row gather both cost
    ~35 ns — see BASELINE.md), so fetching the 2x2 (y, z) interpolation
    block of BOTH planes as one 8-float row turns the 16 scalar gathers per
    dual trilinear x-slice into 1.

    Returns a ``(4 * X * (Y//2) * (Z//2), 8)`` table: four parity variants
    (oy, oz) concatenated variant-major; variant (oy, oz) row
    ``(x, j, k)`` holds ``[v, g]`` for voxels ``(x, 2j+oy+dy, 2k+oz+dz)``
    in (dy, dz, plane) order. Out-of-volume y/z taps read the zero padding —
    the same fill value :func:`gather3d` uses.

    Requires even Y and Z.
    """
    X, Y, Z = value.shape
    assert Y % 2 == 0 and Z % 2 == 0, "pack_vg_yz needs even Y/Z extents"
    Y2, Z2 = Y // 2, Z // 2
    vp = jnp.pad(value, ((0, 0), (0, 1), (0, 1)))
    gp = jnp.pad(grad, ((0, 0), (0, 1), (0, 1)))
    tables = []
    for oy in (0, 1):
        for oz in (0, 1):
            v = jax.lax.slice(vp, (0, oy, oz), (X, oy + 2 * Y2, oz + 2 * Z2))
            g = jax.lax.slice(gp, (0, oy, oz), (X, oy + 2 * Y2, oz + 2 * Z2))
            v = v.reshape(X, Y2, 2, Z2, 2)
            g = g.reshape(X, Y2, 2, Z2, 2)
            t = jnp.stack([v, g], axis=-1)  # (X, Y2, 2, Z2, 2, vg)
            t = t.transpose(0, 1, 3, 2, 4, 5)  # (X, Y2, Z2, dy, dz, vg)
            tables.append(t.reshape(X * Y2 * Z2, 8))
    return jnp.concatenate(tables, axis=0)


def trilinear_tsdf_packed(
    packed: jnp.ndarray,
    local_shape,
    px: CSFD,
    py: CSFD,
    pz: CSFD,
    voxel_size: float,
    x_base: int = 0,
    x_total=None,
) -> CSFD:
    """Dual trilinear TSDF interpolation reading a :func:`pack_vg_yz` table.

    Bit-identical to :func:`xslam_tpu.ops.raycast.trilinear_tsdf_shard` on
    the corresponding (value, grad) volumes (same base-cell selection,
    RayCaster.cu:117-122; same ``+1e-5`` bias, RayCaster.cu:77; same tap
    summation order) but issues 2 row gathers per point instead of 16
    scalar gathers. ``x_base``/``x_total`` place a local X-slab in a larger
    sharded volume, like ``ShardSpec``.
    """
    Xl, Y, Z = local_shape
    if x_total is None:
        x_total = Xl
    Y2, Z2 = Y // 2, Z // 2
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
    variant = (gy & 1) * 2 + (gz & 1)
    j = jnp.clip(gy >> 1, 0, Y2 - 1)
    k = jnp.clip(gz >> 1, 0, Z2 - 1)
    stride = Xl * Y2 * Z2

    def fetch(lxd):
        # out-of-slab x reads 0 rows, matching gather3d's 0.0 fill
        inb = (lxd >= 0) & (lxd < Xl)
        lxc = jnp.clip(lxd, 0, Xl - 1)
        row = variant * stride + (lxc * Y2 + j) * Z2 + k
        r = jnp.take(packed, row.reshape(-1), axis=0, mode="clip").reshape(
            *row.shape, 8
        )
        return jnp.where(inb[..., None], r, 0.0)

    r0, r1 = fetch(lx), fetch(lx + 1)

    def tap(r, dy, dz) -> CSFD:
        m = (dy * 2 + dz) * 2
        return CSFD(r[..., m] + 1e-5, r[..., m + 1])

    res = (
        tap(r0, 0, 0) * (a1 * b1 * c1)
        + tap(r0, 0, 1) * (a1 * b1 * c0)
        + tap(r0, 1, 0) * (a1 * b0 * c1)
        + tap(r0, 1, 1) * (a1 * b0 * c0)
        + tap(r1, 0, 0) * (a0 * b1 * c1)
        + tap(r1, 0, 1) * (a0 * b1 * c0)
        + tap(r1, 1, 0) * (a0 * b0 * c1)
        + tap(r1, 1, 1) * (a0 * b0 * c0)
    )
    nan = jnp.float32(jnp.nan)
    return CSFD(jnp.where(ok, res.v, nan), jnp.where(ok, res.g, 0.0))


def trilinear_tsdf(
    value: jnp.ndarray,
    grad: jnp.ndarray,
    px: CSFD,
    py: CSFD,
    pz: CSFD,
    voxel_size: float,
) -> CSFD:
    """Complex/dual trilinear TSDF interpolation at a metric point
    (``RayCaster.cu:100-141``).

    The base cell is chosen from voxel-centre geometry like the reference
    (shift down when the point is below the cell centre); out-of-bounds
    points return NaN value. Each of the 8 taps reads (value, grad) — i.e. a
    dual TSDF sample, the re-packing of ``readTsdf`` (RayCaster.cu:69-78) —
    and weights are dual so coordinate derivatives chain through.
    """
    X, Y, Z = value.shape
    inv_vs = 1.0 / voxel_size

    gx = jnp.floor(px.v * inv_vs).astype(jnp.int32)
    gy = jnp.floor(py.v * inv_vs).astype(jnp.int32)
    gz = jnp.floor(pz.v * inv_vs).astype(jnp.int32)
    ok = (
        (gx > 0) & (gx < X - 1) & (gy > 0) & (gy < Y - 1) & (gz > 0) & (gz < Z - 1)
    )

    # shift base cell if the point is below the voxel centre (RayCaster.cu:117-122)
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
        # +1e-5 bias of readTsdf (RayCaster.cu:77)
        return CSFD(
            gather3d(value, ix, iy, iz) + 1e-5, gather3d(grad, ix, iy, iz)
        )

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

"""Depth preprocessing: bilateral filter, pyramid downsample, vertex/normal
maps, map resizing.

TPU-native re-design of ``XKinectFusion/src/Map.cu``. The CUDA kernels'
per-pixel windowed loops become statically unrolled shifted-array accumulation
(pure VPU work, fused by XLA); the 3-stacked-plane pitched layout
(rows = 3*H, ``Map.cu:74``) becomes a leading channel axis ``(3, H, W)``.

Maps are real f32 here: in the reference pipeline the depth path always
carries zero imaginary part (``bilateralKernel`` writes ``(v, 0)``,
``Map.cu:196-198``); derivatives enter via poses downstream. Lift with
``csfd.single.lift`` where dual maps are needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.intrinsics import Intrinsics

# Map.cu:4-5
SIGMA_COLOR = 30.0  # mm
SIGMA_SPACE = 4.5  # px
BILATERAL_R = 6  # Map.cu:169
DEPTH_MIN_MM = 200.0  # valid sensor range (Map.cu:194, TsdfFusion.cu:77)
DEPTH_MAX_MM = 5000.0


def _shift2d(x: jnp.ndarray, dy: int, dx: int, fill=0.0) -> jnp.ndarray:
    """x shifted so out[y, x] = x[y+dy, x+dx], padded with fill."""
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(-dy, 0), max(dy, 0)),
        (max(-dx, 0), max(dx, 0)),
    ]
    xp = jnp.pad(x, pad, constant_values=fill)
    ys = slice(max(dy, 0), max(dy, 0) + H)
    xs = slice(max(dx, 0), max(dx, 0) + W)
    return xp[..., ys, xs]


def bilateral_filter(depth_u16: jnp.ndarray) -> jnp.ndarray:
    """Edge-preserving smoothing of a uint16 depth map (mm) -> f32 (mm).

    Mirrors ``bilateralKernel`` (Map.cu:155-199): 13x13 window,
    sigma_color=30 mm, sigma_space=4.5 px, result rounded to nearest int and
    zeroed outside [200, 5000] mm. Window edge rule: a neighbour participates
    iff its coordinate is within [0, size-2] (the reference's clamped
    exclusive upper bound never reads the last row/column).
    """
    depth = depth_u16.astype(jnp.float32)
    H, W = depth.shape
    inv_sig_space = 0.5 / (SIGMA_SPACE * SIGMA_SPACE)
    inv_sig_color = 0.5 / (SIGMA_COLOR * SIGMA_COLOR)

    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, :]

    sum1 = jnp.zeros_like(depth)
    sum2 = jnp.zeros_like(depth)
    for dy in range(-BILATERAL_R, BILATERAL_R + 1):
        for dx in range(-BILATERAL_R, BILATERAL_R + 1):
            nbr = _shift2d(depth, dy, dx)
            valid = (
                (ys + dy >= 0) & (ys + dy <= H - 2) & (xs + dx >= 0) & (xs + dx <= W - 2)
            )
            space2 = jnp.float32(dy * dy + dx * dx)
            color2 = (depth - nbr) * (depth - nbr)
            w = jnp.exp(-(space2 * inv_sig_space + color2 * inv_sig_color))
            w = jnp.where(valid, w, 0.0)
            sum1 = sum1 + nbr * w
            sum2 = sum2 + w
    res = jnp.round(sum1 / sum2)
    res = jnp.where((res > DEPTH_MAX_MM) | (res < DEPTH_MIN_MM), 0.0, res)
    return jnp.clip(res, 0.0, 32767.0)


def pyr_down(depth: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution depth with 3-sigma colour rejection
    (``pyrDownKernel``, Map.cu:202-230). Input/output f32 mm.

    Formulated over the four (row, col)-parity planes so every neighbour
    tap is a cheap half-res shift: a shift of (dy, dx) sampled at even
    pixels is the parity plane ``(dy&1, dx&1)`` shifted by
    ``((dy - dy&1)/2, (dx - dx&1)/2)``. The naive form (25 stride-2 slices
    of shifted full-res images) costs ~20 ms/frame on TPU; this one is
    bandwidth-trivial."""
    H, W = depth.shape
    oh, ow = H // 2, W // 2
    planes = jnp.round(depth[: oh * 2, : ow * 2].reshape(oh, 2, ow, 2))
    center = planes[:, 0, :, 0]

    ys = (2 * jnp.arange(oh, dtype=jnp.int32))[:, None]
    xs = (2 * jnp.arange(ow, dtype=jnp.int32))[None, :]

    ssum = jnp.zeros((oh, ow), jnp.float32)
    cnt = jnp.zeros((oh, ow), jnp.float32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            a, b = dy & 1, dx & 1
            nbr = _shift2d(planes[:, a, :, b], (dy - a) // 2, (dx - b) // 2)
            valid = (
                (ys + dy >= 0)
                & (ys + dy <= H - 2)
                & (xs + dx >= 0)
                & (xs + dx <= W - 2)
                & (jnp.abs(nbr - center) < 3 * SIGMA_COLOR)
            )
            ssum = ssum + jnp.where(valid, nbr, 0.0)
            cnt = cnt + valid
    # integer division semantics of the reference (sum/count with ints)
    return jnp.floor(ssum / jnp.maximum(cnt, 1.0))


def create_vmap(intr: Intrinsics, depth_mm: jnp.ndarray) -> jnp.ndarray:
    """Back-project depth (mm) to a camera-space vertex map (3, H, W) in
    metres; invalid pixels are NaN (``computeVmapKernel``, Map.cu:8-29)."""
    H, W = depth_mm.shape
    z = depth_mm / 1000.0
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    vx = z * (u - intr.cx) / intr.fx
    vy = z * (v - intr.cy) / intr.fy
    vmap = jnp.stack([vx, vy, z])
    return jnp.where(z[None] != 0.0, vmap, jnp.nan)


def create_nmap(vmap: jnp.ndarray) -> jnp.ndarray:
    """Cross-product normals from right/down neighbours
    (``computeNmapKernel``, Map.cu:32-70); NaN at invalid or border pixels."""
    v00 = vmap
    v01 = _shift2d(vmap, 0, 1, fill=jnp.nan)  # (u+1, v)
    v10 = _shift2d(vmap, 1, 0, fill=jnp.nan)  # (u, v+1)
    a = v01 - v00
    b = v10 - v00
    n = jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )
    norm = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    n = n / norm
    ok = ~(
        jnp.isnan(v00[0]) | jnp.isnan(v01[0]) | jnp.isnan(v10[0]) | (norm[0] == 0.0)
    )
    return jnp.where(ok[None], n, jnp.nan)


def _resize_map(m: jnp.ndarray, normalize: bool) -> jnp.ndarray:
    """2x2 average downsample of a (3, H, W) map; NaN-propagating
    (``resizeMapKernel``, Map.cu:105-152)."""
    H, W = m.shape[-2], m.shape[-1]
    oh, ow = H // 2, W // 2
    q = m[:, : oh * 2, : ow * 2].reshape(3, oh, 2, ow, 2)
    avg = jnp.mean(q, axis=(2, 4))
    any_nan = jnp.any(jnp.isnan(q[0]), axis=(1, 3))
    if normalize:
        norm = jnp.sqrt(jnp.sum(avg * avg, axis=0, keepdims=True))
        avg = avg / norm
    return jnp.where(any_nan[None], jnp.nan, avg)


def resize_vmap(v: jnp.ndarray) -> jnp.ndarray:
    return _resize_map(v, normalize=False)


def resize_nmap(n: jnp.ndarray) -> jnp.ndarray:
    return _resize_map(n, normalize=True)

"""Camera-relocalization TSDF loss with first AND second derivatives (DCSFD).

TPU-native re-design of the reference's relocalization kernels
(``ComputeLocalTsdfHessianKernel`` / ``ComputeLocalTsdfLossKernel``,
``TsdfFusion.cu:204-447``): given a ground-truth TSDF volume and a candidate
camera pose (a hyper-dual se(3) vector), recompute the per-voxel TSDF error
against the depth frame and reduce loss / directional gradient / directional
second derivative / inlier count to scalars (the reference reduces with four
``thrust::reduce`` passes; here a single fused ``jnp.sum`` each).

Masks mirror the reference exactly: skip voxels with ``gt == 0`` or
``|gt| > 0.95`` (:221-222), behind-camera (:229-231), image-border
(:236-237), depth out of [0.2, 5] m (:260-261), ``|error| > 1`` (:271-272).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..csfd import double as dc
from ..csfd.double import DCSFD
from ..geometry.intrinsics import Intrinsics
from .fusion import VolumeConfig
from .sampling import gather2d


class TsdfLossResult(NamedTuple):
    loss: jnp.ndarray
    grad: jnp.ndarray
    hessian: jnp.ndarray
    count: jnp.ndarray


def _bilinear_depth_dcsfd(depth, image_x: DCSFD, image_y: DCSFD):
    """Hyper-dual bilinear depth sample (TsdfFusion.cu:238-259): interpolate
    when all 4 corners valid, else nearest (no coordinate derivative)."""
    H, W = depth.shape
    cx = jnp.floor(image_x.v - 0.5).astype(jnp.int32)
    cy = jnp.floor(image_y.v - 0.5).astype(jnp.int32)
    in_bounds = (cx > 1) & (cy > 1) & (cx < W - 1) & (cy < H - 1)

    d00 = gather2d(depth, cy, cx)
    d10 = gather2d(depth, cy, cx + 1)
    d01 = gather2d(depth, cy + 1, cx)
    d11 = gather2d(depth, cy + 1, cx + 1)
    d_near = gather2d(depth, jnp.round(image_y.v).astype(jnp.int32),
                      jnp.round(image_x.v).astype(jnp.int32))
    all_valid = (d00 != 0.0) & (d01 != 0.0) & (d10 != 0.0) & (d11 != 0.0)

    a = image_x - (cx.astype(jnp.float32) + 0.5)
    b = image_y - (cy.astype(jnp.float32) + 0.5)
    one = dc.lift(1.0, like=a)
    interp = (
        dc.lift(d00) * (one - a) * (one - b)
        + dc.lift(d10) * a * (one - b)
        + dc.lift(d01) * (one - a) * b
        + dc.lift(d11) * a * b
    )
    dp = dc.where(all_valid, interp, dc.lift(d_near))
    return dp, in_bounds


def tsdf_loss_hessian(
    gt_value: jnp.ndarray,
    depth_m: jnp.ndarray,
    r_v2c: DCSFD,
    t_v2c: DCSFD,
    intr: Intrinsics,
    cfg: VolumeConfig,
    x_offset: int = 0,
    return_field: bool = False,
) -> TsdfLossResult:
    """Per-voxel relocalization loss, reduced to (loss, grad, hess, count).

    ``r_v2c``/``t_v2c``: hyper-dual volume->camera pose (seed directions in
    the e1/e2 lanes select which directional derivative / Hessian entry the
    scalars carry — same mechanism as the reference's DCSFD pose seeds).
    """
    res = gt_value.shape
    vs = cfg.voxel_size
    gx = (jnp.arange(res[0], dtype=jnp.float32) + 0.5 + x_offset)[:, None, None] * vs
    gy = (jnp.arange(res[1], dtype=jnp.float32) + 0.5)[None, :, None] * vs
    gz = (jnp.arange(res[2], dtype=jnp.float32) + 0.5)[None, None, :] * vs

    def R(i, j):
        return DCSFD(r_v2c.v[i, j], r_v2c.e1[i, j], r_v2c.e2[i, j], r_v2c.e12[i, j])

    def t(i):
        return DCSFD(t_v2c.v[i], t_v2c.e1[i], t_v2c.e2[i], t_v2c.e12[i])

    def cam(i):
        return R(i, 0) * dc.lift(gx) + R(i, 1) * dc.lift(gy) + R(i, 2) * dc.lift(gz) + t(i)

    vcx, vcy, vcz = cam(0), cam(1), cam(2)
    inv_z = dc.lift(1.0) / vcz

    gt_ok = (gt_value != 0.0) & (jnp.abs(gt_value) <= 0.95)
    front = inv_z.v >= 0.0

    image_x = vcx * inv_z * intr.fx + intr.cx
    image_y = vcy * inv_z * intr.fy + intr.cy

    dp, in_bounds = _bilinear_depth_dcsfd(depth_m, image_x, image_y)
    range_ok = (dp.v >= 0.2) & (dp.v <= 5.0)

    xl = (image_x - intr.cx) / intr.fx
    yl = (image_y - intr.cy) / intr.fy
    lam2 = xl * xl + yl * yl + dc.lift(1.0)
    distance = dp * dc.sqrt(lam2) - dc.sqrt(vcx * vcx + vcy * vcy + vcz * vcz)

    gt_distance = gt_value * cfg.trunc_dist
    error = (distance - dc.lift(gt_distance)) * (1.0 / cfg.trunc_dist)
    err_ok = jnp.abs(error.v) <= 1.0

    mask = gt_ok & front & in_bounds & range_ok & err_ok
    loss = error * error

    if return_field:
        return loss, mask

    msum = lambda a: jnp.sum(jnp.where(mask, a, 0.0))
    return TsdfLossResult(
        loss=msum(loss.v),
        grad=msum(loss.e1),
        hessian=msum(loss.e12),
        count=jnp.sum(mask),
    )


def tsdf_loss(
    gt_value: jnp.ndarray,
    depth_m: jnp.ndarray,
    r_v2c: jnp.ndarray,
    t_v2c: jnp.ndarray,
    intr: Intrinsics,
    cfg: VolumeConfig,
) -> TsdfLossResult:
    """Real-valued fast path (``ComputeLocalTsdfLossKernel``,
    TsdfFusion.cu:335-410)."""
    z = jnp.zeros_like(r_v2c)
    zt = jnp.zeros_like(t_v2c)
    out = tsdf_loss_hessian(
        gt_value, depth_m, DCSFD(r_v2c, z, z, z), DCSFD(t_v2c, zt, zt, zt), intr, cfg
    )
    return out

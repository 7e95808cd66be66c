"""Projective point-to-plane ICP: correspondence search + normal equations.

TPU-native re-design of ``XKinectFusion/src/ICP.cu``. The reference builds,
per pixel, the dual row ``[cross(s,n), n | n·(d−s)]`` and reduces the 27
upper-triangular entries of the 6x7 system with a two-stage shared-memory
tree (``combinedKernel`` -> ``TransformEstimatorKernel``, ICP.cu:246-429),
in *double-precision* complex. Here the same rows form a dual (N, 6) Jacobian
and the reduction is three f32 MXU matmuls (``A = JᵀJ`` in dual arithmetic,
see :func:`xslam_tpu.csfd.single.matmul`) with a block-pairwise accumulation
that keeps f32 error at f64-like levels for this problem — made possible
because our dual lanes carry O(f') derivatives, not the reference's h-scaled
~1e-7 imaginary parts (which is why it needed f64).

The 12 small device->host downloads per frame (ICP.cu:416-417) disappear:
the 6x6 dual solve runs inside the same jit (``csfd.single.solve``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..csfd import vec3
from ..csfd.single import CSFD, lift, solve
from ..geometry.intrinsics import Intrinsics


class IcpSystem(NamedTuple):
    A: CSFD  # (6, 6) dual normal matrix
    b: CSFD  # (6,) dual rhs
    inlier_count: jnp.ndarray  # scalar


def _pack_prev_maps(vmap_g_prev: CSFD, nmap_g_prev: CSFD) -> jnp.ndarray:
    """Pack the previous-model maps into a ``(H*W, 12)`` row table:
    ``[v.v(3), v.g(3), n.v(3), n.g(3)]`` per pixel. One 12-float row gather
    then replaces the 12 scalar gathers of the projective fetch (TPU row
    gathers up to ~16 floats cost the same as a scalar gather — BASELINE.md).
    """
    cols = jnp.concatenate(
        [vmap_g_prev.v, vmap_g_prev.g, nmap_g_prev.v, nmap_g_prev.g], axis=0
    )  # (12, H, W)
    return cols.reshape(12, -1).T


def _gather_prev_rows(table: jnp.ndarray, H: int, W: int, iy, ix):
    """Row-gather the packed prev maps; out-of-image pixels get the same
    sentinels as per-plane scalar gathers would (NaN values, zero grads)."""
    ok = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    flat = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    r = jnp.take(table, flat.reshape(-1), axis=0, mode="clip").reshape(
        *flat.shape, 12
    )
    r = jnp.moveaxis(r, -1, 0)  # (12, ...)
    nan = jnp.float32(jnp.nan)
    vprev = CSFD(jnp.where(ok, r[0:3], nan), jnp.where(ok, r[3:6], 0.0))
    nprev = CSFD(jnp.where(ok, r[6:9], nan), jnp.where(ok, r[9:12], 0.0))
    return vprev, nprev


class Association(NamedTuple):
    """Cached projective correspondences: the gathered previous-model
    vertices/normals and the projection validity mask."""

    nprev_g: CSFD
    vprev_g: CSFD
    in_img: jnp.ndarray


def associate(
    r_curr: CSFD,
    t_curr: CSFD,
    vmap_curr: jnp.ndarray,
    r_prev_inv: CSFD,
    t_prev: CSFD,
    intr: Intrinsics,
    vmap_g_prev: CSFD,
    nmap_g_prev: CSFD,
) -> Association:
    """Projective data association (``search_newton`` projection + fetches,
    ICP.cu:196-231): transform current vertices into the previous camera,
    project, and gather the model maps. This is the gather-heavy half of an
    ICP iteration; it can be cached across inner iterations
    (fixed-correspondence Gauss-Newton) via ``SlamConfig.icp_fixed_assoc``."""
    H, W = vmap_g_prev.v.shape[-2:]
    vcurr = lift(vmap_curr)
    vcurr_g = vec3.matvec(r_curr, vcurr) + CSFD(
        t_curr.v[:, None, None], t_curr.g[:, None, None]
    )
    diff = vcurr_g - CSFD(t_prev.v[:, None, None], t_prev.g[:, None, None])
    vcurr_cp = vec3.matvec(r_prev_inv, diff)  # prev camera space

    # projection on the value lane (ICP.cu:214-217)
    px = vcurr_cp.v[0] * intr.fx / vcurr_cp.v[2] + intr.cx
    py = vcurr_cp.v[1] * intr.fy / vcurr_cp.v[2] + intr.cy
    ux = jnp.round(px).astype(jnp.int32)
    uy = jnp.round(py).astype(jnp.int32)
    in_img = (ux >= 0) & (uy >= 0) & (ux < W) & (uy < H) & (vcurr_cp.v[2] >= 0)

    table = _pack_prev_maps(vmap_g_prev, nmap_g_prev)
    vprev_g, nprev_g = _gather_prev_rows(table, H, W, uy, ux)
    return Association(nprev_g=nprev_g, vprev_g=vprev_g, in_img=in_img)


def build_system(
    r_curr: CSFD,
    t_curr: CSFD,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    r_prev_inv: CSFD,
    t_prev: CSFD,
    intr: Intrinsics,
    vmap_g_prev: CSFD,
    nmap_g_prev: CSFD,
    dist_thres: float,
    angle_thres: float,
    assoc: "Association | None" = None,
) -> IcpSystem:
    """One ICP iteration's normal equations (``search_newton`` +
    ``combinedKernel``, ICP.cu:196-281).

    ``vmap_curr``/``nmap_curr`` are real (3, H, W) camera-space maps of the
    current frame (their imaginary lanes are always zero in the reference
    too); the previous-model maps are dual world-space maps from raycasting.

    The projection bounds come from the *previous* maps: under row-sharded
    multi-chip ICP the current maps are a row-slab while the projection
    target stays the full image.

    If ``assoc`` is given, the projection+gather step is skipped and the
    cached correspondences are used (validity gates are still re-evaluated
    against the current pose — all elementwise).
    """
    if assoc is None:
        assoc = associate(
            r_curr, t_curr, vmap_curr, r_prev_inv, t_prev, intr,
            vmap_g_prev, nmap_g_prev,
        )
    nprev_g, vprev_g, in_img = assoc.nprev_g, assoc.vprev_g, assoc.in_img

    ncurr = lift(nmap_curr)
    vcurr = lift(vmap_curr)
    vcurr_g = vec3.matvec(r_curr, vcurr) + CSFD(
        t_curr.v[:, None, None], t_curr.g[:, None, None]
    )

    dist = vec3.norm(vprev_g - vcurr_g)
    ncurr_g = vec3.matvec(r_curr, ncurr)
    sine = vec3.norm(vec3.cross(ncurr_g, nprev_g))

    valid = (
        ~jnp.isnan(nmap_curr[0])
        & in_img
        & ~jnp.isnan(nprev_g.v[0])
        & (dist.v <= dist_thres)
        & (sine.v < angle_thres)
    )

    n = nprev_g
    d = vprev_g
    s = vcurr_g
    row_rot = vec3.cross(s, n)  # (3, H, W) dual
    rhs = vec3.dot(n, d - s)  # (H, W) dual

    # mask invalid rows to zero (ICP.cu:260-261)
    def mask3(x: CSFD) -> CSFD:
        return CSFD(
            jnp.where(valid[None], jnp.nan_to_num(x.v), 0.0),
            jnp.where(valid[None], jnp.nan_to_num(x.g), 0.0),
        )

    def mask1(x: CSFD) -> CSFD:
        return CSFD(
            jnp.where(valid, jnp.nan_to_num(x.v), 0.0),
            jnp.where(valid, jnp.nan_to_num(x.g), 0.0),
        )

    row_rot = mask3(row_rot)
    row_n = mask3(n)
    rhs = mask1(rhs)

    # J: (N, 6), r: (N, 1) -> A = JᵀJ, b = Jᵀr as blocked dual matmuls
    J = CSFD(
        jnp.concatenate([row_rot.v, row_n.v]).reshape(6, -1).T,
        jnp.concatenate([row_rot.g, row_n.g]).reshape(6, -1).T,
    )
    r = CSFD(rhs.v.reshape(-1, 1), rhs.g.reshape(-1, 1))

    # block-pairwise accumulation: (B, n, 6) einsum partials then tree-sum,
    # bounding f32 accumulation error (replaces the reference's f64 lanes)
    N = J.v.shape[0]
    n_blocks = max(1, N // 4096)
    while N % n_blocks:
        n_blocks -= 1
    Jb = CSFD(
        J.v.reshape(n_blocks, -1, 6), J.g.reshape(n_blocks, -1, 6)
    )
    rb = CSFD(r.v.reshape(n_blocks, -1, 1), r.g.reshape(n_blocks, -1, 1))

    def bmm(a: CSFD, b: CSFD) -> CSFD:
        # HIGHEST precision: TPU f32 matmuls otherwise run single-pass bf16,
        # which corrupts the normal equations (the reference uses f64 here,
        # Internal.h:21; block-pairwise f32 needs full f32 multiplies)
        f = lambda x, y: jnp.einsum(
            "bni,bnj->bij", x, y,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return CSFD(f(a.v, b.v), f(a.g, b.v) + f(a.v, b.g))

    A = vec_sum(bmm(Jb, Jb))
    b = vec_sum(bmm(Jb, rb))
    b = CSFD(b.v[:, 0], b.g[:, 0])
    return IcpSystem(A=A, b=b, inlier_count=jnp.sum(valid))


def vec_sum(x: CSFD) -> CSFD:
    return CSFD(jnp.sum(x.v, axis=0), jnp.sum(x.g, axis=0))


def compute_optimize_matrix(
    r_curr: CSFD,
    t_curr: CSFD,
    vmap_curr: jnp.ndarray,
    nmap_curr: jnp.ndarray,
    r_prev_inv: CSFD,
    t_prev: CSFD,
    intr: Intrinsics,
    vmap_g_prev: CSFD,
    nmap_g_prev: CSFD,
    dist_thres: float,
    angle_thres: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Task-aware optimization hook: gradient of the point-to-plane loss
    w.r.t. the raw 3x4 pose matrix plus its 12x12 Gauss-Newton Hessian
    (``Combined::computeOptimizeMatrix``, ICP.cu:283-354, host reduction
    :431-490).

    Per correspondence (same association as :func:`build_system`):
    ``L = sum ((M p0_h - p1) . n1)^2`` with ``p0_h = [p0, 1]``; the per-pixel
    Jacobian against entry ``M[i, j]`` is ``2 n1[i] proj p0_h[j]`` and the
    GN Hessian factorizes as ``2 J12^T J12`` with
    ``J12[p, 4i+j] = n1[i] p0_h[j]`` — one MXU matmul instead of the
    reference's 12x12 shared-memory reduction grid.

    Returns (jacobi (3, 4), hessian (12, 12)), value-lane (real) like the
    reference kernel.
    """
    assoc = associate(
        r_curr, t_curr, vmap_curr, r_prev_inv, t_prev, intr,
        vmap_g_prev, nmap_g_prev,
    )
    nprev_g, vprev_g, in_img = assoc.nprev_g, assoc.vprev_g, assoc.in_img

    vcurr = lift(vmap_curr)
    vcurr_g = vec3.matvec(r_curr, vcurr) + CSFD(
        t_curr.v[:, None, None], t_curr.g[:, None, None]
    )
    dist = vec3.norm(vprev_g - vcurr_g)
    ncurr_g = vec3.matvec(r_curr, lift(nmap_curr))
    sine = vec3.norm(vec3.cross(ncurr_g, nprev_g))
    valid = (
        ~jnp.isnan(nmap_curr[0])
        & in_img
        & ~jnp.isnan(nprev_g.v[0])
        & (dist.v <= dist_thres)
        & (sine.v < angle_thres)
    )

    n1 = jnp.where(valid[None], jnp.nan_to_num(nprev_g.v), 0.0)  # (3, H, W)
    p1 = jnp.where(valid[None], jnp.nan_to_num(vprev_g.v), 0.0)
    p0t = jnp.where(valid[None], jnp.nan_to_num(vcurr_g.v), 0.0)
    ones = jnp.where(valid, 1.0, 0.0)
    p0h = jnp.concatenate([jnp.where(valid[None], jnp.nan_to_num(vmap_curr), 0.0),
                           ones[None]])  # (4, H, W)

    proj = jnp.sum((p0t - p1) * n1, axis=0)  # (H, W)

    # J12 rows n1[i] * p0h[j], flattened over pixels
    J12 = (n1[:, None] * p0h[None, :]).reshape(12, -1).T  # (N, 12)
    r = proj.reshape(-1, 1)

    hp = lambda a, b: jnp.matmul(
        a.T, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    jacobi = 2.0 * hp(J12, r).reshape(3, 4)
    hessian = 2.0 * hp(J12, J12)
    return jacobi, hessian


def solve_increment(system: IcpSystem, damping: float = 0.0) -> Tuple[CSFD, jnp.ndarray]:
    """Solve the 6x6 dual system with the reference's degeneracy guard
    (|det| < 1e-15 or NaN -> fail, KinectFusionReconstruction.cpp:203-210).

    ``damping`` > 0 applies Levenberg-style scaled-diagonal damping
    ``A + damping * diag(A)`` — the working realization of the reference's
    dead LM scaffolding (``use_LM`` flag and damp/lambda fields,
    KinectFusionReconstruction.h:74-79, accepted but ignored at
    KinectFusionReconstruction.cpp:161-175).

    Returns (x = [alpha beta gamma tx ty tz] dual, ok flag).
    """
    if damping > 0.0:
        diag = jnp.diagonal(system.A.v)
        system = IcpSystem(
            A=CSFD(system.A.v + damping * jnp.diag(diag), system.A.g),
            b=system.b,
            inlier_count=system.inlier_count,
        )
    det = jnp.linalg.det(system.A.v)
    ok = (jnp.abs(det) >= 1e-15) & ~jnp.isnan(det)
    safe_A = CSFD(
        jnp.where(ok, system.A.v, jnp.eye(6, dtype=jnp.float32)),
        jnp.where(ok, system.A.g, 0.0),
    )
    safe_b = CSFD(jnp.where(ok, system.b.v, 0.0), jnp.where(ok, system.b.g, 0.0))
    x = solve(safe_A, safe_b)
    x_ok = ~jnp.any(jnp.isnan(x.v))
    return CSFD(jnp.nan_to_num(x.v), jnp.nan_to_num(x.g)), ok & x_ok

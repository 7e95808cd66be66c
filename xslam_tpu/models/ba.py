"""Keyframe pose-graph refinement and distributed Schur-complement BA.

New subsystem with no reference counterpart (X-SLAM tracks frame-to-model
only and keeps a pose history vector; there is no backend refinement). Per
the build plan (SURVEY.md §2.E / BASELINE north star): keyframes and map
anchor points are optimized jointly; the anchor (landmark) blocks are
eliminated by Schur complement — their 3x3 inverses are embarrassingly
parallel — and observations are sharded across the ``space`` mesh axis with
the reduced camera-block system assembled by ``lax.psum`` over ICI.

Two layers:

* :func:`pose_graph_gn` — relative-pose factors between keyframes
  (odometry + loop closures), Gauss-Newton on the dense 6K system.
* :func:`schur_ba` — depth-reprojection factors between keyframes and 3-D
  anchor points; Schur-complement reduction to the camera system. Exact
  dense reference: materializes Hcc (K,K,6,6) / Hcl (K,L,6,3), so it is
  only for toy problems and for testing the scalable path against.
* :func:`schur_ba_cg` — the production path: matrix-free preconditioned CG
  on the reduced camera system, O(N + K + L) memory, two small psums per
  CG step when observation-sharded. Use this beyond ~10 keyframes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..csfd import single as cs


def _exp(xi):
    return se3.exp(cs.lift(xi)).v


def _rel_residual(xi_i, xi_j, T_meas_inv):
    """r = vee-approx of T_meas^-1 (T_i^-1 T_j) for small errors (6,)."""
    Ti = _exp(xi_i)
    Tj = _exp(xi_j)
    Ti_inv = jnp.eye(4).at[:3, :3].set(Ti[:3, :3].T).at[:3, 3].set(-Ti[:3, :3].T @ Ti[:3, 3])
    E = T_meas_inv @ (Ti_inv @ Tj)
    rot = jnp.stack(
        [E[2, 1] - E[1, 2], E[0, 2] - E[2, 0], E[1, 0] - E[0, 1]]
    ) * 0.5
    return jnp.concatenate([E[:3, 3], rot])


class PoseGraphResult(NamedTuple):
    poses: jnp.ndarray  # (K, 6)
    residual_history: jnp.ndarray


def pose_graph_gn(
    poses_init: jnp.ndarray,
    edges: jnp.ndarray,
    rel_meas: jnp.ndarray,
    iters: int = 10,
    damping: float = 1e-6,
) -> PoseGraphResult:
    """Gauss-Newton over relative-pose factors; keyframe 0 is gauge-fixed.

    poses_init: (K, 6) se(3); edges: (E, 2) int32 (i, j); rel_meas: (E, 4, 4)
    measured T_i^-1 T_j.
    """
    K = poses_init.shape[0]
    rel_inv = jnp.linalg.inv(rel_meas)

    def residuals(poses_flat):
        poses = poses_flat.reshape(K, 6)

        def one(e):
            i, j = edges[e, 0], edges[e, 1]
            return _rel_residual(poses[i], poses[j], rel_inv[e])

        return jax.vmap(one)(jnp.arange(edges.shape[0])).reshape(-1)

    def body(poses_flat, _):
        r = residuals(poses_flat)
        J = jax.jacfwd(residuals)(poses_flat)
        # gauge fix: zero out keyframe 0 columns
        J = J.at[:, :6].set(0.0)
        H = J.T @ J + damping * jnp.eye(6 * K)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g)
        delta = delta.at[:6].set(0.0)
        new = poses_flat + delta
        return new, jnp.sum(r * r)

    poses_flat, hist = jax.lax.scan(body, poses_init.reshape(-1), None, length=iters)
    return PoseGraphResult(poses=poses_flat.reshape(K, 6), residual_history=hist)


# ---------------------------------------------------------------------------
class BAProblem(NamedTuple):
    """Depth-reprojection BA: observation o says anchor ``anchor_idx[o]``
    seen from keyframe ``frame_idx[o]`` at camera-space position
    ``meas_cam[o]`` (back-projected measured depth)."""

    frame_idx: jnp.ndarray  # (N,) int32
    anchor_idx: jnp.ndarray  # (N,) int32
    meas_cam: jnp.ndarray  # (N, 3)


class BAResult(NamedTuple):
    poses: jnp.ndarray  # (K, 6)
    anchors: jnp.ndarray  # (L, 3)
    residual_history: jnp.ndarray


def _obs_residual(xi, p, meas_cam):
    """3-D residual: anchor transformed to camera minus measurement."""
    T = _exp(xi)
    w2c_R = T[:3, :3].T
    w2c_t = -w2c_R @ T[:3, 3]
    return w2c_R @ p + w2c_t - meas_cam


def schur_ba(
    poses_init: jnp.ndarray,
    anchors_init: jnp.ndarray,
    problem: BAProblem,
    iters: int = 8,
    damping: float = 1e-4,
    axis_name: Optional[str] = None,
) -> BAResult:
    """Gauss-Newton with Schur elimination of the anchor blocks.

    Per iteration: per-observation Jacobians (6 pose, 3 anchor) -> blocks
    ``Hcc (6K,6K)``, ``Hll (L,3,3)``, ``Hcl (K,L,6,3)``, gradients — then the
    reduced camera system ``(Hcc - Hcl Hll^-1 Hlc) dc = -(gc - Hcl Hll^-1 gl)``.

    When ``axis_name`` is given (inside shard_map with observations sharded
    over that axis), every accumulated block is ``lax.psum``'d over it — the
    distributed camera-block reduction over ICI. Keyframe 0 is gauge-fixed.
    """
    K = poses_init.shape[0]
    L = anchors_init.shape[0]
    N = problem.frame_idx.shape[0]

    def reduce_(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def build(poses, anchors):
        def one(o):
            k = problem.frame_idx[o]
            l = problem.anchor_idx[o]
            xi = poses[k]
            p = anchors[l]
            r = _obs_residual(xi, p, problem.meas_cam[o])
            Jc = jax.jacfwd(lambda x: _obs_residual(x, p, problem.meas_cam[o]))(xi)
            Jl = jax.jacfwd(lambda q: _obs_residual(xi, q, problem.meas_cam[o]))(p)
            return k, l, r, Jc, Jl

        ks, ls, rs, Jcs, Jls = jax.vmap(one)(jnp.arange(N))

        Hcc = jnp.zeros((K, K, 6, 6))
        Hll = jnp.zeros((L, 3, 3))
        Hcl = jnp.zeros((K, L, 6, 3))
        gc = jnp.zeros((K, 6))
        gl = jnp.zeros((L, 3))

        Hcc = Hcc.at[ks, ks].add(jnp.einsum("nri,nrj->nij", Jcs, Jcs))
        Hll = Hll.at[ls].add(jnp.einsum("nri,nrj->nij", Jls, Jls))
        Hcl = Hcl.at[ks, ls].add(jnp.einsum("nri,nrj->nij", Jcs, Jls))
        gc = gc.at[ks].add(jnp.einsum("nri,nr->ni", Jcs, rs))
        gl = gl.at[ls].add(jnp.einsum("nri,nr->ni", Jls, rs))
        sq = jnp.sum(rs * rs)
        return (
            reduce_(Hcc), reduce_(Hll), reduce_(Hcl), reduce_(gc), reduce_(gl), reduce_(sq)
        )

    def body(carry, _):
        poses, anchors = carry
        Hcc, Hll, Hcl, gc, gl, sq = build(poses, anchors)

        Hll_inv = jnp.linalg.inv(Hll + damping * jnp.eye(3))  # (L,3,3) parallel
        # S = Hcc - Hcl Hll^-1 Hlc  (camera-block Schur complement)
        tmp = jnp.einsum("klij,ljm->klim", Hcl, Hll_inv)  # (K,L,6,3)
        S = Hcc - jnp.einsum("klim,qlnm->kqin", tmp, Hcl)
        b = gc - jnp.einsum("klim,lm->ki", tmp, gl)

        Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K) + damping * jnp.eye(6 * K)
        bd = b.reshape(6 * K)
        # gauge fix keyframe 0
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (K - 1))])
        Sd = Sd * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        bd = bd * mask
        dc = -jnp.linalg.solve(Sd, bd)
        # back-substitute anchors: dl = -Hll^-1 (gl + Hlc dc)
        dc_k = dc.reshape(K, 6)
        hlc_dc = jnp.einsum("klim,ki->lm", Hcl, dc_k)
        dl = -jnp.einsum("lij,lj->li", Hll_inv, gl + hlc_dc)

        return (poses + dc_k, anchors + dl), sq

    (poses, anchors), hist = jax.lax.scan(
        body, (jnp.asarray(poses_init, jnp.float32), jnp.asarray(anchors_init, jnp.float32)),
        None, length=iters,
    )
    return BAResult(poses=poses, anchors=anchors, residual_history=hist)


_HI = jax.lax.Precision.HIGHEST  # metric math must not drop to bf16 on MXU


def schur_ba_cg(
    poses_init: jnp.ndarray,
    anchors_init: jnp.ndarray,
    problem: BAProblem,
    iters: int = 8,
    damping: float = 1e-4,
    cg_iters: int = 40,
    axis_name: Optional[str] = None,
) -> BAResult:
    """Scalable Schur-complement BA: matrix-free CG on the reduced camera
    system — the production path for real keyframe counts.

    :func:`schur_ba` materializes ``Hcc (K,K,6,6)`` and ``Hcl (K,L,6,3)``
    and solves the reduced system densely: exact, but O(K^2 + K*L) memory and
    dead beyond toy scale. This variant never forms either block. Each
    Gauss-Newton iteration keeps only per-observation Jacobians
    (``Jc (N,3,6)``, ``Jl (N,3,3)``) and the block-diagonal ``Hll (L,3,3)``,
    and solves ``S dc = -(gc - Hcl Hll^-1 gl)`` by conjugate gradients where
    every ``S @ x`` is two segment-sum passes over observations:

        u = Jc x[k]                  (N,3)   per-observation
        Hcc x   = scatter_k Jc^T u           (K,6)
        v       = scatter_l Jl^T u           (L,3)   [psum over shards]
        w       = Hll^-1 v                   (L,3)   block-diagonal
        Hcl w   = scatter_k Jc^T (Jl w[l])   (K,6)
        S x     = Hcc x - Hcl w + damping*x          [psum over shards]

    O(N + K + L) memory, O(cg_iters * N) work per GN step, and under
    ``shard_map`` with observations sharded over ``axis_name`` exactly two
    small collectives per CG step (an (L,3) and a (K,6) psum over ICI) —
    the distributed-BA north star (SURVEY.md §2.E) with communication
    independent of N. Preconditioner: inverse block-diagonal of Hcc
    (6x6 per keyframe). Keyframe 0 is gauge-fixed.
    """
    K = poses_init.shape[0]
    L = anchors_init.shape[0]
    N = problem.frame_idx.shape[0]
    ks, ls = problem.frame_idx, problem.anchor_idx

    def reduce_(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    gauge = jnp.concatenate(
        [jnp.zeros((1, 6), jnp.float32), jnp.ones((K - 1, 6), jnp.float32)]
    )

    def body(carry, _):
        poses, anchors = carry

        def one(o):
            k = ks[o]
            l = ls[o]
            xi = poses[k]
            p = anchors[l]
            r = _obs_residual(xi, p, problem.meas_cam[o])
            Jc = jax.jacfwd(lambda x: _obs_residual(x, p, problem.meas_cam[o]))(xi)
            Jl = jax.jacfwd(lambda q: _obs_residual(xi, q, problem.meas_cam[o]))(p)
            return r, Jc, Jl

        rs, Jcs, Jls = jax.vmap(one)(jnp.arange(N))

        def scat_k(contrib):  # (N,6) -> (K,6)
            return jnp.zeros((K, 6)).at[ks].add(contrib)

        def scat_l(contrib):  # (N,3) -> (L,3)
            return jnp.zeros((L, 3)).at[ls].add(contrib)

        def jcT(u):  # (N,3) -> (N,6)
            return jnp.einsum("nri,nr->ni", Jcs, u, precision=_HI)

        def jlT(u):  # (N,3) -> (N,3)
            return jnp.einsum("nri,nr->ni", Jls, u, precision=_HI)

        gc = reduce_(scat_k(jcT(rs)))
        gl = reduce_(scat_l(jlT(rs)))
        Hll = reduce_(
            jnp.zeros((L, 3, 3)).at[ls].add(
                jnp.einsum("nri,nrj->nij", Jls, Jls, precision=_HI)
            )
        )
        Hll_inv = jnp.linalg.inv(Hll + damping * jnp.eye(3))
        # Jacobi block preconditioner from the Hcc block diagonal
        Hcc_diag = reduce_(
            jnp.zeros((K, 6, 6)).at[ks].add(
                jnp.einsum("nri,nrj->nij", Jcs, Jcs, precision=_HI)
            )
        )
        M_inv = jnp.linalg.inv(Hcc_diag + damping * jnp.eye(6))

        def hll_solve(v):  # (L,3) -> (L,3)
            return jnp.einsum("lij,lj->li", Hll_inv, v, precision=_HI)

        def matvec(x):  # (K,6) -> S x, gauge-masked
            x = x * gauge
            u = jnp.einsum("nri,ni->nr", Jcs, x[ks], precision=_HI)  # (N,3)
            v = reduce_(scat_l(jlT(u)))
            w = hll_solve(v)
            z = jnp.einsum("nri,ni->nr", Jls, w[ls], precision=_HI)  # (N,3)
            sx = reduce_(scat_k(jcT(u)) - scat_k(jcT(z))) + damping * x
            return sx * gauge

        # rhs: b = -(gc - Hcl Hll^-1 gl)
        w0 = hll_solve(gl)
        z0 = jnp.einsum("nri,ni->nr", Jls, w0[ls], precision=_HI)
        b = -(gc - reduce_(scat_k(jcT(z0)))) * gauge

        def precond(r):
            return jnp.einsum("kij,kj->ki", M_inv, r, precision=_HI) * gauge

        # fixed-trip-count preconditioned CG (deterministic under jit and
        # shard_map; every operand here is replicated, so the dot products
        # need no collectives)
        def dot(a, c):
            return jnp.sum(a * c)

        x0 = jnp.zeros((K, 6))
        r0 = b
        z0c = precond(r0)
        p0 = z0c
        rz0 = dot(r0, z0c)

        def cg_step(c, _):
            x, r, p, rz = c
            sp = matvec(p)
            psp = dot(p, sp)
            alpha = jnp.where(psp > 0.0, rz / jnp.maximum(psp, 1e-30), 0.0)
            x = x + alpha * p
            r = r - alpha * sp
            z = precond(r)
            rz_new = dot(r, z)
            beta = jnp.where(rz > 0.0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (dc, _, _, _), _ = jax.lax.scan(
            cg_step, (x0, r0, p0, rz0), None, length=cg_iters
        )
        dc = dc * gauge

        # back-substitute anchors: dl = -Hll^-1 (gl + Hlc dc)
        u = jnp.einsum("nri,ni->nr", Jcs, dc[ks], precision=_HI)
        hlc_dc = reduce_(scat_l(jlT(u)))
        dl = -hll_solve(gl + hlc_dc)

        sq = reduce_(jnp.sum(rs * rs))
        return (poses + dc, anchors + dl), sq

    (poses, anchors), hist = jax.lax.scan(
        body,
        (jnp.asarray(poses_init, jnp.float32), jnp.asarray(anchors_init, jnp.float32)),
        None, length=iters,
    )
    return BAResult(poses=poses, anchors=anchors, residual_history=hist)

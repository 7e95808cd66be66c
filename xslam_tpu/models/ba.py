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
  anchor points; Schur-complement reduction to the camera system.
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

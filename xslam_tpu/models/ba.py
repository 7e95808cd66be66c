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


def pose_graph_cg(
    poses_init: jnp.ndarray,
    edges: jnp.ndarray,
    rel_meas: jnp.ndarray,
    iters: int = 10,
    damping: float = 1e-6,
    cg_iters: int = 50,
) -> PoseGraphResult:
    """Scalable pose-graph Gauss-Newton: edge-wise Jacobians + matrix-free
    preconditioned CG on the normal equations — O(K + E) memory.

    :func:`pose_graph_gn` builds a dense ``jacfwd`` Jacobian and solves a
    dense 6Kx6K system: exact, but quadratic memory/cubic solve beyond a
    few hundred keyframes. This variant (the production path wired into
    ``RecoveringEngine.refine_keyframes``) keeps only per-edge 6x6 Jacobian
    blocks ``(Ji, Jj)`` and evaluates ``H @ x`` as two segment-sum passes
    over edges — the same matrix-free discipline as :func:`schur_ba_cg`;
    tested against the dense solver on small graphs and at 1k+ keyframes
    (tests/test_ba.py). Keyframe 0 is gauge-fixed; Jacobi 6x6 block
    preconditioner."""
    K = poses_init.shape[0]
    E = edges.shape[0]
    rel_inv = jnp.linalg.inv(rel_meas)
    ei, ej = edges[:, 0], edges[:, 1]

    gauge = jnp.concatenate(
        [jnp.zeros((1, 6), jnp.float32), jnp.ones((K - 1, 6), jnp.float32)]
    )

    def body(poses, _):
        def one(e):
            xi, xj = poses[ei[e]], poses[ej[e]]
            r = _rel_residual(xi, xj, rel_inv[e])
            Ji = jax.jacfwd(lambda x: _rel_residual(x, xj, rel_inv[e]))(xi)
            Jj = jax.jacfwd(lambda x: _rel_residual(xi, x, rel_inv[e]))(xj)
            return r, Ji, Jj

        rs, Jis, Jjs = jax.vmap(one)(jnp.arange(E))

        def scat(contrib_i, contrib_j):  # (E,6) x2 -> (K,6)
            out = jnp.zeros((K, 6)).at[ei].add(contrib_i)
            return out.at[ej].add(contrib_j)

        def jT(J, u):  # (E,6,6), (E,6) -> (E,6)
            return jnp.einsum("eri,er->ei", J, u, precision=_HI)

        g = scat(jT(Jis, rs), jT(Jjs, rs)) * gauge

        # Jacobi block preconditioner from the H block diagonal
        Hd = (
            jnp.zeros((K, 6, 6))
            .at[ei].add(jnp.einsum("eri,erj->eij", Jis, Jis, precision=_HI))
            .at[ej].add(jnp.einsum("eri,erj->eij", Jjs, Jjs, precision=_HI))
        )
        M_inv = jnp.linalg.inv(Hd + (damping + 1e-8) * jnp.eye(6))

        def matvec(x):
            x = x * gauge
            u = (
                jnp.einsum("eri,ei->er", Jis, x[ei], precision=_HI)
                + jnp.einsum("eri,ei->er", Jjs, x[ej], precision=_HI)
            )
            return (scat(jT(Jis, u), jT(Jjs, u)) + damping * x) * gauge

        def precond(r):
            return jnp.einsum("kij,kj->ki", M_inv, r, precision=_HI) * gauge

        b = -g
        x0 = jnp.zeros((K, 6))
        r0 = b
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_step_fixed(c, _):
            x, r, p, rz = c
            hp = matvec(p)
            php = jnp.sum(p * hp)
            alpha = jnp.where(php > 0.0, rz / jnp.maximum(php, 1e-30), 0.0)
            x = x + alpha * p
            r = r - alpha * hp
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(rz > 0.0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (dx, _, _, _), _ = jax.lax.scan(
            cg_step_fixed, (x0, r0, p0, rz0), None, length=cg_iters
        )
        return poses + dx * gauge, jnp.sum(rs * rs)

    poses, hist = jax.lax.scan(
        body, jnp.asarray(poses_init, jnp.float32), None, length=iters
    )
    return PoseGraphResult(poses=poses, residual_history=hist)


# ---------------------------------------------------------------------------
def build_ba_problem(
    kf_c2w,
    kf_depths_u16,
    intr,
    stride: int = 8,
    match_dist: float = 0.15,
    min_obs: int = 2,
    z_range: Tuple[float, float] = (0.2, 5.0),
):
    """Derive a depth-reprojection :class:`BAProblem` from LIVE keyframe
    sensor data — the bridge between the SLAM front end and the distributed
    backend (no reference counterpart; SURVEY §2.E north star).

    Anchors: every ``stride``-th valid depth pixel of every keyframe,
    back-projected to world at the keyframe's (estimated) pose. Observations:
    keyframe ``j`` observes anchor ``a`` if the anchor projects inside
    ``j``'s image onto a valid depth pixel whose back-projection lies within
    ``match_dist`` of the anchor in camera space (projective data
    association — the same principle as the front end's ICP association,
    ICP.cu:196-244, applied keyframe-to-keyframe). Only anchors seen from
    >= ``min_obs`` keyframes survive (single-view anchors constrain nothing).

    Host-side numpy (problem construction is per-refinement, not per-frame).
    Returns ``(problem, anchors_init)`` or ``(None, None)`` if no multi-view
    anchors exist.
    """
    K = len(kf_c2w)
    fx, fy, cx, cy = intr.fx, intr.fy, intr.cx, intr.cy
    H, W = np.asarray(kf_depths_u16[0]).shape

    def backproject(depth_m, us, vs):
        z = depth_m[vs, us]
        return np.stack(
            [z * (us - cx) / fx, z * (vs - cy) / fy, z], axis=-1
        )

    depths_m = []
    for d in kf_depths_u16:
        d = np.asarray(d, np.float32)
        m = d / 1000.0
        m[(m < z_range[0]) | (m > z_range[1])] = 0.0
        depths_m.append(m)

    # camera-space vertex + normal maps (numpy twin of preprocess.create_vmap/
    # create_nmap) — normals feed the point-to-plane residuals
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    normal_maps = []
    for m in depths_m:
        vm = np.stack([m * (uu - cx) / fx, m * (vv - cy) / fy, m], axis=-1)
        vm[m == 0] = np.nan
        a = np.full_like(vm, np.nan)
        b = np.full_like(vm, np.nan)
        a[:, :-1] = vm[:, 1:] - vm[:, :-1]  # right neighbour
        b[:-1, :] = vm[1:, :] - vm[:-1, :]  # down neighbour
        n = np.cross(a, b)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        with np.errstate(invalid="ignore"):
            n = n / norm
        normal_maps.append(n)

    # candidate anchors from each keyframe's subsampled vertex map
    anchors_world = []
    anchor_src = []  # keyframe that spawned the anchor
    vs_g, us_g = np.mgrid[stride // 2:H:stride, stride // 2:W:stride]
    us_g, vs_g = us_g.ravel(), vs_g.ravel()
    for k in range(K):
        z = depths_m[k][vs_g, us_g]
        ok = z > 0
        pc = backproject(depths_m[k], us_g[ok], vs_g[ok])  # (n, 3) cam
        T = np.asarray(kf_c2w[k], np.float64)
        pw = pc @ T[:3, :3].T + T[:3, 3]
        anchors_world.append(pw)
        anchor_src.append(np.full(pw.shape[0], k))
    anchors_world = np.concatenate(anchors_world, axis=0)
    anchor_src = np.concatenate(anchor_src, axis=0)
    A = anchors_world.shape[0]
    if A == 0:
        return None, None

    # observations: project every anchor into every keyframe, associate
    # against the measured depth
    obs_frame, obs_anchor, obs_meas, obs_normal = [], [], [], []
    for j in range(K):
        T = np.asarray(kf_c2w[j], np.float64)
        Rw2c, tw2c = T[:3, :3].T, -T[:3, :3].T @ T[:3, 3]
        pc = anchors_world @ Rw2c.T + tw2c  # (A, 3) in cam j
        z = pc[:, 2]
        ok = z > z_range[0]
        u = np.full(A, -1.0)
        v = np.full(A, -1.0)
        u[ok] = pc[ok, 0] * fx / z[ok] + cx
        v[ok] = pc[ok, 1] * fy / z[ok] + cy
        ui = np.round(u).astype(np.int64)
        vi = np.round(v).astype(np.int64)
        ok &= (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ui, vi = np.clip(ui, 0, W - 1), np.clip(vi, 0, H - 1)
        meas = backproject(depths_m[j], ui, vi)  # measured surface point
        ok &= meas[:, 2] > 0
        ok &= np.linalg.norm(meas - pc, axis=-1) < match_dist
        nrm = normal_maps[j][vi, ui]
        ok &= np.isfinite(nrm).all(axis=-1)
        idx = np.nonzero(ok)[0]
        obs_frame.append(np.full(idx.shape[0], j))
        obs_anchor.append(idx)
        obs_meas.append(meas[idx])
        obs_normal.append(nrm[idx])
    obs_frame = np.concatenate(obs_frame)
    obs_anchor = np.concatenate(obs_anchor)
    obs_meas = np.concatenate(obs_meas, axis=0)
    obs_normal = np.concatenate(obs_normal, axis=0)

    # keep anchors observed from >= min_obs DISTINCT keyframes
    counts = np.bincount(obs_anchor, minlength=A)
    keep = counts >= min_obs
    if not keep.any():
        return None, None
    remap = -np.ones(A, np.int64)
    remap[keep] = np.arange(int(keep.sum()))
    sel = keep[obs_anchor]
    problem = BAProblem(
        frame_idx=jnp.asarray(obs_frame[sel], jnp.int32),
        anchor_idx=jnp.asarray(remap[obs_anchor[sel]], jnp.int32),
        meas_cam=jnp.asarray(obs_meas[sel], jnp.float32),
        meas_normal=jnp.asarray(obs_normal[sel], jnp.float32),
    )
    return problem, anchors_world[keep].astype(np.float32)


class BAProblem(NamedTuple):
    """Depth-reprojection BA: observation o says anchor ``anchor_idx[o]``
    seen from keyframe ``frame_idx[o]`` at camera-space position
    ``meas_cam[o]`` (back-projected measured depth). When ``meas_normal``
    is present (camera-space surface normal at the measured pixel) the
    residual is point-to-plane + a down-weighted point-to-point term —
    insensitive to the half-pixel lateral association error that floors
    pure point-to-point on projective associations (same reason the front
    end's ICP is point-to-plane, ICP.cu:256-259)."""

    frame_idx: jnp.ndarray  # (N,) int32
    anchor_idx: jnp.ndarray  # (N,) int32
    meas_cam: jnp.ndarray  # (N, 3)
    meas_normal: Optional[jnp.ndarray] = None  # (N, 3) or None
    # per-observation weight (None = all ones). Weight-0 rows are inert —
    # used to PAD problems to a fixed bucket size so re-association rounds
    # (whose N changes every round) reuse ONE compiled program instead of
    # paying a 30-350 s remote recompile per round (ADVICE round 4).
    obs_weight: Optional[jnp.ndarray] = None  # (N,)


def pad_problem(problem: BAProblem, bucket: int) -> BAProblem:
    """Pad a :class:`BAProblem` with zero-weight observations up to
    ``bucket`` rows (shape-stable across re-association rounds)."""
    N = int(problem.frame_idx.shape[0])
    if N > bucket:
        raise ValueError(f"problem has {N} observations > bucket {bucket}")
    pad = bucket - N
    w = (
        problem.obs_weight
        if problem.obs_weight is not None
        else jnp.ones((N,), jnp.float32)
    )
    if pad == 0:
        return problem._replace(obs_weight=w)

    def zpad(a, val=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], val, a.dtype)]
        )

    return BAProblem(
        frame_idx=zpad(problem.frame_idx),
        anchor_idx=zpad(problem.anchor_idx),
        meas_cam=zpad(problem.meas_cam),
        meas_normal=(
            None if problem.meas_normal is None else zpad(problem.meas_normal)
        ),
        obs_weight=zpad(w),
    )


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


# down-weight of the point-to-point regularizer in the plane residual: the
# plane term carries the pose information; the point term only keeps each
# anchor's tangential position observable (Hll would be rank-1 per
# observation otherwise)
_POINT_WEIGHT = 0.2


def _obs_residual_plane(xi, p, meas_cam, meas_normal):
    """(4,) residual: point-to-plane distance + down-weighted point term."""
    d = _obs_residual(xi, p, meas_cam)
    return jnp.concatenate([jnp.sum(meas_normal * d)[None], _POINT_WEIGHT * d])


def _residual_fn(problem):
    if problem.meas_normal is None:
        base = lambda xi, p, o: _obs_residual(xi, p, problem.meas_cam[o])
    else:
        base = lambda xi, p, o: _obs_residual_plane(
            xi, p, problem.meas_cam[o], problem.meas_normal[o]
        )
    if problem.obs_weight is None:
        return base
    # weight-0 rows (bucket padding) contribute exactly nothing: the
    # residual AND its Jacobians scale by w (weighted least squares)
    return lambda xi, p, o: problem.obs_weight[o] * base(xi, p, o)


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

    res = _residual_fn(problem)

    def build(poses, anchors):
        def one(o):
            k = problem.frame_idx[o]
            l = problem.anchor_idx[o]
            xi = poses[k]
            p = anchors[l]
            r = res(xi, p, o)
            Jc = jax.jacfwd(lambda x: res(x, p, o))(xi)
            Jl = jax.jacfwd(lambda q: res(xi, q, o))(p)
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

    res = _residual_fn(problem)

    def body(carry, _):
        poses, anchors = carry

        def one(o):
            k = ks[o]
            l = ls[o]
            xi = poses[k]
            p = anchors[l]
            r = res(xi, p, o)
            Jc = jax.jacfwd(lambda x: res(x, p, o))(xi)
            Jl = jax.jacfwd(lambda q: res(xi, q, o))(p)
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

"""SE(3) utilities over dual (CSFD) and hyper-dual (DCSFD) scalars.

Replaces the reference's complex Eigen pose math: ``se3Exp``
(``KinectFusionReconstruction.h:176-219``), the per-iteration Euler-XYZ
incremental update (``KinectFusionReconstruction.cpp:212-224``), and 4x4
complex inverses. Works generically over any of the scalar modules
(:mod:`..csfd.single`, :mod:`..csfd.double`) because pose matrices are
represented as dual pytrees of shape ``(4, 4[, ...])`` and all math is done
with the dual operator overloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..csfd import double as dc
from ..csfd import single as cs


def _stack(rows):
    """Stack a list-of-lists of same-type dual scalars into a (R, C, ...) dual."""
    flat = [e for row in rows for e in row]
    n_r, n_c = len(rows), len(rows[0])
    return jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((n_r, n_c) + jnp.shape(xs[0])), *flat
    )


def elem(m, i, j):
    return jax.tree.map(lambda a: a[i, j], m)


def row(m, i):
    return jax.tree.map(lambda a: a[i], m)


def matmul(a, b):
    """Dense dual matmul over small list-indexed matrices (4x4 / 3x3)."""
    n = a.v.shape[0] if hasattr(a, "v") else a[0].shape[0]
    k = b.v.shape[0]
    m = b.v.shape[1]
    rows = []
    for i in range(n):
        r = []
        for j in range(m):
            acc = elem(a, i, 0) * elem(b, 0, j)
            for l in range(1, k):
                acc = acc + elem(a, i, l) * elem(b, l, j)
            r.append(acc)
        rows.append(r)
    return _stack(rows)


def matvec(a, x):
    n = a.v.shape[0]
    k = a.v.shape[1]
    out = []
    for i in range(n):
        acc = elem(a, i, 0) * jax.tree.map(lambda t: t[0], x)
        for l in range(1, k):
            acc = acc + elem(a, i, l) * jax.tree.map(lambda t: t[l], x)
        out.append([acc])
    m = _stack(out)
    return jax.tree.map(lambda t: t[:, 0], m)


def _mod_for(x):
    return dc if isinstance(x, dc.DCSFD) else cs


def identity(mod=cs, batch=()):  # noqa: D103
    one = mod.lift(jnp.ones(batch, jnp.float32))
    zero = mod.lift(jnp.zeros(batch, jnp.float32))
    return _stack(
        [
            [one, zero, zero, zero],
            [zero, one, zero, zero],
            [zero, zero, one, zero],
            [zero, zero, zero, one],
        ]
    )


def from_real(mat: jnp.ndarray, mod=cs):
    """Lift a real (4,4) or (3,3) matrix to a constant dual matrix."""
    return mod.lift(jnp.asarray(mat, jnp.float32))


def exp(xi, mod=None):
    """SE(3) exponential of a 6-dual-vector ``xi = (v, omega)``.

    Mirrors ``KinectFusionReconstruction::se3Exp``
    (KinectFusionReconstruction.h:176-219): Rodrigues with
    ``A = sin(t)/t, B = (1-cos t)/t^2, C = (t - sin t)/t^3`` and ``t = V v``,
    with a series fallback for small angles (branchless here: jnp.where on the
    value lane, derivative lanes selected consistently).
    """
    if mod is None:
        mod = _mod_for(xi)
    g = lambda i: jax.tree.map(lambda a: a[i], xi)
    v = [g(0), g(1), g(2)]
    w = [g(3), g(4), g(5)]

    zero = jax.tree.map(jnp.zeros_like, g(0))
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    small = theta2.v < 1e-12 if hasattr(theta2, "v") else theta2 < 1e-12
    # guard sqrt(0) for derivative lanes
    theta = mod.sqrt(mod.where(small, mod.lift(1.0), theta2))
    s, c = mod.sin(theta), mod.cos(theta)
    A = mod.where(small, mod.lift(1.0) - theta2 / 6.0, s / theta)
    B = mod.where(small, mod.lift(0.5) - theta2 / 24.0, (mod.lift(1.0) - c) / theta2)
    C = mod.where(small, mod.lift(1.0 / 6.0) - theta2 / 120.0, (theta - s) / (theta2 * theta))

    wx, wy, wz = w
    what = [
        [zero, -wz, wy],
        [wz, zero, -wx],
        [-wy, wx, zero],
    ]
    what = _stack(what)
    what2 = matmul(what, what)

    one_s = mod.lift(jnp.ones_like(zero.v if hasattr(zero, "v") else zero))
    eye3 = _stack(
        [[one_s, zero, zero], [zero, one_s, zero], [zero, zero, one_s]]
    )
    R = _mat_add(eye3, _mat_scale(what, A), _mat_scale(what2, B))
    V = _mat_add(eye3, _mat_scale(what, B), _mat_scale(what2, C))
    t = _matvec_scalars(V, v)

    rows = []
    for i in range(3):
        rows.append([elem(R, i, 0), elem(R, i, 1), elem(R, i, 2), t[i]])
    one = mod.lift(jnp.ones_like(zero.v if hasattr(zero, "v") else zero))
    zr = mod.lift(jnp.zeros_like(one.v))
    rows.append([zr, zr, zr, one])
    return _stack(rows)


def _matvec_scalars(M, xs):
    """Multiply a dual matrix by a list of dual scalars; returns a list."""
    out = []
    for i in range(M.v.shape[0]):
        acc = elem(M, i, 0) * xs[0]
        for l in range(1, len(xs)):
            acc = acc + elem(M, i, l) * xs[l]
        out.append(acc)
    return out


def _mat_scale(m, s):
    """Scale a dual matrix by a dual scalar (broadcast over (R,C))."""
    n, k = m.v.shape[0], m.v.shape[1]
    return _stack([[elem(m, i, j) * s for j in range(k)] for i in range(n)])


def _mat_add(*ms):
    out = ms[0]
    for m in ms[1:]:
        out = jax.tree.map(lambda a, b: a + b, out, m)
    return out


def euler_xyz_increment(alpha, beta, gamma, tx, ty, tz, mod=cs):
    """Incremental transform ``Rinc = Rz(gamma) Ry(beta) Rx(alpha)`` plus
    translation, as applied per ICP iteration
    (KinectFusionReconstruction.cpp:212-224)."""
    one = mod.lift(jnp.ones_like(alpha.v if hasattr(alpha, "v") else alpha))
    zero = mod.lift(jnp.zeros_like(one.v))
    ca, sa = mod.cos(alpha), mod.sin(alpha)
    cb, sb = mod.cos(beta), mod.sin(beta)
    cg, sg = mod.cos(gamma), mod.sin(gamma)
    Rx = _stack([[one, zero, zero], [zero, ca, -sa], [zero, sa, ca]])
    Ry = _stack([[cb, zero, sb], [zero, one, zero], [-sb, zero, cb]])
    Rz = _stack([[cg, -sg, zero], [sg, cg, zero], [zero, zero, one]])
    R = matmul(Rz, matmul(Ry, Rx))
    rows = [[elem(R, i, 0), elem(R, i, 1), elem(R, i, 2), [tx, ty, tz][i]] for i in range(3)]
    rows.append([zero, zero, zero, one])
    return _stack(rows)


def inverse(T):
    """Inverse of a dual SE(3) matrix: ``[R^T, -R^T t]``."""
    rows = []
    for i in range(3):
        r = [elem(T, j, i) for j in range(3)]
        ti = -(r[0] * elem(T, 0, 3) + r[1] * elem(T, 1, 3) + r[2] * elem(T, 2, 3))
        rows.append(r + [ti])
    one = jax.tree.map(jnp.ones_like, elem(T, 0, 0))
    zero = jax.tree.map(jnp.zeros_like, elem(T, 0, 0))
    rows.append([zero, zero, zero, one])
    return _stack(rows)


def rotation(T):
    return jax.tree.map(lambda a: a[:3, :3], T)


def translation(T):
    return jax.tree.map(lambda a: a[:3, 3], T)


def compose(a, b):
    return matmul(a, b)


# ----------------------------------------------------------------- real-only
def exp_real(xi: jnp.ndarray) -> jnp.ndarray:
    """Real-valued SE(3) exp for ground-truth pose handling."""
    return exp(cs.lift(jnp.asarray(xi, jnp.float32))).v


def log_real(T) -> jnp.ndarray:
    """SE(3) log (inverse of :func:`exp`): T -> xi = (v, omega), numpy."""
    import numpy as np

    from scipy.spatial.transform import Rotation

    T = np.asarray(T, np.float64)
    R = T[:3, :3]
    w = Rotation.from_matrix(R).as_rotvec()  # robust incl. theta ~ pi
    th = np.linalg.norm(w)
    if th < 1e-8:
        Vinv = np.eye(3)
    else:
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        A = np.sin(th) / th
        B = (1 - np.cos(th)) / th**2
        Vinv = np.eye(3) - 0.5 * K + (1 / th**2) * (1 - A / (2 * B)) * (K @ K)
    v = Vinv @ T[:3, 3]
    return np.concatenate([v, w]).astype(np.float32)


def inverse_real(T: jnp.ndarray) -> jnp.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(R.T)
    out = out.at[:3, 3].set(-R.T @ t)
    return out

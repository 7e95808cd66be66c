"""SE(3) exp / inverse / Euler increment over dual and hyper-dual scalars."""

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.csfd import double as dcm
from xslam_tpu.csfd import single as cs
from xslam_tpu.geometry import se3


def _se3_exp_np(xi):
    """Numpy Rodrigues reference mirroring KinectFusionReconstruction.h:176-219."""
    v, w = np.asarray(xi[:3], np.float64), np.asarray(xi[3:], np.float64)
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-8:
        R = np.eye(3) + K
        V = np.eye(3) + K
    else:
        A, B, C = np.sin(th) / th, (1 - np.cos(th)) / th**2, (th - np.sin(th)) / th**3
        R = np.eye(3) + A * K + B * (K @ K)
        V = np.eye(3) + B * K + C * (K @ K)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def test_exp_matches_reference_formula():
    xi = jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3], jnp.float32)
    T = se3.exp(cs.lift(xi))
    np.testing.assert_allclose(T.v, _se3_exp_np(np.asarray(xi)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(T.g, 0.0, atol=1e-7)


def test_exp_small_angle():
    xi = jnp.array([0.01, 0.02, -0.01, 1e-9, -1e-9, 1e-9], jnp.float32)
    T = se3.exp(cs.lift(xi))
    np.testing.assert_allclose(T.v, _se3_exp_np(np.asarray(xi)), rtol=1e-5, atol=1e-6)
    assert not np.any(np.isnan(T.g))


def test_exp_dual_derivative_vs_jvp():
    """Derivative of exp w.r.t. a direction in se(3) matches jax.jvp of the
    real twin (the CSFD headline capability for pose parameters)."""
    xi0 = jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3], jnp.float32)
    d = jnp.array([0.3, 0.1, -0.2, 0.05, -0.1, 0.2], jnp.float32)

    T = se3.exp(cs.CSFD(xi0, d))

    real_exp = lambda x: se3.exp(cs.lift(x)).v
    val, tang = jax.jvp(real_exp, (xi0,), (d,))
    np.testing.assert_allclose(T.v, val, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(T.g, tang, rtol=1e-3, atol=1e-5)


def test_exp_hyperdual_second_derivative():
    """DCSFD through exp: hessian lane matches finite differences of the
    first derivative along the same direction."""
    xi0 = np.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3], np.float32)
    d = np.array([0.3, 0.1, -0.2, 0.05, -0.1, 0.2], np.float32)

    T = se3.exp(dcm.seed(jnp.asarray(xi0), jnp.asarray(d)), mod=dcm)

    f = lambda s: _se3_exp_np(np.asarray(xi0 + s * d, np.float64))
    eps = 1e-4
    hess_fd = (f(eps) - 2 * f(0.0) + f(-eps)) / eps**2
    np.testing.assert_allclose(T.e12, hess_fd, rtol=2e-2, atol=2e-3)


def test_inverse():
    xi = cs.lift(jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3], jnp.float32))
    T = se3.exp(xi)
    TT = se3.matmul(T, se3.inverse(T))
    np.testing.assert_allclose(TT.v, np.eye(4), atol=1e-5)


def test_euler_increment_matches_reference_composition():
    """Rinc = Rz(g) Ry(b) Rx(a) (KinectFusionReconstruction.cpp:216-218)."""
    a, b, g = 0.1, -0.2, 0.3
    inc = se3.euler_xyz_increment(
        *[cs.lift(jnp.float32(x)) for x in (a, b, g)],
        *[cs.lift(jnp.float32(x)) for x in (1.0, 2.0, 3.0)],
    )

    def rot(axis, th):
        c, s = np.cos(th), np.sin(th)
        if axis == 0:
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == 1:
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    R = rot(2, g) @ rot(1, b) @ rot(0, a)
    np.testing.assert_allclose(inc.v[:3, :3], R, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(inc.v[:3, 3], [1.0, 2.0, 3.0], rtol=1e-6)


def test_batched_exp():
    xi = cs.lift(jnp.zeros((6, 5), jnp.float32))  # batch of 5 along trailing axis
    T = se3.exp(xi)
    assert T.v.shape == (4, 4, 5)
    np.testing.assert_allclose(T.v[:, :, 2], np.eye(4), atol=1e-6)

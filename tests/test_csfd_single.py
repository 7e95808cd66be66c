"""CSFD first-order core: analytic derivatives, jax.jvp twins, and parity
with the reference's h-scaled complex rules (test_CSFD/main.cpp:18-86)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xslam_tpu.csfd import rawcomplex as rc
from xslam_tpu.csfd import single as cs
from xslam_tpu.csfd.single import CSFD


def _check(fun_cs, fun_real, x0, rtol=1e-5):
    """CSFD derivative of fun at x0 must match jax.jvp of the real twin."""
    x = cs.seed(jnp.float32(x0))
    out = fun_cs(x)
    val, tang = jax.jvp(fun_real, (jnp.float32(x0),), (jnp.float32(1.0),))
    np.testing.assert_allclose(out.v, val, rtol=rtol)
    np.testing.assert_allclose(out.g, tang, rtol=rtol)


@pytest.mark.parametrize(
    "fun_cs,fun_real,x0",
    [
        (cs.sqrt, jnp.sqrt, 2.3),
        (cs.exp, jnp.exp, 0.7),
        (cs.log, jnp.log, 1.9),
        (cs.sin, jnp.sin, 0.6),
        (cs.cos, jnp.cos, 0.6),
        (cs.tan, jnp.tan, 0.4),
        (cs.sinh, jnp.sinh, 0.3),
        (cs.cosh, jnp.cosh, 0.3),
        (cs.atan, jnp.arctan, 0.8),
        (lambda x: cs.powi(x, 3), lambda x: x**3, 1.4),
        (cs.abs, jnp.abs, -1.2),
        (lambda x: x * x + 2.0 * x - x / (x + 1.0), lambda x: x * x + 2 * x - x / (x + 1), 0.9),
    ],
)
def test_unary_vs_jvp(fun_cs, fun_real, x0):
    _check(fun_cs, fun_real, x0)


def test_atan2_vs_jvp():
    y = cs.seed(jnp.float32(0.7), 1.0)
    x = cs.seed(jnp.float32(-1.3), 0.5)
    out = cs.atan2(y, x)
    val, tang = jax.jvp(
        jnp.arctan2, (jnp.float32(0.7), jnp.float32(-1.3)), (jnp.float32(1.0), jnp.float32(0.5))
    )
    np.testing.assert_allclose(out.v, val, rtol=1e-5)
    np.testing.assert_allclose(out.g, tang, rtol=1e-5)


def test_accelerated_equals_raw_as_h_to_0():
    """The dual rules are the h->0 limit of both the raw and the accelerated
    reference complex rules (test_CSFD/main.cpp value agreement prints)."""
    a_v, a_g = 0.5, 1.0
    b_v, b_g = -1.5, 1.0
    da = CSFD(jnp.float32(a_v), jnp.float32(a_g))
    db = CSFD(jnp.float32(b_v), jnp.float32(b_g))

    with jax.enable_x64(True):
        h = jnp.float64(1e-9)
        a = rc.C(jnp.float64(a_v), h * a_g)
        b = rc.C(jnp.float64(b_v), h * b_g)
        for raw, our, dual in [
            (rc.mul_raw(a, b), rc.mul_our(a, b), da * db),
            (rc.div_raw(a, b), rc.div_our(a, b), da / db),
            (rc.exp_raw(rc.C(a.re + b.re, a.im + b.im)), rc.exp_our(rc.C(a.re + b.re, a.im + b.im)), cs.exp(da + db)),
            (rc.sin_raw(rc.C(a.re + b.re, a.im + b.im)), rc.sin_our(rc.C(a.re + b.re, a.im + b.im)), cs.sin(da + db)),
            (rc.pow_raw(rc.C(a.re + b.re, a.im + b.im), 3), rc.pow_our(rc.C(a.re + b.re, a.im + b.im), 3), cs.powi(da + db, 3)),
        ]:
            np.testing.assert_allclose(float(raw.re), float(dual.v), rtol=1e-6)
            np.testing.assert_allclose(float(our.re), float(dual.v), rtol=1e-6)
            np.testing.assert_allclose(float(raw.im) / float(h), float(dual.g), rtol=1e-5)
            np.testing.assert_allclose(float(our.im) / float(h), float(dual.g), rtol=1e-5)


def test_vectorized_shapes():
    x = cs.seed(jnp.linspace(0.1, 2.0, 640, dtype=jnp.float32))
    y = cs.sin(x) * x + cs.sqrt(x)
    assert y.v.shape == (640,)
    dref = jax.vmap(jax.grad(lambda t: jnp.sin(t) * t + jnp.sqrt(t)))(x.v)
    np.testing.assert_allclose(y.g, dref, rtol=1e-5)


def test_where_and_clip():
    x = CSFD(jnp.array([0.5, 2.0], jnp.float32), jnp.ones(2, jnp.float32))
    c = cs.clip_value(x, 0.0, 1.0)
    np.testing.assert_allclose(c.v, [0.5, 1.0])
    np.testing.assert_allclose(c.g, [1.0, 0.0])  # derivative gated at clamp


def test_matmul_dual():
    k = jax.random.PRNGKey(0)
    av, ag, bv, bg = (jax.random.normal(jax.random.fold_in(k, i), (16, 16)) for i in range(4))
    out = cs.matmul(CSFD(av, ag), CSFD(bv, bg))
    f = lambda a, b: a @ b
    val, tang = jax.jvp(f, (av, bv), (ag, bg))
    np.testing.assert_allclose(out.v, val, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.g, tang, rtol=1e-4, atol=1e-5)


def test_solve_dual():
    k = jax.random.PRNGKey(1)
    av = jax.random.normal(jax.random.fold_in(k, 0), (6, 6)) + 6 * jnp.eye(6)
    ag = 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (6, 6))
    bv = jax.random.normal(jax.random.fold_in(k, 2), (6,))
    bg = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (6,))
    out = cs.solve(CSFD(av, ag), CSFD(bv, bg))
    val, tang = jax.jvp(jnp.linalg.solve, (av, bv), (ag, bg))
    np.testing.assert_allclose(out.v, val, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.g, tang, rtol=1e-3, atol=1e-4)


def test_pytree_jit():
    @jax.jit
    def f(x: CSFD) -> CSFD:
        return cs.sin(x * x)

    x = cs.seed(jnp.float32(0.5))
    y = f(x)
    np.testing.assert_allclose(y.g, 2 * 0.5 * np.cos(0.25), rtol=1e-5)


def test_extended_op_surface_vs_jax_grad():
    """A1 completeness (cuda_complex.hpp:485-942): tanh/atanh/asinh/acosh/
    log10/general pow derivatives must match jax.grad of the real twin."""
    pairs = [
        (cs.tanh, jnp.tanh, 0.7),
        (cs.atanh, jnp.arctanh, 0.3),
        (cs.asinh, jnp.arcsinh, 0.9),
        (cs.acosh, jnp.arccosh, 1.7),
        (cs.log10, jnp.log10, 2.5),
    ]
    for op, ref, x0 in pairs:
        y = op(cs.seed(jnp.float32(x0)))
        np.testing.assert_allclose(y.v, ref(x0), rtol=1e-6)
        np.testing.assert_allclose(
            y.g, jax.grad(ref)(jnp.float32(x0)), rtol=1e-5, atol=1e-6
        )

    # general pow: dual base AND dual exponent, validated against jvp
    xv, yv = jnp.float32(1.7), jnp.float32(2.3)
    out = cs.pow(cs.seed(xv, 1.0), cs.seed(yv, 0.5))
    val, tang = jax.jvp(lambda a, b: a**b, (xv, yv), (jnp.float32(1.0), jnp.float32(0.5)))
    np.testing.assert_allclose(out.v, val, rtol=1e-6)
    np.testing.assert_allclose(out.g, tang, rtol=1e-5)


def test_polar_and_conj():
    rho = cs.seed(jnp.float32(2.0), 1.0)
    theta = cs.seed(jnp.float32(0.6), 0.0)
    re, im = cs.polar(rho, theta)
    np.testing.assert_allclose(re.v, 2.0 * np.cos(0.6), rtol=1e-6)
    np.testing.assert_allclose(im.v, 2.0 * np.sin(0.6), rtol=1e-6)
    # d/drho of rho*cos(theta) = cos(theta)
    np.testing.assert_allclose(re.g, np.cos(0.6), rtol=1e-6)
    np.testing.assert_allclose(im.g, np.sin(0.6), rtol=1e-6)
    # default theta=0 (reference's polar(rho) overload)
    re0, im0 = cs.polar(cs.seed(jnp.float32(3.0)))
    np.testing.assert_allclose(re0.v, 3.0)
    np.testing.assert_allclose(im0.v, 0.0)

    c = cs.conj(cs.seed(jnp.float32(1.5), 2.0))
    np.testing.assert_allclose(c.v, 1.5)
    np.testing.assert_allclose(c.g, -2.0)


def test_raycast_march_mode_validation():
    """Unknown march modes must raise, not silently fall back (ADVICE r1)."""
    import pytest

    from xslam_tpu.geometry.intrinsics import Intrinsics
    from xslam_tpu.ops import fusion, raycast

    vol_cfg = fusion.VolumeConfig((16, 16, 16), 0.12, 0.36, 100)
    vol = fusion.create_volume(vol_cfg)
    intr = Intrinsics(fx=20.0, fy=-20.0, cx=7.5, cy=5.5, width=16, height=12)
    eye = cs.lift(jnp.eye(3, dtype=jnp.float32))
    zero = cs.lift(jnp.zeros(3, jnp.float32))
    with pytest.raises(ValueError, match="march_mode"):
        raycast.raycast(vol, eye, zero, eye, zero, intr, vol_cfg, march_mode="heir2")

"""DCSFD (hyper-dual) core: reproduces the reference's second-order
chain-rule check (test_CSFD/main.cpp:194-219) and validates against
jax.hessian on real twins and a numpy emulation of d_complex."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xslam_tpu.csfd import double as dc
from xslam_tpu.csfd.double import DCSFD


def _f1(x, y):
    return (x + y) * (x + y)


def test_chain_rule_check_reference_part2():
    """f1(x,y)=(x+y)^2, x=t*t, y=sin(t), t=0.5 — DCSFD grad & hessian must
    match the manual chain-rule composition, exactly as in the reference demo."""
    t = dc.seed(jnp.float32(0.5))
    x = t * t
    y = dc.sin(t)
    loss = _f1(x, y)

    # analytic: u = t^2 + sin t; f = u^2
    t0 = 0.5
    u = t0**2 + np.sin(t0)
    du = 2 * t0 + np.cos(t0)
    ddu = 2 - np.sin(t0)
    grad_ref = 2 * u * du
    hess_ref = 2 * du * du + 2 * u * ddu

    np.testing.assert_allclose(float(loss.grad()), grad_ref, rtol=1e-5)
    np.testing.assert_allclose(float(loss.hessian()), hess_ref, rtol=1e-4)

    # cross-partial evaluation path (test_CSFD/main.cpp:208-216)
    x0, y0 = float(x.value()), float(y.value())
    fxy = _f1(dc.seed_cross(x0, 1.0, 0.0), dc.seed_cross(y0, 0.0, 1.0))
    np.testing.assert_allclose(float(fxy.hessian()), 2.0, rtol=1e-5)  # d2f/dxdy = 2


@pytest.mark.parametrize(
    "fun_dc,fun_real,x0",
    [
        (dc.sqrt, jnp.sqrt, 2.3),
        (dc.exp, jnp.exp, 0.7),
        (dc.log, jnp.log, 1.9),
        (dc.sin, jnp.sin, 0.6),
        (dc.cos, jnp.cos, 0.6),
        (lambda x: dc.powi(x, 4), lambda x: x**4, 1.3),
        (lambda x: (x * x + 1.0) / (x + 2.0), lambda x: (x * x + 1) / (x + 2), 0.8),
    ],
)
def test_second_derivatives_vs_jax(fun_dc, fun_real, x0):
    out = fun_dc(dc.seed(jnp.float32(x0)))
    g = jax.grad(fun_real)(jnp.float32(x0))
    h = jax.grad(jax.grad(fun_real))(jnp.float32(x0))
    np.testing.assert_allclose(float(out.grad()), g, rtol=1e-4)
    np.testing.assert_allclose(float(out.hessian()), h, rtol=1e-3, atol=1e-5)


def _dcomplex_np(op, a, b, h=1e-5):
    """Numpy emulation of the reference d_complex (complex-of-complex with
    full inner complex arithmetic, cuda_double_complex.hpp:119-133)."""
    are, aim = a
    bre, bim = b
    if op == "mul":
        re = are * bre - aim * bim
        im = aim * bre + are * bim
    elif op == "div":
        r = are * bre + aim * bim
        n = bre * bre + bim * bim
        im = (aim * bre - are * bim) / n
        re = r / n
    return re, im


@pytest.mark.parametrize("op", ["mul", "div"])
def test_hyperdual_is_h_limit_of_dcomplex(op):
    h = 1e-5
    av, ag, bv, bg = 0.8, 1.0, -1.7, 0.6
    a = (complex(av, h * ag), complex(h * ag, 0))
    b = (complex(bv, h * bg), complex(h * bg, 0))
    re, im = _dcomplex_np(op, a, b, h)

    da = dc.seed(jnp.float32(av), ag)
    db = dc.seed(jnp.float32(bv), bg)
    out = da * db if op == "mul" else da / db

    np.testing.assert_allclose(float(out.value()), re.real, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(float(out.grad()), re.imag / h, rtol=1e-3)
    np.testing.assert_allclose(float(out.hessian()), im.imag / h / h, rtol=1e-3, atol=1e-4)


def test_vectorized_and_jit():
    @jax.jit
    def f(t: DCSFD) -> DCSFD:
        return dc.sin(t * t) + dc.exp(t) / (t + 2.0)

    t0 = jnp.linspace(0.1, 1.5, 128, dtype=jnp.float32)
    out = f(dc.seed(t0))
    freal = lambda t: jnp.sin(t * t) + jnp.exp(t) / (t + 2.0)
    g = jax.vmap(jax.grad(freal))(t0)
    h = jax.vmap(jax.grad(jax.grad(freal)))(t0)
    np.testing.assert_allclose(out.grad(), g, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(out.hessian(), h, rtol=1e-2, atol=1e-4)

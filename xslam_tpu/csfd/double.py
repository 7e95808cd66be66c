"""Second-order CSFD (DCSFD) as hyper-dual numbers.

The reference's ``d_complex``/``DoubleComplex`` is a complex-of-complex
("complex-step of complex-step") number
(``/root/reference/DeviceArray/include/cuda_double_complex.hpp:16-134``,
``DoubleComplex.cpp``): seeded as ``re=(x, h), im=(h, 0)``
(``DoubleComplex.cpp:61-66``), after evaluating f the first derivative is
``re.imag/h`` and the second derivative is ``im.imag/h^2``
(``test_CSFD/main.cpp:194-219``).

Taking the h->0 limit of the complex-of-complex product rule gives exactly
hyper-dual arithmetic over slots ``(v, e1, e2, e12)``:

    value:  v
    e1:     d/dt seeded through the outer complex lane  (ref re.imag/h)
    e2:     d/dt seeded through the inner complex lane  (ref im.real/h)
    e12:    second derivative                           (ref im.imag/h^2)

We store the four slots as four same-shaped f32 arrays (pytree), which is
faster (no h-scaled tiny numbers, no O(h^2) junk terms) and exact. The
standard seed matches the reference: e1 = e2 = direction, e12 = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import single as cs


class DCSFD(NamedTuple):
    """Hyper-dual number ``v + e1·d1 + e2·d2 + e12·d12``."""

    v: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    e12: jnp.ndarray

    # accessors mirroring d_complex (cuda_double_complex.hpp:47-55)
    def value(self):
        return self.v

    def grad(self):
        return self.e1

    def hessian(self):
        return self.e12

    @property
    def dtype(self):
        return jnp.result_type(self.v)

    def __add__(self, o):
        o = lift(o, like=self)
        return DCSFD(self.v + o.v, self.e1 + o.e1, self.e2 + o.e2, self.e12 + o.e12)

    __radd__ = __add__

    def __neg__(self):
        return DCSFD(-self.v, -self.e1, -self.e2, -self.e12)

    def __sub__(self, o):
        o = lift(o, like=self)
        return DCSFD(self.v - o.v, self.e1 - o.e1, self.e2 - o.e2, self.e12 - o.e12)

    def __rsub__(self, o):
        return lift(o, like=self).__sub__(self)

    def __mul__(self, o):
        # h->0 limit of d_complex::operator*= (cuda_double_complex.hpp:119-125)
        o = lift(o, like=self)
        return DCSFD(
            self.v * o.v,
            self.e1 * o.v + self.v * o.e1,
            self.e2 * o.v + self.v * o.e2,
            self.e12 * o.v + self.e1 * o.e2 + self.e2 * o.e1 + self.v * o.e12,
        )

    __rmul__ = __mul__

    def __truediv__(self, o):
        # h->0 limit of d_complex::operator/= (cuda_double_complex.hpp:126-133)
        o = lift(o, like=self)
        q = 1.0 / o.v
        v = self.v * q
        e1 = (self.e1 - v * o.e1) * q
        e2 = (self.e2 - v * o.e2) * q
        e12 = (self.e12 - e1 * o.e2 - e2 * o.e1 - v * o.e12) * q
        return DCSFD(v, e1, e2, e12)

    def __rtruediv__(self, o):
        return lift(o, like=self).__truediv__(self)

    # comparisons on value lane (DoubleComplex.cpp:248-276)
    def __lt__(self, o):
        return self.v < _val(o)

    def __le__(self, o):
        return self.v <= _val(o)

    def __gt__(self, o):
        return self.v > _val(o)

    def __ge__(self, o):
        return self.v >= _val(o)


def _val(x):
    if isinstance(x, DCSFD):
        return x.v
    return jnp.asarray(x)


def lift(x, like: DCSFD | None = None) -> DCSFD:
    if isinstance(x, DCSFD):
        return x
    dtype = like.dtype if like is not None else jnp.float32
    xv = jnp.asarray(x, dtype)
    z = jnp.zeros_like(xv)
    return DCSFD(xv, z, z, z)


def seed(x, direction=1.0) -> DCSFD:
    """Standard DCSFD perturbation: ``re=(x,h), im=(h,0)`` with unit h.

    Reference: DoubleComplex::addPerturbation (DoubleComplex.cpp:61-66) and
    the test seed ``DoubleComplex(x, h, h, 0)`` (test_CSFD/main.cpp:195,208).
    """
    xv = jnp.asarray(x, jnp.float32)
    d = jnp.broadcast_to(jnp.asarray(direction, xv.dtype), xv.shape)
    return DCSFD(xv, d, d, jnp.zeros_like(xv))


def seed_cross(x, d1, d2) -> DCSFD:
    """Mixed-partial seed: ``DoubleComplex(x, h*d1, h*d2, 0)`` of the
    reference's cross-term evaluation (test_CSFD/main.cpp:212)."""
    xv = jnp.asarray(x, jnp.float32)
    b = lambda d: jnp.broadcast_to(jnp.asarray(d, xv.dtype), xv.shape)
    return DCSFD(xv, b(d1), b(d2), jnp.zeros_like(xv))


# ---------------------------------------------------------------- elementwise
def _unary(x: DCSFD, f, df, ddf) -> DCSFD:
    x = lift(x)
    fv = f(x.v)
    d1 = df(x.v, fv)
    d2 = ddf(x.v, fv, d1)
    return DCSFD(fv, d1 * x.e1, d1 * x.e2, d1 * x.e12 + d2 * x.e1 * x.e2)


def sqrt(x: DCSFD) -> DCSFD:
    # reference sqrt uses the z+|z| scaling trick (cuda_double_complex.hpp:244-260)
    return _unary(
        x,
        jnp.sqrt,
        lambda v, fv: 0.5 / fv,
        lambda v, fv, d1: -0.25 / (fv * v),
    )


def exp(x: DCSFD) -> DCSFD:
    return _unary(x, jnp.exp, lambda v, fv: fv, lambda v, fv, d1: fv)


def log(x: DCSFD) -> DCSFD:
    return _unary(x, jnp.log, lambda v, fv: 1.0 / v, lambda v, fv, d1: -1.0 / (v * v))


def sin(x: DCSFD) -> DCSFD:
    # DoubleComplex sin (DoubleComplex.cpp:332-345)
    return _unary(x, jnp.sin, lambda v, fv: jnp.cos(v), lambda v, fv, d1: -fv)


def cos(x: DCSFD) -> DCSFD:
    return _unary(x, jnp.cos, lambda v, fv: -jnp.sin(v), lambda v, fv, d1: -fv)


def abs(x: DCSFD) -> DCSFD:  # noqa: A001
    x = lift(x)
    s = jnp.sign(x.v)
    return DCSFD(s * x.v, s * x.e1, s * x.e2, s * x.e12)


def powi(x: DCSFD, n) -> DCSFD:
    return _unary(
        x,
        lambda v: v**n,
        lambda v, fv: n * v ** (n - 1),
        lambda v, fv, d1: n * (n - 1) * v ** (n - 2),
    )


def atan2(y: DCSFD, x: DCSFD) -> DCSFD:
    y, x = lift(y), lift(x)
    # chain through the quotient + atan using hyper-dual ops directly
    r = y / x
    base = _unary(
        r,
        jnp.arctan,
        lambda v, fv: 1.0 / (1.0 + v * v),
        lambda v, fv, d1: -2.0 * v * d1 * d1,
    )
    # fix the branch: atan2 vs atan differ by a constant per quadrant
    shift = jnp.arctan2(y.v, x.v) - jnp.arctan(r.v)
    return DCSFD(base.v + shift, base.e1, base.e2, base.e12)


def where(pred, a, b) -> DCSFD:
    a, b = lift(a), lift(b)
    w = lambda p, x, y: jnp.where(p, x, y)
    return DCSFD(
        w(pred, a.v, b.v), w(pred, a.e1, b.e1), w(pred, a.e2, b.e2), w(pred, a.e12, b.e12)
    )


def sum(x: DCSFD, axis=None, keepdims=False) -> DCSFD:  # noqa: A001
    s = lambda a: jnp.sum(a, axis=axis, keepdims=keepdims)
    return DCSFD(s(x.v), s(x.e1), s(x.e2), s(x.e12))


def to_csfd(x: DCSFD) -> cs.CSFD:
    """Drop the second-order lanes (outer complex lane only)."""
    return cs.CSFD(x.v, x.e1)

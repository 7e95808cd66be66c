"""First-order CSFD numbers as a TPU-native dual-number pytree.

The reference (X-SLAM) carries a directional derivative in the imaginary part
of a complex number: ``f(x + i*h) ~= f(x) + i*h*f'(x)`` (CSFD), implemented as
a CUDA ``complex<T>`` class (``/root/reference/DeviceArray/include/cuda_complex.hpp``)
plus "accelerated" op rules that drop the O(h^2) real-part corrections
(``/root/reference/Experiments/test_CSFD/main.cpp:18-86``).

Observation used for this TPU-native redesign: with the accelerated rules the
scaled imaginary lane ``g = imag/h`` obeys *exactly* the dual-number /
forward-mode AD propagation rules, independent of ``h``:

    mul_our((a, ga), (b, gb)) = (a*b, ga*b + a*gb)          # product rule
    div_our((a, ga), (b, gb)) = (a/b, (ga*b - a*gb)/b^2)    # quotient rule (h->0)
    exp_our((a, ga))          = (exp(a), exp(a)*ga)         # sin(h x)->h x
    ...

So instead of storing ``h``-scaled complex numbers (which wastes precision:
the imaginary lane carries tiny ~1e-7-scaled values) we store the directional
derivative itself, exactly, in a second f32 array. This is both faster (the
"accelerated" rule is the default, there is no wasted full-complex math) and
more accurate (zero O(h^2) truncation error, no h underflow) than the
reference, while computing the same quantity. A reference-compatible,
h-scaled complex implementation lives in :mod:`xslam_tpu.csfd.rawcomplex` and
is tested to agree with this module as h -> 0.

Layout note: ``CSFD`` is a NamedTuple pytree of two same-shaped arrays
``(v, g)`` rather than a trailing axis of size 2, so each lane keeps a natural
TPU tiling ((8,128) f32) and XLA can fuse the two streams freely.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

Scalar = Union[int, float, jnp.ndarray]


class CSFD(NamedTuple):
    """Dual number ``v + eps * g``: value and directional derivative.

    Mirrors the reference's first-order CSFD scalar
    (``cuda_complex.hpp:21-96``) with the accelerated rules of
    ``test_CSFD/main.cpp:18-86`` as the (exact) default semantics.
    """

    v: jnp.ndarray
    g: jnp.ndarray

    # ------------------------------------------------------------------ basic
    @property
    def shape(self):
        return jnp.shape(self.v)

    @property
    def dtype(self):
        return jnp.result_type(self.v)

    def astype(self, dtype) -> "CSFD":
        return CSFD(self.v.astype(dtype), self.g.astype(dtype))

    def __add__(self, o):
        o = lift(o, like=self)
        return CSFD(self.v + o.v, self.g + o.g)

    __radd__ = __add__

    def __neg__(self):
        return CSFD(-self.v, -self.g)

    def __sub__(self, o):
        o = lift(o, like=self)
        return CSFD(self.v - o.v, self.g - o.g)

    def __rsub__(self, o):
        return lift(o, like=self).__sub__(self)

    def __mul__(self, o):
        o = lift(o, like=self)
        # accelerated CSFD product rule (test_CSFD/main.cpp:18-23), exact here
        return CSFD(self.v * o.v, self.g * o.v + self.v * o.g)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = lift(o, like=self)
        inv = 1.0 / o.v
        val = self.v * inv
        # quotient rule == division_our (test_CSFD/main.cpp:32-37) as h->0
        return CSFD(val, (self.g - val * o.g) * inv)

    def __rtruediv__(self, o):
        return lift(o, like=self).__truediv__(self)

    def __pow__(self, n):
        return powi(self, n)

    # comparisons act on values only, like the reference's DoubleComplex
    # comparison operators (DoubleComplex.cpp:248-276).
    def __lt__(self, o):
        return self.v < _val(o)

    def __le__(self, o):
        return self.v <= _val(o)

    def __gt__(self, o):
        return self.v > _val(o)

    def __ge__(self, o):
        return self.v >= _val(o)


def _val(x) -> jnp.ndarray:
    return x.v if isinstance(x, CSFD) else jnp.asarray(x)


def lift(x, like: CSFD | None = None) -> CSFD:
    """Promote a real array/scalar to a constant CSFD (zero derivative)."""
    if isinstance(x, CSFD):
        return x
    dtype = like.dtype if like is not None else jnp.float32
    xv = jnp.asarray(x, dtype)
    return CSFD(xv, jnp.zeros_like(xv))


def seed(x, direction=1.0) -> CSFD:
    """Seed a perturbation: the CSFD analogue of ``x + i*h`` with unit h.

    Reference: ``DoubleComplex::addPerturbation`` (DoubleComplex.cpp:61-66)
    seeds ``(x, h)``; here derivatives are unscaled so the seed is the
    direction itself.
    """
    xv = jnp.asarray(x, jnp.float32)
    return CSFD(xv, jnp.broadcast_to(jnp.asarray(direction, xv.dtype), xv.shape))


def const(x, dtype=jnp.float32) -> CSFD:
    xv = jnp.asarray(x, dtype)
    return CSFD(xv, jnp.zeros_like(xv))


def grad_of(x: CSFD) -> jnp.ndarray:
    """Extract the derivative lane (reference: ``.imag()/h``)."""
    return x.g


# ---------------------------------------------------------------- elementwise
def _unary(x: CSFD, f, df) -> CSFD:
    x = lift(x)
    v = f(x.v)
    return CSFD(v, df(x.v, v) * x.g)


def sqrt(x: CSFD) -> CSFD:
    # reference: complex sqrt via |z| scaling (cuda_complex.hpp:581-593)
    v = jnp.sqrt(_val(x))
    x = lift(x)
    return CSFD(v, 0.5 * x.g / v)


def exp(x: CSFD) -> CSFD:
    # exp_our (test_CSFD/main.cpp:46-51)
    return _unary(x, jnp.exp, lambda v, fv: fv)


def log(x: CSFD) -> CSFD:
    return _unary(x, jnp.log, lambda v, fv: 1.0 / v)


def sin(x: CSFD) -> CSFD:
    # sin_our (test_CSFD/main.cpp:60-65); sinh(h)->h exactly here
    return _unary(x, jnp.sin, lambda v, fv: jnp.cos(v))


def cos(x: CSFD) -> CSFD:
    return _unary(x, jnp.cos, lambda v, fv: -jnp.sin(v))


def tan(x: CSFD) -> CSFD:
    return _unary(x, jnp.tan, lambda v, fv: 1.0 + fv * fv)


def sinh(x: CSFD) -> CSFD:
    # sinh_new drops the O(h^2) correction (cuda_complex.hpp:740-751)
    return _unary(x, jnp.sinh, lambda v, fv: jnp.cosh(v))


def cosh(x: CSFD) -> CSFD:
    return _unary(x, jnp.cosh, lambda v, fv: jnp.sinh(v))


def tanh(x: CSFD) -> CSFD:
    # reference complex tanh (cuda_complex.hpp:770-793, IEEE edge handling
    # dissolves: the dual rule is exact)
    return _unary(x, jnp.tanh, lambda v, fv: 1.0 - fv * fv)


def atanh(x: CSFD) -> CSFD:
    # reference atanh (cuda_complex.hpp:697-723; its DoubleComplex twin has
    # a log(a-a) bug, DoubleComplex.cpp:373 — documented, not replicated)
    return _unary(x, jnp.arctanh, lambda v, fv: 1.0 / (1.0 - v * v))


def asinh(x: CSFD) -> CSFD:
    return _unary(x, jnp.arcsinh, lambda v, fv: jax.lax.rsqrt(v * v + 1.0))


def acosh(x: CSFD) -> CSFD:
    return _unary(x, jnp.arccosh, lambda v, fv: jax.lax.rsqrt(v * v - 1.0))


_LN10 = 2.302585092994046


def log10(x: CSFD) -> CSFD:
    # reference log10 = log(z)/ln(10) (cuda_complex.hpp:570-580)
    return _unary(x, jnp.log10, lambda v, fv: 1.0 / (v * _LN10))


def pow(x: CSFD, y) -> CSFD:  # noqa: A001 - mirrors reference pow(z, w)
    """General power with dual base and (optionally dual) exponent
    (``pow(complex, complex)``, cuda_complex.hpp:617-638): the h->0 limit of
    ``exp(w * log(z))`` for positive base values."""
    x, y = lift(x), lift(y)
    v = x.v ** y.v
    return CSFD(v, v * (y.g * jnp.log(x.v) + y.v * x.g / x.v))


def polar(rho: CSFD, theta: CSFD = None):
    """Reference ``polar(rho, theta)`` (cuda_complex.hpp:534-545): builds the
    pair (rho*cos(theta), rho*sin(theta)). The reference returns one complex
    number; in the dual representation each component is itself a CSFD, so
    this returns the tuple — full expressive parity, derivative lanes flow
    through both components."""
    rho = lift(rho)
    if theta is None:
        theta = lift(jnp.zeros_like(rho.v))
    return rho * cos(theta), rho * sin(theta)


def conj(x: CSFD) -> CSFD:
    """Complex conjugate in CSFD semantics: negates the derivative lane
    (conj of ``x + i*h*g`` is ``x - i*h*g``, cuda_complex.hpp:485-505)."""
    x = lift(x)
    return CSFD(x.v, -x.g)


def atan(x: CSFD) -> CSFD:
    return _unary(x, jnp.arctan, lambda v, fv: 1.0 / (1.0 + v * v))


def asin(x: CSFD) -> CSFD:
    return _unary(x, jnp.arcsin, lambda v, fv: jax.lax.rsqrt(1.0 - v * v))


def acos(x: CSFD) -> CSFD:
    return _unary(x, jnp.arccos, lambda v, fv: -jax.lax.rsqrt(1.0 - v * v))


def powi(x: CSFD, n) -> CSFD:
    # pow_our (test_CSFD/main.cpp:74-79)
    x = lift(x)
    vn1 = x.v ** (n - 1)
    return CSFD(vn1 * x.v, n * vn1 * x.g)


def atan2(y: CSFD, x: CSFD) -> CSFD:
    y, x = lift(y), lift(x)
    v = jnp.arctan2(y.v, x.v)
    d = 1.0 / (x.v * x.v + y.v * y.v)
    return CSFD(v, (x.v * y.g - y.v * x.g) * d)


def abs(x: CSFD) -> CSFD:  # noqa: A001 - mirrors reference abs_d
    x = lift(x)
    s = jnp.sign(x.v)
    return CSFD(s * x.v, s * x.g)


def where(pred, a, b) -> CSFD:
    a, b = lift(a), lift(b)
    return CSFD(jnp.where(pred, a.v, b.v), jnp.where(pred, a.g, b.g))


def minimum(a, b) -> CSFD:
    return where(_val(a) <= _val(b), lift(a), lift(b))


def maximum(a, b) -> CSFD:
    return where(_val(a) >= _val(b), lift(a), lift(b))


def clip_value(x: CSFD, lo, hi) -> CSFD:
    """Clamp the value lane, zeroing the derivative where saturated."""
    x = lift(x)
    inside = (x.v >= lo) & (x.v <= hi)
    return CSFD(jnp.clip(x.v, lo, hi), jnp.where(inside, x.g, 0.0))


# ------------------------------------------------------------------- reshape
def stack(xs, axis=0) -> CSFD:
    return CSFD(jnp.stack([x.v for x in xs], axis), jnp.stack([x.g for x in xs], axis))


def concatenate(xs, axis=0) -> CSFD:
    return CSFD(
        jnp.concatenate([x.v for x in xs], axis),
        jnp.concatenate([x.g for x in xs], axis),
    )


def reshape(x: CSFD, shape) -> CSFD:
    return CSFD(x.v.reshape(shape), x.g.reshape(shape))


def sum(x: CSFD, axis=None, keepdims=False) -> CSFD:  # noqa: A001
    return CSFD(
        jnp.sum(x.v, axis=axis, keepdims=keepdims),
        jnp.sum(x.g, axis=axis, keepdims=keepdims),
    )


def take(x: CSFD, idx, **kw) -> CSFD:
    return CSFD(jnp.take(x.v, idx, **kw), jnp.take(x.g, idx, **kw))


# ------------------------------------------------------------------- linalg
def matmul(a: CSFD, b: CSFD, precision=None) -> CSFD:
    """Dual matmul: three real matmuls, all MXU-eligible.

    This is the TPU-native replacement for the reference's two-lane shared
    memory reductions (``ICP.cu:5-66``): value and derivative lanes reduce as
    ``A.v = av@bv`` and ``A.g = ag@bv + av@bg``.
    """
    a, b = lift(a), lift(b)
    dot = lambda x, y: jnp.matmul(x, y, precision=precision, preferred_element_type=jnp.float32)
    return CSFD(dot(a.v, b.v), dot(a.g, b.v) + dot(a.v, b.g))


def solve(a: CSFD, b: CSFD) -> CSFD:
    """Dual linear solve: x.v = A.v^-1 b.v ; x.g = A.v^-1 (b.g - A.g x.v).

    Replaces the reference's complex ``A.llt().solve(b)``
    (KinectFusionReconstruction.cpp:211) — forward-mode through the solve.
    """
    a, b = lift(a), lift(b)
    xv = jnp.linalg.solve(a.v, b.v)
    xg = jnp.linalg.solve(a.v, b.g - a.g @ xv)
    return CSFD(xv, xg)

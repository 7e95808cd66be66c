"""Reference-compatible h-scaled CSFD complex rules.

These reproduce, bit-for-bit in semantics, the two op families benchmarked by
the reference's ``test_CSFD`` demo (``Experiments/test_CSFD/main.cpp:18-86``):

* ``*_raw`` — the full complex-arithmetic rules (what ``cuda::std::complex``
  does, i.e. what the actual SLAM build uses, ``Internal.h:24-26``);
* ``*_our`` — the "accelerated" CSFD rules that drop O(h^2) real-part
  corrections.

They operate on explicit ``(re, im)`` pairs where ``im`` carries the
h-scaled derivative. Used for parity tests against :mod:`.single` (which is
the exact h->0 limit) and for the CSFD micro-benchmark that mirrors
``test_CSFD`` part 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class C(NamedTuple):
    re: jnp.ndarray
    im: jnp.ndarray


def mul_raw(a: C, b: C) -> C:
    return C(a.re * b.re - a.im * b.im, a.im * b.re + a.re * b.im)


def mul_our(a: C, b: C) -> C:
    # test_CSFD/main.cpp:18-23
    return C(a.re * b.re, a.im * b.re + a.re * b.im)


def div_raw(a: C, b: C) -> C:
    n = b.re * b.re + b.im * b.im
    return C((a.re * b.re + a.im * b.im) / n, (a.im * b.re - a.re * b.im) / n)


def div_our(a: C, b: C) -> C:
    # test_CSFD/main.cpp:32-37
    n = b.re * b.re + b.im * b.im
    return C(a.re / b.re, (a.im * b.re - a.re * b.im) / n)


def exp_raw(a: C) -> C:
    e = jnp.exp(a.re)
    return C(e * jnp.cos(a.im), e * jnp.sin(a.im))


def exp_our(a: C) -> C:
    # test_CSFD/main.cpp:46-51
    e = jnp.exp(a.re)
    return C(e, e * jnp.sin(a.im))


def sin_raw(a: C) -> C:
    return C(jnp.sin(a.re) * jnp.cosh(a.im), jnp.sinh(a.im) * jnp.cos(a.re))


def sin_our(a: C) -> C:
    # test_CSFD/main.cpp:60-65
    return C(jnp.sin(a.re), jnp.sinh(a.im) * jnp.cos(a.re))


def pow_raw(a: C, n: int) -> C:
    r = jnp.sqrt(a.re * a.re + a.im * a.im)
    th = jnp.arctan2(a.im, a.re)
    return C(r**n * jnp.cos(n * th), r**n * jnp.sin(n * th))


def pow_our(a: C, n: int) -> C:
    # test_CSFD/main.cpp:74-79
    r = jnp.sqrt(a.re * a.re + a.im * a.im)
    th = jnp.arctan2(a.im, a.re)
    return C(a.re**n, r**n * jnp.sin(n * th))

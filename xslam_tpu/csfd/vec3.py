"""3-vector / 3x3-matrix helpers over CSFD dual numbers.

TPU-native replacement for the reference's device vector types
(``devComplex3``/``MatS33``, ``XKinectFusion/include/Internal.h:63-155``).
A "vec3" here is a CSFD whose arrays have a leading axis of length 3 (so the
trailing axes keep image/volume layout and TPU tiling); a "mat33" is a pair of
(3, 3[, ...]) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from .single import CSFD, lift, sqrt, where


def vec3(x: CSFD, y: CSFD, z: CSFD) -> CSFD:
    x, y, z = lift(x), lift(y), lift(z)
    return CSFD(jnp.stack([x.v, y.v, z.v]), jnp.stack([x.g, y.g, z.g]))


def comp(v: CSFD, i: int) -> CSFD:
    return CSFD(v.v[i], v.g[i])


def dot(a: CSFD, b: CSFD) -> CSFD:
    # Internal.h:75-79
    out = comp(a, 0) * comp(b, 0) + comp(a, 1) * comp(b, 1) + comp(a, 2) * comp(b, 2)
    return out


def cross(a: CSFD, b: CSFD) -> CSFD:
    # Internal.h:139-142
    ax, ay, az = (comp(a, i) for i in range(3))
    bx, by, bz = (comp(b, i) for i in range(3))
    return vec3(ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def norm(v: CSFD) -> CSFD:
    # Internal.h:124-127
    return sqrt(dot(v, v))


def squarednorm(v: CSFD) -> CSFD:
    return dot(v, v)


def normalized(v: CSFD) -> CSFD:
    n = norm(v)
    return CSFD(v.v / n.v, (v.g * n.v - v.v * n.g) / (n.v * n.v))


def matvec(m: CSFD, v: CSFD) -> CSFD:
    """(3,3[,...]) mat times (3[,...]) vec, batched over trailing axes.

    Internal.h:150-154 — rows dotted with the vector. Unrolled to explicit
    elementwise ops (full-f32 VPU) rather than einsum, which the TPU would
    route through single-pass bf16 MXU contractions and corrupt metric
    coordinates at the centimetre level.
    """

    def el(a, i, j):
        return a[i, j]

    def vrow(mv, mg, i):
        val = el(mv, i, 0) * v.v[0] + el(mv, i, 1) * v.v[1] + el(mv, i, 2) * v.v[2]
        grd = (
            el(mg, i, 0) * v.v[0] + el(mg, i, 1) * v.v[1] + el(mg, i, 2) * v.v[2]
            + el(mv, i, 0) * v.g[0] + el(mv, i, 1) * v.g[1] + el(mv, i, 2) * v.g[2]
        )
        return val, grd

    rows = [vrow(m.v, m.g, i) for i in range(3)]
    return CSFD(jnp.stack([r[0] for r in rows]), jnp.stack([r[1] for r in rows]))


def where3(pred, a: CSFD, b: CSFD) -> CSFD:
    """Elementwise select with pred broadcast over the leading 3-axis."""
    return where(pred[None], a, b)

"""Persistent brick-major TSDF volume layout.

Round-2 redesign of the volume storage (ROADMAP #1): value/grad/weight live
permanently as ``(NB, 512)`` rows of 8^3 bricks instead of dense ``(X, Y, Z)``
arrays. Motivation (measured on TPU v5e, ``apps/probe_layout.py``): the
round-1 brick fusion paid ~50 ms/frame in dense<->brick transposes and the
raycaster paid ~36 ms/frame rebuilding the packed-tap table; in brick-major
layout fusion row-gathers/scatters its ACTIVE bricks directly (~4 ms) and
random voxel gathers cost the same as dense (~7-8 ns, index math is free).

The row/lane convention matches ``fusion_brick.to_bricks``: row
``b = (bx * nby + by) * nbz + bz``, lane ``l = (x&7)*64 + (y&7)*8 + (z&7)``.

Reference semantics preserved: this is purely a storage layout for
``TsdfVolume``'s three planar buffers (``TsdfVolume.cpp:17-20``); every
consumer is bit-equivalence-tested against the dense path.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .fusion import VolumeConfig

BRICK = 8
DIST_CAP = 5  # brick-distance saturation (matches raycast.DIST_CAP)
JUMP_BASE = 1000.0  # sentinel offset for jump-packed skip rows


class BrickVolume(NamedTuple):
    """TSDF map in brick-major rows: value (Re), grad (Im), weight."""

    value: jnp.ndarray  # (NB, 512) f32
    grad: jnp.ndarray  # (NB, 512) f32
    weight: jnp.ndarray  # (NB, 512) f32


def brick_grid(res: Tuple[int, int, int]) -> Tuple[int, int, int]:
    X, Y, Z = res
    assert X % BRICK == 0 and Y % BRICK == 0 and Z % BRICK == 0
    return X // BRICK, Y // BRICK, Z // BRICK


def create(cfg: VolumeConfig) -> BrickVolume:
    nbx, nby, nbz = brick_grid(cfg.resolution)
    nb = nbx * nby * nbz
    z = jnp.zeros((nb, BRICK**3), jnp.float32)
    return BrickVolume(value=z, grad=z + 0.0, weight=z + 0.0)


def from_dense(value, grad, weight) -> BrickVolume:
    from .fusion_brick import to_bricks

    return BrickVolume(
        value=to_bricks(value), grad=to_bricks(grad), weight=to_bricks(weight)
    )


def to_dense(bvol: BrickVolume, res):
    from .fusion import VolumeState
    from .fusion_brick import from_bricks

    return VolumeState(
        value=from_bricks(bvol.value, res),
        grad=from_bricks(bvol.grad, res),
        weight=from_bricks(bvol.weight, res),
    )


def flat_index(res, ix, iy, iz):
    """Flat element index of voxel (ix, iy, iz) in a brick-major plane."""
    nbx, nby, nbz = brick_grid(res)
    b = ((ix >> 3) * nby + (iy >> 3)) * nbz + (iz >> 3)
    lane = ((ix & 7) << 6) | ((iy & 7) << 3) | (iz & 7)
    return b * (BRICK**3) + lane


def gather(plane: jnp.ndarray, res, ix, iy, iz, fill=0.0) -> jnp.ndarray:
    """Voxel gather from a brick-major plane — the brick-layout twin of
    :func:`xslam_tpu.ops.sampling.gather3d` (same bounds/fill semantics;
    measured cost identical, ~7-8 ns/element)."""
    X, Y, Z = res
    ok = (ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y) & (iz >= 0) & (iz < Z)
    idx = flat_index(
        res,
        jnp.clip(ix, 0, X - 1),
        jnp.clip(iy, 0, Y - 1),
        jnp.clip(iz, 0, Z - 1),
    )
    vals = jnp.take(plane.reshape(-1), idx.reshape(-1), mode="clip").reshape(
        jnp.shape(ix)
    )
    return jnp.where(ok, vals, fill)


def pack_vg_z9(bvol: BrickVolume, res) -> jnp.ndarray:
    """(NB*64, 18) trilinear tap-row table from brick rows.

    Row ``b*64 + (x&7)*8 + (y&7)`` holds ``[v(z=0..7), v_next, g(z=0..7),
    g_next]`` where ``v_next``/``g_next`` are the z-neighbour brick's z=0
    lane at the same (x, y) — so the (z, z+1) tap pair of a trilinear cell
    always lives in ONE row, including across brick boundaries. A dual
    trilinear interpolation then costs 4 row gathers (one per (x, y) corner,
    :func:`xslam_tpu.ops.raycast_bricks.trilinear_packed_bricks`) instead of
    16 scalar gathers; TPU row gathers of ~8-16 floats cost the same as one
    scalar gather (apps/probe_gather_rows.py, BASELINE.md).

    Build cost is pure bandwidth: reshapes + one z-shifted slice + two
    concats (z-lanes are contiguous within a row, bricks.py lane convention —
    no cross-lane transposes), unlike the dense ``pack_vg_yz`` rebuild.
    """
    nbx, nby, nbz = brick_grid(res)
    nb = nbx * nby * nbz

    def aug(plane):
        a = plane.reshape(nbx * nby, nbz, BRICK, BRICK, BRICK)
        # z-neighbour brick's z=0 plane; zeros past the volume (never read:
        # the trilinear interior gate keeps z+1 <= Z-1)
        nxt = jnp.pad(a[:, 1:, :, :, 0], ((0, 0), (0, 1), (0, 0), (0, 0)))
        return jnp.concatenate([a, nxt[..., None]], axis=-1)  # (..., 9)

    v9 = aug(bvol.value)
    g9 = aug(bvol.grad)
    return jnp.concatenate([v9, g9], axis=-1).reshape(nb * BRICK * BRICK, 18)


def event_brick_mask(bvol: BrickVolume) -> jnp.ndarray:
    """(NB,) bool: bricks containing an observed negative voxel — the bricks
    that can host a march event (crossing or sign-death), pre-dilation."""
    return jnp.any((bvol.value < 0.0) & (bvol.weight > 0.0), axis=1)


def _dilate(a: jnp.ndarray) -> jnp.ndarray:
    for ax in range(3):
        a = a | jnp.roll(a, 1, ax) | jnp.roll(a, -1, ax)
    return a


def distance_grid(mask: jnp.ndarray) -> jnp.ndarray:
    """Capped L-inf cell distance to the (once-dilated) mask on any 3-D
    grid. The single dilation puts an event's *previous* march sample
    (<= 0.8*trunc away, which is under one cell at every supported
    granularity) inside the zero-distance zone, preserving event
    exactness."""
    m = _dilate(mask)
    dist = jnp.where(m, 0, DIST_CAP).astype(jnp.int32)
    cur = m
    for k in range(1, DIST_CAP):
        cur = _dilate(cur)
        dist = jnp.minimum(dist, jnp.where(cur, k, DIST_CAP))
    return dist


def distance_from_event_mask(mask: jnp.ndarray, res) -> jnp.ndarray:
    """(NB,) int32 L-inf brick distance (capped at DIST_CAP) to the nearest
    event-capable brick given the (NB,) event mask, dilated once so an
    event's *previous* sample is also inside the zero-distance zone —
    identical semantics to :func:`xslam_tpu.ops.raycast.brick_distance_field`
    (one reduce over the rows + (NB^(1/3))^3 rolls; ~1 ms at 256^3). Split
    out from :func:`brick_distance_rows` so the sharded engine can all-gather
    per-slab event masks (a few KB) instead of full weight rows."""
    nbx, nby, nbz = brick_grid(res)
    return distance_grid(mask.reshape(nbx, nby, nbz)).reshape(-1)


def brick_distance_rows(bvol: BrickVolume, res) -> jnp.ndarray:
    """(NB,) brick distance computed from this volume's own event mask."""
    return distance_from_event_mask(event_brick_mask(bvol), res)


def pack_rows(value: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Jump-pack value rows given a precomputed (NB,) brick distance."""
    d = dist.astype(jnp.float32)[:, None]
    return jnp.where(d >= 2.0, JUMP_BASE + d, value)


def skip_rows(bvol: BrickVolume, res) -> jnp.ndarray:
    """Jump-packed value rows: bricks at distance >= 2 store
    ``JUMP_BASE + dist`` in every lane (their true values can never be read
    by a correct march), others store the real values. One gather then
    serves both the skip decision and the sample — the brick-major twin of
    :func:`xslam_tpu.ops.raycast.skip_volume`, without the dense repeat."""
    return pack_rows(bvol.value, brick_distance_rows(bvol, res))


# ---------------------------------------------------------------------------
# 4^3 sub-brick skip granularity
#
# The fine-step band around surfaces is what bounds the skip march (measured:
# 28 of 33 mean samples/ray are fine steps at 8^3 granularity — the dilated
# band is ~3 bricks = 0.72 m thick, and grazing rays crawl through it). At
# 4^3 cells the band halves while jumps stay useful (jump unit 4 voxels =
# 1.7 march steps). Event-exactness argument is identical: a jump from a
# cell at (dilated) distance d skips only samples in cells at distance >= 1,
# which contain no observed-negative voxel, so no crossing or sign-death can
# be missed, and the positive `prev` sentinel matches the true sample sign.
# One cell (4 voxels) still covers the 0.8*trunc = 2.4-voxel step, so the
# single dilation keeps an event's previous sample inside the fine zone.


def event_mask4(bvol: BrickVolume, res) -> jnp.ndarray:
    """(2 nbx, 2 nby, 2 nbz) bool grid of 4^3 subcells containing an
    observed negative voxel — the event mask at sub-brick granularity."""
    nbx, nby, nbz = brick_grid(res)
    neg = (bvol.value < 0.0) & (bvol.weight > 0.0)
    neg = neg.reshape(nbx, nby, nbz, 2, 4, 2, 4, 2, 4)
    sub = jnp.any(neg, axis=(4, 6, 8))  # (nbx, nby, nbz, sx, sy, sz)
    return sub.transpose(0, 3, 1, 4, 2, 5).reshape(2 * nbx, 2 * nby, 2 * nbz)


def pack_rows4(value: jnp.ndarray, dist4: jnp.ndarray, res) -> jnp.ndarray:
    """Jump-pack value rows at 4^3 granularity: lanes whose subcell sits at
    (dilated) distance >= 2 store ``JUMP_BASE + dist`` (jump unit =
    4 voxels), others the true value."""
    nbx, nby, nbz = brick_grid(res)
    d = dist4.reshape(nbx, 2, nby, 2, nbz, 2).transpose(0, 2, 4, 1, 3, 5)
    d = d.reshape(-1, 2, 2, 2).astype(jnp.float32)
    d = jnp.repeat(jnp.repeat(jnp.repeat(d, 4, 1), 4, 2), 4, 3).reshape(-1, BRICK**3)
    return jnp.where(d >= 2.0, JUMP_BASE + d, value)


def skip_rows4(bvol: BrickVolume, res) -> jnp.ndarray:
    """Jump-packed value rows at 4^3 sub-brick granularity (pair with
    ``jump_unit=4`` in :func:`xslam_tpu.ops.raycast.march_skip`)."""
    return pack_rows4(bvol.value, distance_grid(event_mask4(bvol, res)), res)

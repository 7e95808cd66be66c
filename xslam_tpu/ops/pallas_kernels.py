"""Pallas TPU kernels for windowed image ops.

The preprocessing window filters (bilateral, ``Map.cu:155-199``) are
expressed in :mod:`.preprocess` as 169 shifted-array accumulations — correct
and XLA-fusable, but each shift re-reads the image from HBM if fusion
breaks. The Pallas version tiles the image over row blocks, DMAs each
block + halo into VMEM once, and evaluates the whole 13x13 window from
on-chip memory.

Semantically identical to the jnp reference implementation (golden-tested,
including the reference's window edge clamping quirks).

Status: TOOLCHAIN-REGRESSION CANARY, not a production path. Validated in
interpreter mode; the real-TPU Mosaic compile on this environment's
toolchain rejects the unaligned sublane slices of the sliding window
("result/input offset mismatch on non-concat dimension" — the same
capability class as the measured probe results in
``apps/probe_pallas_gather.py`` / BASELINE.md round 3), so the production
pipeline uses the jnp implementation (measured ~25-35 ms at 640x480 — XLA
fuses the 169-tap accumulation well). This file and its interpreter-mode
golden test (``tests/test_pallas_kernels.py``) are kept deliberately: when
a toolchain upgrade makes the Mosaic compile succeed, the canary flags
that windowed Pallas kernels became viable and the bilateral/march paths
should be re-evaluated. It must NOT be counted as a production Pallas
deliverable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import (
    BILATERAL_R,
    DEPTH_MAX_MM,
    DEPTH_MIN_MM,
    SIGMA_COLOR,
    SIGMA_SPACE,
)

_BLK_H = 40  # rows per grid step (480 = 12 * 40)


def _bilateral_kernel(src_hbm, dst_ref, *, H, W, blk_h):
    """One row-block: DMA [blk_h + 2R] padded rows to VMEM, filter."""
    R = BILATERAL_R
    inv_ss = 0.5 / (SIGMA_SPACE * SIGMA_SPACE)
    inv_sc = 0.5 / (SIGMA_COLOR * SIGMA_COLOR)
    i = pl.program_id(0)

    def body(scratch, sem):
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(i * blk_h, blk_h + 2 * R), :], scratch, sem
        )
        cp.start()
        cp.wait()

        row0 = i * blk_h
        center = scratch[pl.ds(R, blk_h), :]
        sum1 = jnp.zeros((blk_h, W), jnp.float32)
        sum2 = jnp.zeros((blk_h, W), jnp.float32)
        ys = row0 + jax.lax.broadcasted_iota(jnp.int32, (blk_h, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (blk_h, W), 1)

        for dy in range(-R, R + 1):
            row_slice = scratch[pl.ds(R + dy, blk_h), :]
            for dx in range(-R, R + 1):
                # lane shift via circular roll (Mosaic-supported); wrapped
                # lanes are excluded by the coordinate validity mask below
                nbr = pltpu.roll(row_slice, (-dx) % W, 1) if dx else row_slice
                valid = (
                    (ys + dy >= 0)
                    & (ys + dy <= H - 2)
                    & (xs + dx >= 0)
                    & (xs + dx <= W - 2)
                )
                space2 = jnp.float32(dy * dy + dx * dx)
                diff = center - nbr
                w = jnp.exp(-(space2 * inv_ss + diff * diff * inv_sc))
                w = jnp.where(valid, w, 0.0)
                sum1 = sum1 + nbr * w
                sum2 = sum2 + w

        res = jnp.round(sum1 / sum2)
        res = jnp.where((res > DEPTH_MAX_MM) | (res < DEPTH_MIN_MM), 0.0, res)
        dst_ref[:, :] = jnp.clip(res, 0.0, 32767.0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((blk_h + 2 * BILATERAL_R, W), jnp.float32),
        sem=pltpu.SemaphoreType.DMA,
    )


def bilateral_filter_pallas(depth_u16: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Pallas bilateral filter; same contract as
    :func:`xslam_tpu.ops.preprocess.bilateral_filter`."""
    H, W = depth_u16.shape
    R = BILATERAL_R
    blk_h = _BLK_H
    while H % blk_h:
        blk_h //= 2
    n_blocks = H // blk_h

    # pad rows so every block's halo window is in range; the valid mask
    # reproduces the reference's edge handling regardless of pad content
    depth = depth_u16.astype(jnp.float32)
    padded = jnp.pad(depth, ((R, R), (0, 0)))

    kernel = functools.partial(_bilateral_kernel, H=H, W=W, blk_h=blk_h)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((blk_h, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(padded)

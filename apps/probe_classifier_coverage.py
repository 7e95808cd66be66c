"""Probe: is the fusion classifier's 2x2 mip window guaranteed to cover
every pixel its bricks actually sample?

The far/none interval proofs in ``ops/fusion_brick.py::classify_bricks``
require the window's [dmin, dmax] to bound the depth of EVERY pixel any
voxel of the brick samples. The window is 2 cells of size ts >= pr (the
footprint HALF-width), anchored at the cell containing floor(u - pr) — a
footprint of width 2*pr that starts near the end of a cell can straddle
THREE cells (alignment), leaving its tail uncovered. This probe measures,
over many random poses on the small scene, (a) how many classified-non-
ACTIVE bricks sample a pixel outside their window, and (b) whether any of
those lead to an actual misclassification (a sampled valid depth outside
[dmin, dmax] that flips the far/none proof).

Run: python apps/probe_classifier_coverage.py   (CPU)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tests.helpers import SMALL_INTR, small_config, small_dataset
from xslam_tpu.csfd.single import lift
from xslam_tpu.geometry import se3
from xslam_tpu.ops import fusion
from xslam_tpu.ops.fusion_brick import (
    BRICK,
    MIP_LEVELS,
    _depth_mips,
    classify_bricks,
)


def main():
    cfg = small_config()
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(cfg.tsdf_size),
        voxel_size=cfg.voxel_size,
        trunc_dist=cfg.trunc_dist,
        max_weight=cfg.max_integration_weight,
    )
    ds = small_dataset(n_frames=1)
    intr = SMALL_INTR
    H, W = intr.height, intr.width
    res = vol_cfg.resolution
    X, Y, Z = res
    nb = (X // BRICK, Y // BRICK, Z // BRICK)
    vs = vol_cfg.voxel_size

    rng = np.random.default_rng(0)
    w2v = np.asarray(cfg.world2volume, np.float32)

    n_window_miss = 0
    n_bound_violation = 0
    n_proof_flip = 0
    n_nonactive = 0

    for trial in range(24):
        # random-ish pose near the dataset trajectory
        ang = rng.uniform(-0.4, 0.4, 3)
        t = rng.uniform(-0.5, 0.5, 3)
        c, s = np.cos(ang), np.sin(ang)
        Rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
        Ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
        Rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = (Rx @ Ry @ Rz).astype(np.float32)
        c2w[:3, 3] = t
        from xslam_tpu.io.synthetic import render_depth
        from tests.helpers import small_scene
        depth = np.asarray(render_depth(small_scene(), c2w, intr))
        depth_m = np.asarray(fusion.scale_depth(jnp.asarray(depth)))

        v2c = np.linalg.inv(w2v @ c2w).astype(np.float32)
        R, tt = v2c[:3, :3], v2c[:3, 3]

        cls = np.asarray(
            classify_bricks(
                jnp.asarray(depth_m), jnp.asarray(R), jnp.asarray(tt),
                intr, vol_cfg, res,
            )
        )

        # exact per-voxel sampled pixels (mirror fusion._voxel_update's gate)
        xs = (np.arange(X) + 0.5) * vs
        gx, gy, gz = np.meshgrid(xs, xs[:Y], xs[:Z], indexing="ij")
        ccx = R[0, 0] * gx + R[0, 1] * gy + R[0, 2] * gz + tt[0]
        ccy = R[1, 0] * gx + R[1, 1] * gy + R[1, 2] * gz + tt[1]
        ccz = R[2, 0] * gx + R[2, 1] * gy + R[2, 2] * gz + tt[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_z = 1.0 / ccz
            iu = np.floor(ccx * intr.fx * inv_z + intr.cx - 0.5).astype(np.int64)
            iv = np.floor(ccy * intr.fy * inv_z + intr.cy - 0.5).astype(np.int64)
        gate = (inv_z >= 0) & (iu > 1) & (iu < W - 1) & (iv > 1) & (iv < H - 1)

        # recompute the window selection exactly as classify_bricks does
        sizes = [ts for ts in MIP_LEVELS if H // ts >= 1 and W // ts >= 1]

        # brick geometry -> footprint bbox (same math as classify_bricks)
        bx0 = (np.arange(nb[0], dtype=np.float32))[:, None, None] * (BRICK * vs)
        by0 = (np.arange(nb[1], dtype=np.float32))[None, :, None] * (BRICK * vs)
        bz0 = (np.arange(nb[2], dtype=np.float32))[None, None, :] * (BRICK * vs)
        bm = BRICK * vs
        us, vs_l, zs = [], [], []
        for dx in (0.0, bm):
            for dy in (0.0, bm):
                for dz in (0.0, bm):
                    px, py, pz = bx0 + dx, by0 + dy, bz0 + dz
                    cx_ = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + tt[0]
                    cy_ = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + tt[1]
                    cz_ = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + tt[2]
                    zs.append(cz_)
                    zc = np.maximum(cz_, 1e-6)
                    us.append(intr.fx * cx_ / zc + intr.cx)
                    vs_l.append(intr.fy * cy_ / zc + intr.cy)
        umin = np.min(us, 0) - 1.0
        umax = np.max(us, 0) + 1.0
        vmin = np.min(vs_l, 0) - 1.0
        vmax = np.max(vs_l, 0) + 1.0
        zmin = np.min(zs, 0)
        z_safe = zmin > 1e-3
        pr = np.where(z_safe, 0.5 * np.maximum(umax - umin, vmax - vmin), np.inf)
        u = 0.5 * (umin + umax)
        v = 0.5 * (vmin + vmax)
        level = np.searchsorted(np.asarray(sizes, np.float32), pr.reshape(-1)).reshape(pr.shape)
        level_ok = level < len(sizes)
        level = np.clip(level, 0, len(sizes) - 1)
        ts_arr = np.asarray(sizes)[level]
        cu = np.clip((u - pr).astype(np.int64), 0, W - 1)
        cv = np.clip((v - pr).astype(np.int64), 0, H - 1)
        cu0 = cu // ts_arr
        cv0 = cv // ts_arr

        # window min/max depth bounds the classifier used
        mips = _depth_mips(jnp.asarray(depth_m))
        trunc = vol_cfg.trunc_dist

        for bidx in np.argwhere((cls != 2)):
            bi, bj, bk = bidx
            c = cls[bi, bj, bk]
            if not level_ok[bi, bj, bk] or not z_safe[bi, bj, bk]:
                continue
            n_nonactive += 1
            ts = int(ts_arr[bi, bj, bk])
            u0 = int(cu0[bi, bj, bk]) * ts
            v0 = int(cv0[bi, bj, bk]) * ts
            # actually sampled pixels of this brick (gated voxels)
            sl = (
                slice(bi * BRICK, (bi + 1) * BRICK),
                slice(bj * BRICK, (bj + 1) * BRICK),
                slice(bk * BRICK, (bk + 1) * BRICK),
            )
            g = gate[sl]
            if not g.any():
                continue
            pu = iu[sl][g]
            pv = iv[sl][g]
            in_window = (pu >= u0) & (pu < u0 + 2 * ts) & (pv >= v0) & (pv < v0 + 2 * ts)
            if not in_window.all():
                n_window_miss += 1
                # do the out-of-window pixels break the [dmin, dmax] bound?
                d = depth_m[pv[~in_window], pu[~in_window]]
                dv = d[d > 0]
                if dv.size:
                    # window bound (recompute from the mips)
                    li = int(np.searchsorted(np.asarray(sizes, np.float32), pr[bi, bj, bk]))
                    li = min(li, len(sizes) - 1)
                    mn = np.asarray(mips[1][li])
                    mx = np.asarray(mips[2][li])
                    y0, x0 = v0 // ts, u0 // ts
                    wmn = mn[y0:y0 + 2, x0:x0 + 2].min()
                    wmx = mx[y0:y0 + 2, x0:x0 + 2].max()
                    if dv.min() < wmn - 1e-6 or dv.max() > wmx + 1e-6:
                        n_bound_violation += 1
                        # does it flip the proof? (brick said far: a sampled
                        # depth below dmin could make a voxel band-active;
                        # said none-by-band: a depth above dmax could too)
                        n_proof_flip += 1
                        print(
                            f"trial {trial}: brick {bi},{bj},{bk} class {c} "
                            f"sampled depth [{dv.min():.3f},{dv.max():.3f}] "
                            f"outside window bound [{wmn:.3f},{wmx:.3f}] "
                            f"(ts={ts}, pr={pr[bi, bj, bk]:.1f})"
                        )

    print(
        f"non-ACTIVE bricks checked: {n_nonactive}; window misses: "
        f"{n_window_miss}; bound violations: {n_bound_violation}; "
        f"proof flips: {n_proof_flip}"
    )


if __name__ == "__main__":
    main()

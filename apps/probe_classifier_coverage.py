"""Probe: does the fusion classifier's chosen mip window cover every pixel
its bricks actually sample?

The far/none interval proofs in ``ops/fusion_brick.py`` require the
window's [dmin, dmax] to bound the depth of EVERY pixel any voxel of the
brick samples. Round 5 found (and fixed) two coverage bugs with this
probe: (1) a wide-enough (ts >= pr) window can be MISALIGNED — a 2*pr
footprint straddling three cells leaks its tail (a real 22-voxel
dense-vs-brick divergence); (2) with a dense (non-doubling) mip ladder a
single +1 level bump does not restore coverage either. The classifier now
scans for the smallest covering level; this probe verifies the invariant
END-TO-END by reading the classifier's own window metadata (BrickAux) and
checking every sampled pixel of every non-ACTIVE brick lands inside it.

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

from tests.helpers import SMALL_INTR, small_config, small_scene
from xslam_tpu.io.synthetic import render_depth
from xslam_tpu.ops import fusion
from xslam_tpu.ops.fusion_brick import BRICK, classify_bricks_full


def main():
    cfg = small_config()
    vol_cfg = fusion.VolumeConfig(
        resolution=tuple(cfg.tsdf_size),
        voxel_size=cfg.voxel_size,
        trunc_dist=cfg.trunc_dist,
        max_weight=cfg.max_integration_weight,
    )
    intr = SMALL_INTR
    H, W = intr.height, intr.width
    res = vol_cfg.resolution
    X, Y, Z = res
    vs = vol_cfg.voxel_size

    rng = np.random.default_rng(0)
    w2v = np.asarray(cfg.world2volume, np.float32)

    n_nonactive = 0
    n_window_miss = 0

    for trial in range(24):
        ang = rng.uniform(-0.4, 0.4, 3)
        t = rng.uniform(-0.5, 0.5, 3)
        c, s = np.cos(ang), np.sin(ang)
        Rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
        Ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
        Rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = (Rx @ Ry @ Rz).astype(np.float32)
        c2w[:3, 3] = t
        depth = np.asarray(render_depth(small_scene(), c2w, intr))
        depth_m = np.asarray(fusion.scale_depth(jnp.asarray(depth)))

        v2c = np.linalg.inv(w2v @ c2w).astype(np.float32)
        R, tt = v2c[:3, :3], v2c[:3, 3]

        aux = classify_bricks_full(
            jnp.asarray(depth_m), jnp.asarray(R), jnp.asarray(tt),
            intr, vol_cfg, res,
        )
        cls = np.asarray(aux.cls)
        u0 = np.asarray(aux.win_u0)
        v0 = np.asarray(aux.win_v0)
        ts = np.asarray(aux.win_ts)

        # exact per-voxel sampled pixels (fusion._voxel_update's gate and
        # round-to-nearest sample)
        xs = (np.arange(X) + 0.5) * vs
        gx, gy, gz = np.meshgrid(xs, xs[:Y], xs[:Z], indexing="ij")
        ccx = R[0, 0] * gx + R[0, 1] * gy + R[0, 2] * gz + tt[0]
        ccy = R[1, 0] * gx + R[1, 1] * gy + R[1, 2] * gz + tt[1]
        ccz = R[2, 0] * gx + R[2, 1] * gy + R[2, 2] * gz + tt[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_z = 1.0 / ccz
            img_u = ccx * intr.fx * inv_z + intr.cx
            img_v = ccy * intr.fy * inv_z + intr.cy
            iu = np.floor(img_u - 0.5).astype(np.int64)
            iv = np.floor(img_v - 0.5).astype(np.int64)
            pu = np.round(img_u).astype(np.int64)
            pv = np.round(img_v).astype(np.int64)
        gate = (inv_z >= 0) & (iu > 1) & (iu < W - 1) & (iv > 1) & (iv < H - 1)

        for bi, bj, bk in np.argwhere(cls != 2):
            n_nonactive += 1
            sl = (
                slice(bi * BRICK, (bi + 1) * BRICK),
                slice(bj * BRICK, (bj + 1) * BRICK),
                slice(bk * BRICK, (bk + 1) * BRICK),
            )
            g = gate[sl]
            if not g.any():
                continue
            su, sv = pu[sl][g], pv[sl][g]
            a, b, tsz = u0[bi, bj, bk], v0[bi, bj, bk], ts[bi, bj, bk]
            in_win = (su >= a) & (su < a + 2 * tsz) & (sv >= b) & (sv < b + 2 * tsz)
            if not in_win.all():
                n_window_miss += 1
                print(
                    f"trial {trial}: brick {bi},{bj},{bk} class "
                    f"{cls[bi, bj, bk]} samples pixels outside its window "
                    f"(win ({a},{b}) ts {tsz})"
                )

    print(
        f"non-ACTIVE bricks checked: {n_nonactive}; "
        f"window coverage violations: {n_window_miss}"
    )


if __name__ == "__main__":
    main()

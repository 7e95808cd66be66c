"""DCSFD relocalization loss/Hessian + Newton pose recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xslam_tpu.csfd.single import lift
from xslam_tpu.geometry import se3
from xslam_tpu.models.relocalize import loss_grad_hessian, relocalize
from xslam_tpu.ops import fusion
from xslam_tpu.ops.tsdf_loss import tsdf_loss_hessian
from tests.helpers import SMALL_INTR, small_config, small_dataset


@pytest.fixture(scope="module")
def gt_volume():
    """Build a gt TSDF volume by fusing oracle-pose frames; return the
    volume + a depth frame + the true camera-to-volume pose."""
    cfg = small_config(tsdf_size=(64, 64, 64), voxel_size=0.12)
    vol_cfg = fusion.VolumeConfig(
        tuple(cfg.tsdf_size), cfg.voxel_size, cfg.trunc_dist, cfg.max_integration_weight
    )
    w2v = np.asarray(cfg.world2volume, np.float32)
    ds = small_dataset(5, degrees_per_frame=2.0)
    vol = fusion.create_volume(vol_cfg)
    integ = jax.jit(
        lambda v, d, r, t: fusion.integrate(v, d, r, t, SMALL_INTR, vol_cfg)
    )
    for i in range(5):
        depth_m = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), jnp.float32)))
        v2c = se3.inverse(c2v)
        vol = integ(vol, depth_m, se3.rotation(v2c), se3.translation(v2c))

    c2v_np = w2v @ ds.get_pose(0)
    depth_m0 = fusion.scale_depth(jnp.asarray(ds.get_depth(0)))
    return vol, vol_cfg, depth_m0, c2v_np


def _log_se3(T):
    return se3.log_real(T)


def test_loss_zero_at_true_pose(gt_volume):
    vol, vol_cfg, depth_m, c2v_np = gt_volume
    xi_true = _log_se3(c2v_np)  # translation-dominant; rotation ~0 at frame 0
    # exact xi: solve exp(xi) = c2v via our exp by optimization is overkill;
    # instead evaluate at the true pose matrix directly
    from xslam_tpu.csfd.double import DCSFD
    from xslam_tpu.csfd import double as dc

    v2c = np.linalg.inv(c2v_np).astype(np.float32)
    z33 = jnp.zeros((3, 3), jnp.float32)
    z3 = jnp.zeros((3,), jnp.float32)
    out = jax.jit(
        lambda: tsdf_loss_hessian(
            vol.value, depth_m,
            DCSFD(jnp.asarray(v2c[:3, :3]), z33, z33, z33),
            DCSFD(jnp.asarray(v2c[:3, 3]), z3, z3, z3),
            SMALL_INTR, vol_cfg,
        )
    )()
    assert int(out.count) > 3000
    mean_loss = float(out.loss) / int(out.count)
    assert mean_loss < 0.01, mean_loss  # near-zero error at the true pose


def test_hyperdual_lanes_vs_jax_ad(gt_volume):
    """Per-voxel DCSFD derivative lanes must match jax.jvp / second-order AD
    of the real twin of the loss field — an exact cross-check of the whole
    hyper-dual chain through se3.exp, projection, bilinear sampling and the
    error (masks held fixed, as in the reference's per-voxel derivative)."""
    from xslam_tpu.csfd import double as dcm
    from xslam_tpu.csfd.double import DCSFD

    vol, vol_cfg, depth_m, c2v_np = gt_volume
    xi0 = jnp.asarray(_log_se3(c2v_np) + 0.02, jnp.float32)
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=6).astype(np.float32))

    def field(xi_d: DCSFD):
        c2v = se3.exp(xi_d, mod=dcm)
        v2c = se3.inverse(c2v)
        loss, mask = tsdf_loss_hessian(
            vol.value, depth_m, se3.rotation(v2c), se3.translation(v2c),
            SMALL_INTR, vol_cfg, return_field=True,
        )
        return loss, mask

    loss, mask = jax.jit(lambda: field(DCSFD(xi0, d, d, jnp.zeros(6))))()
    mask = np.asarray(mask)
    assert mask.sum() > 3000

    real_field = lambda xi: field(DCSFD(xi, jnp.zeros(6), jnp.zeros(6), jnp.zeros(6)))[0].v
    val, tang = jax.jit(lambda: jax.jvp(real_field, (xi0,), (d,)))()
    np.testing.assert_allclose(np.asarray(loss.v)[mask], np.asarray(val)[mask], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loss.e1)[mask], np.asarray(tang)[mask], rtol=2e-2, atol=1e-4
    )

    # second derivative lane vs d/ds of the jvp (forward-over-forward AD)
    hvp = jax.jit(
        lambda: jax.jvp(lambda xi: jax.jvp(real_field, (xi,), (d,))[1], (xi0,), (d,))[1]
    )()
    np.testing.assert_allclose(
        np.asarray(loss.e12)[mask], np.asarray(hvp)[mask], rtol=5e-2, atol=5e-3
    )


def test_newton_recovers_pose(gt_volume):
    vol, vol_cfg, depth_m, c2v_np = gt_volume
    xi_true = _log_se3(c2v_np).astype(np.float32)

    # local-convergence test: at this deliberately coarse test resolution
    # (0.12 m voxels, 0.36 m truncation) the Newton basin is a fraction of
    # the truncation band; real systems seed relocalization coarse-to-fine.
    rng = np.random.default_rng(1)
    xi_init = xi_true + np.concatenate(
        [0.04 * rng.normal(size=3), 0.01 * rng.normal(size=3)]
    ).astype(np.float32)

    reloc = jax.jit(
        lambda xi: relocalize(vol.value, depth_m, xi, SMALL_INTR, vol_cfg, iters=15)
    )
    out = reloc(jnp.asarray(xi_init))
    losses = np.asarray(out.loss_history)
    # monotone mean-loss descent toward the true-pose floor
    assert losses[-1] < losses[0] * 0.6, losses
    assert np.all(np.diff(losses) < 1e-5), losses

    # pose error reduced vs the initial perturbation
    T_est = np.asarray(se3.exp_real(out.xi))
    T_init = np.asarray(se3.exp_real(jnp.asarray(xi_init)))
    err_est = np.linalg.norm(T_est[:3, 3] - c2v_np[:3, 3])
    err_init = np.linalg.norm(T_init[:3, 3] - c2v_np[:3, 3])
    assert err_est < 0.8 * err_init, (err_est, err_init)

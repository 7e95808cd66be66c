"""Pose-graph GN and distributed Schur-complement BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xslam_tpu.geometry import se3
from xslam_tpu.models.ba import BAProblem, pose_graph_gn, schur_ba


def _make_poses(K, rng):
    """Orbit-like keyframe poses as se(3) vectors."""
    poses = []
    for k in range(K):
        ang = 0.15 * k
        xi = np.array(
            [1.5 * np.cos(ang), 0.1 * k, 1.5 * np.sin(ang), 0.0, ang, 0.0], np.float32
        )
        poses.append(xi)
    return np.stack(poses)


def test_pose_graph_recovers_from_noise():
    rng = np.random.default_rng(0)
    K = 6
    gt = _make_poses(K, rng)
    gt_T = [np.asarray(se3.exp_real(jnp.asarray(x))) for x in gt]

    # odometry edges + one loop closure, exact measurements
    edges = [(i, i + 1) for i in range(K - 1)] + [(0, K - 1)]
    rel = [np.linalg.inv(gt_T[i]) @ gt_T[j] for i, j in edges]

    noisy = gt + np.concatenate(
        [0.05 * rng.normal(size=(K, 3)), 0.02 * rng.normal(size=(K, 3))], axis=1
    ).astype(np.float32)
    noisy[0] = gt[0]  # gauge

    out = jax.jit(
        lambda p: pose_graph_gn(
            p, jnp.asarray(edges, jnp.int32), jnp.asarray(np.stack(rel), jnp.float32), iters=15
        )
    )(jnp.asarray(noisy))

    hist = np.asarray(out.residual_history)
    assert hist[-1] < 1e-6, hist
    for k in range(K):
        T_est = np.asarray(se3.exp_real(out.poses[k]))
        # compare relative to frame 0 (gauge)
        rel_est = np.linalg.inv(np.asarray(se3.exp_real(out.poses[0]))) @ T_est
        rel_gt = np.linalg.inv(gt_T[0]) @ gt_T[k]
        np.testing.assert_allclose(rel_est, rel_gt, atol=5e-3)


@pytest.fixture(scope="module")
def ba_problem():
    rng = np.random.default_rng(1)
    K, L = 5, 40
    gt_poses = _make_poses(K, rng)
    gt_T = [np.asarray(se3.exp_real(jnp.asarray(x))) for x in gt_poses]
    anchors = rng.uniform(-1.0, 1.0, size=(L, 3)).astype(np.float32)
    anchors[:, 2] += 3.0  # in front of the rig

    frame_idx, anchor_idx, meas = [], [], []
    for k in range(K):
        w2c = np.linalg.inv(gt_T[k])
        for l in range(L):
            cam = w2c[:3, :3] @ anchors[l] + w2c[:3, 3]
            if cam[2] > 0.5:
                frame_idx.append(k)
                anchor_idx.append(l)
                meas.append(cam)
    problem = BAProblem(
        frame_idx=jnp.asarray(frame_idx, jnp.int32),
        anchor_idx=jnp.asarray(anchor_idx, jnp.int32),
        meas_cam=jnp.asarray(np.stack(meas), jnp.float32),
    )
    return gt_poses, gt_T, anchors, problem


def test_schur_ba_recovers(ba_problem):
    gt_poses, gt_T, anchors, problem = ba_problem
    rng = np.random.default_rng(2)
    K, L = gt_poses.shape[0], anchors.shape[0]

    noisy_poses = gt_poses + np.concatenate(
        [0.05 * rng.normal(size=(K, 3)), 0.02 * rng.normal(size=(K, 3))], axis=1
    ).astype(np.float32)
    noisy_poses[0] = gt_poses[0]
    noisy_anchors = anchors + 0.05 * rng.normal(size=(L, 3)).astype(np.float32)

    out = jax.jit(
        lambda p, a: schur_ba(p, a, problem, iters=10)
    )(jnp.asarray(noisy_poses), jnp.asarray(noisy_anchors))

    hist = np.asarray(out.residual_history)
    assert hist[-1] < 1e-6, hist
    for k in range(K):
        rel_est = np.linalg.inv(np.asarray(se3.exp_real(out.poses[0]))) @ np.asarray(
            se3.exp_real(out.poses[k])
        )
        rel_gt = np.linalg.inv(gt_T[0]) @ gt_T[k]
        np.testing.assert_allclose(rel_est, rel_gt, atol=1e-2)


def test_schur_ba_sharded_matches(ba_problem):
    """Observation-sharded BA under shard_map with psum must match the
    single-device result (the distributed camera-block reduction)."""
    gt_poses, gt_T, anchors, problem = ba_problem
    rng = np.random.default_rng(2)
    K, L = gt_poses.shape[0], anchors.shape[0]

    noisy_poses = gt_poses + np.concatenate(
        [0.05 * rng.normal(size=(K, 3)), 0.02 * rng.normal(size=(K, 3))], axis=1
    ).astype(np.float32)
    noisy_poses[0] = gt_poses[0]
    noisy_anchors = anchors + 0.05 * rng.normal(size=(L, 3)).astype(np.float32)

    # pad observations to a multiple of 8 with zero-weight (anchor 0 / frame 0
    # self-consistent duplicates)
    N = problem.frame_idx.shape[0]
    n_dev = 8
    pad = (-N) % n_dev
    problem_p = BAProblem(
        frame_idx=jnp.concatenate([problem.frame_idx, jnp.zeros(pad, jnp.int32)]),
        anchor_idx=jnp.concatenate([problem.anchor_idx, jnp.zeros(pad, jnp.int32)]),
        meas_cam=jnp.concatenate(
            [problem.meas_cam, jnp.tile(problem.meas_cam[:1], (pad, 1))]
        ),
    )
    # make padded rows exact duplicates of obs 0 so they add a consistent
    # (zero-residual-at-optimum) factor; for the equivalence check we simply
    # run BOTH sharded and unsharded on the padded problem
    from xslam_tpu.parallel.mesh import SPACE_AXIS, make_space_mesh

    try:
        from jax import shard_map as sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm
    from jax.sharding import PartitionSpec as P

    mesh = make_space_mesh(n_dev)

    ref = jax.jit(lambda p, a: schur_ba(p, a, problem_p, iters=6))(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_anchors)
    )

    def stage(p, a, fi, ai, mc):
        prob = BAProblem(frame_idx=fi, anchor_idx=ai, meas_cam=mc)
        return schur_ba(p, a, prob, iters=6, axis_name=SPACE_AXIS)

    sharded = jax.jit(
        sm(
            stage,
            mesh=mesh,
            in_specs=(P(), P(), P(SPACE_AXIS), P(SPACE_AXIS), P(SPACE_AXIS, None)),
            out_specs=P(),
            check_vma=False,
        )
    )(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_anchors),
        problem_p.frame_idx, problem_p.anchor_idx, problem_p.meas_cam,
    )

    np.testing.assert_allclose(np.asarray(sharded.poses), np.asarray(ref.poses), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sharded.anchors), np.asarray(ref.anchors), atol=1e-4
    )


def test_schur_ba_cg_matches_dense(ba_problem):
    """Matrix-free CG BA must converge to the dense Schur solution on the
    toy problem (same GN trajectory up to CG solve tolerance)."""
    gt_poses, gt_T, anchors, problem = ba_problem
    rng = np.random.default_rng(2)
    K, L = gt_poses.shape[0], anchors.shape[0]

    noisy_poses = gt_poses + np.concatenate(
        [0.05 * rng.normal(size=(K, 3)), 0.02 * rng.normal(size=(K, 3))], axis=1
    ).astype(np.float32)
    noisy_poses[0] = gt_poses[0]
    noisy_anchors = anchors + 0.05 * rng.normal(size=(L, 3)).astype(np.float32)

    from xslam_tpu.models.ba import schur_ba_cg

    ref = jax.jit(lambda p, a: schur_ba(p, a, problem, iters=10))(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_anchors)
    )
    out = jax.jit(lambda p, a: schur_ba_cg(p, a, problem, iters=10))(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_anchors)
    )
    assert np.asarray(out.residual_history)[-1] < 1e-6
    np.testing.assert_allclose(np.asarray(out.poses), np.asarray(ref.poses), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.anchors), np.asarray(ref.anchors), atol=1e-4
    )


def test_schur_ba_cg_large_scale():
    """60 keyframes x 6000 anchors x 24k observations — the scale where the
    dense schur_ba's Hcl (K,L,6,3) blocks and (K,L)-indexed einsums are
    unusable. The matrix-free path must recover ground truth."""
    from xslam_tpu.models.ba import schur_ba_cg

    rng = np.random.default_rng(7)
    K, L = 60, 6000
    poses = []
    for k in range(K):
        ang = 0.05 * k
        poses.append(
            np.array(
                [2.0 * np.cos(ang), 0.02 * k, 2.0 * np.sin(ang), 0.0, ang, 0.0],
                np.float32,
            )
        )
    gt_poses = np.stack(poses)
    gt_T = np.stack([np.asarray(se3.exp_real(jnp.asarray(x))) for x in gt_poses])
    anchors = rng.uniform(-1.5, 1.5, size=(L, 3)).astype(np.float32)
    anchors[:, 2] += 4.0
    obs_k = rng.integers(0, K, size=(L, 4))  # each anchor seen by 4 keyframes
    fi = obs_k.reshape(-1)
    ai = np.repeat(np.arange(L), 4)
    w2c = np.linalg.inv(gt_T)
    meas = np.einsum("nij,nj->ni", w2c[fi, :3, :3], anchors[ai]) + w2c[fi, :3, 3]
    problem = BAProblem(
        frame_idx=jnp.asarray(fi, jnp.int32),
        anchor_idx=jnp.asarray(ai, jnp.int32),
        meas_cam=jnp.asarray(meas, jnp.float32),
    )

    noisy_p = gt_poses + np.concatenate(
        [0.03 * rng.normal(size=(K, 3)), 0.01 * rng.normal(size=(K, 3))], axis=1
    ).astype(np.float32)
    noisy_p[0] = gt_poses[0]
    noisy_a = anchors + 0.03 * rng.normal(size=(L, 3)).astype(np.float32)

    out = jax.jit(lambda p, a: schur_ba_cg(p, a, problem, iters=8, cg_iters=40))(
        jnp.asarray(noisy_p), jnp.asarray(noisy_a)
    )
    assert np.asarray(out.residual_history)[-1] < 1e-6
    for k in range(0, K, 7):
        rel_est = np.linalg.inv(np.asarray(se3.exp_real(out.poses[0]))) @ np.asarray(
            se3.exp_real(out.poses[k])
        )
        rel_gt = np.linalg.inv(gt_T[0]) @ gt_T[k]
        np.testing.assert_allclose(rel_est, rel_gt, atol=1e-4)


def test_schur_ba_cg_sharded_matches(ba_problem):
    """Observation-sharded CG BA under shard_map: the (L,3) and (K,6) psums
    inside the matvec must reproduce the single-device result."""
    from xslam_tpu.models.ba import schur_ba_cg

    gt_poses, gt_T, anchors, problem = ba_problem
    rng = np.random.default_rng(2)
    K, L = gt_poses.shape[0], anchors.shape[0]

    noisy_poses = gt_poses + np.concatenate(
        [0.05 * rng.normal(size=(K, 3)), 0.02 * rng.normal(size=(K, 3))], axis=1
    ).astype(np.float32)
    noisy_poses[0] = gt_poses[0]
    noisy_anchors = anchors + 0.05 * rng.normal(size=(L, 3)).astype(np.float32)

    N = problem.frame_idx.shape[0]
    n_dev = 8
    pad = (-N) % n_dev
    problem_p = BAProblem(
        frame_idx=jnp.concatenate([problem.frame_idx, jnp.zeros(pad, jnp.int32)]),
        anchor_idx=jnp.concatenate([problem.anchor_idx, jnp.zeros(pad, jnp.int32)]),
        meas_cam=jnp.concatenate(
            [problem.meas_cam, jnp.tile(problem.meas_cam[:1], (pad, 1))]
        ),
    )
    from xslam_tpu.parallel.mesh import SPACE_AXIS, make_space_mesh

    try:
        from jax import shard_map as sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm
    from jax.sharding import PartitionSpec as P

    mesh = make_space_mesh(n_dev)

    ref = jax.jit(lambda p, a: schur_ba_cg(p, a, problem_p, iters=6))(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_anchors)
    )

    def stage(p, a, fi, ai, mc):
        prob = BAProblem(frame_idx=fi, anchor_idx=ai, meas_cam=mc)
        return schur_ba_cg(p, a, prob, iters=6, axis_name=SPACE_AXIS)

    sharded = jax.jit(
        sm(
            stage,
            mesh=mesh,
            in_specs=(P(), P(), P(SPACE_AXIS), P(SPACE_AXIS), P(SPACE_AXIS, None)),
            out_specs=P(),
            check_vma=False,
        )
    )(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_anchors),
        problem_p.frame_idx, problem_p.anchor_idx, problem_p.meas_cam,
    )

    np.testing.assert_allclose(
        np.asarray(sharded.poses), np.asarray(ref.poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sharded.anchors), np.asarray(ref.anchors), atol=1e-4
    )


def test_pose_graph_cg_matches_dense():
    """The matrix-free CG pose-graph solver (the production path wired into
    RecoveringEngine.refine_keyframes) must agree with the dense jacfwd
    solver on a small loop-closed graph."""
    import numpy as np

    from xslam_tpu.geometry import se3
    from xslam_tpu.models.ba import pose_graph_cg, pose_graph_gn

    rng = np.random.default_rng(0)
    K = 10
    gt = [np.eye(4)]
    for _ in range(1, K):
        xi = np.concatenate([rng.normal(0, 0.3, 3), rng.normal(0, 0.2, 3)])
        gt.append(gt[-1] @ np.asarray(se3.exp_real(xi.astype(np.float32))))
    edges = [(k, k + 1) for k in range(K - 1)] + [(0, K - 1)]
    rel = [np.linalg.inv(gt[i]) @ gt[j] for (i, j) in edges]
    init = np.stack(
        [se3.log_real(g.astype(np.float32)) for g in gt]
    ) + rng.normal(0, 0.05, (K, 6))
    init[0] = se3.log_real(gt[0].astype(np.float32))
    e = jnp.asarray(np.asarray(edges, np.int32))
    rm = jnp.asarray(np.stack(rel).astype(np.float32))
    out_d = pose_graph_gn(jnp.asarray(init, jnp.float32), e, rm, iters=10)
    out_c = pose_graph_cg(jnp.asarray(init, jnp.float32), e, rm, iters=10)
    assert float(out_c.residual_history[-1]) < 1e-9
    np.testing.assert_allclose(
        np.asarray(out_d.poses), np.asarray(out_c.poses), atol=1e-5
    )


def test_pose_graph_cg_scales_to_1k_keyframes():
    """O(K + E) memory discipline: 1000 keyframes + loop closures converge
    (the dense solver would build a 6000x6000 system here)."""
    import numpy as np

    from xslam_tpu.geometry import se3
    from xslam_tpu.models.ba import pose_graph_cg

    rng = np.random.default_rng(1)
    K = 1000
    gt = np.cumsum(rng.normal(0, 0.05, (K, 6)).astype(np.float32), axis=0)
    poses_gt = [np.asarray(se3.exp_real(x)) for x in gt]
    edges = [(k, k + 1) for k in range(K - 1)]
    rel = [np.linalg.inv(poses_gt[k]) @ poses_gt[k + 1] for k in range(K - 1)]
    for _ in range(20):
        i, j = sorted(rng.integers(0, K, 2))
        if j - i < 10:
            continue
        edges.append((int(i), int(j)))
        rel.append(np.linalg.inv(poses_gt[i]) @ poses_gt[j])
    init = gt + rng.normal(0, 0.02, (K, 6)).astype(np.float32)
    init[0] = gt[0]
    out = pose_graph_cg(
        jnp.asarray(init), jnp.asarray(np.asarray(edges, np.int32)),
        jnp.asarray(np.stack(rel).astype(np.float32)), iters=5,
    )
    hist = np.asarray(out.residual_history)
    assert hist[-1] < hist[0] * 1e-3

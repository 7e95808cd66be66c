"""Point/mesh extraction (B10) + checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.csfd.single import lift
from xslam_tpu.geometry import se3
from xslam_tpu.io import ply
from xslam_tpu.models.kinfu import XSlamEngine
from xslam_tpu.ops import extract, fusion
from xslam_tpu.utils import checkpoint
from xslam_tpu.utils.evaluation import ate_rmse, normalize_to_first
from tests.helpers import SMALL_INTR, small_config, small_dataset


def _fused_volume():
    cfg = small_config()
    vol_cfg = fusion.VolumeConfig(
        tuple(cfg.tsdf_size), cfg.voxel_size, cfg.trunc_dist, cfg.max_integration_weight
    )
    w2v = np.asarray(cfg.world2volume, np.float32)
    ds = small_dataset(4, degrees_per_frame=2.0)
    vol = fusion.create_volume(vol_cfg)
    integ = jax.jit(lambda v, d, r, t: fusion.integrate(v, d, r, t, SMALL_INTR, vol_cfg))
    for i in range(4):
        dm = fusion.scale_depth(jnp.asarray(ds.get_depth(i)))
        c2v = se3.matmul(lift(jnp.asarray(w2v)), lift(jnp.asarray(ds.get_pose(i), jnp.float32)))
        v2c = se3.inverse(c2v)
        vol = integ(vol, dm, se3.rotation(v2c), se3.translation(v2c))
    return vol, vol_cfg, w2v, ds


def test_extract_points_on_surface():
    vol, vol_cfg, w2v, ds = _fused_volume()
    pc = jax.jit(lambda v: extract.extract_points(v, vol_cfg, capacity=200_000))(vol)
    n = int(pc.count)
    assert 1000 < n < 200_000
    pts = np.asarray(pc.points)[:n]
    nrm = np.asarray(pc.normals)[:n]

    # all points must lie near a TSDF zero crossing: |trilinear tsdf| small
    value = np.asarray(vol.value)
    vs = vol_cfg.voxel_size
    idx = np.clip((pts / vs).astype(int), 0, 63)
    tsdf_at = value[idx[:, 0], idx[:, 1], idx[:, 2]]
    assert np.percentile(np.abs(tsdf_at), 90) < 0.5

    # normals unit where nonzero
    norms = np.linalg.norm(nrm, axis=1)
    nz = norms > 0
    assert nz.mean() > 0.9
    np.testing.assert_allclose(norms[nz], 1.0, atol=1e-3)

    # points must be near the analytic scene surfaces: verify sphere points
    w2v_inv = np.linalg.inv(w2v)
    pts_w = (w2v_inv[:3, :3] @ pts.T).T + w2v_inv[:3, 3]
    sph = ds.scene.spheres[0]
    d_sph = np.abs(np.linalg.norm(pts_w - sph.center, axis=1) - sph.radius)
    near_sphere = d_sph < 2 * vs
    assert near_sphere.sum() > 50  # the sphere got reconstructed


def test_extract_mesh():
    vol, vol_cfg, _, _ = _fused_volume()
    mesh = jax.jit(lambda v: extract.extract_mesh(v, vol_cfg, capacity=500_000))(vol)
    n = int(mesh.count)
    assert 1000 < n < 500_000
    tris = np.asarray(mesh.vertices)[:n]
    # triangle vertices near zero crossings
    value = np.asarray(vol.value)
    vs = vol_cfg.voxel_size
    v0 = tris[:, 0]
    idx = np.clip((v0 / vs).astype(int), 0, 63)
    tsdf_at = value[idx[:, 0], idx[:, 1], idx[:, 2]]
    assert np.percentile(np.abs(tsdf_at), 90) < 0.5
    # triangles are small (within a cell diagonal)
    edge = np.linalg.norm(tris[:, 0] - tris[:, 1], axis=1)
    assert edge.max() < 2.0 * vs * np.sqrt(3)


def test_ply_roundtrip(tmp_path):
    vol, vol_cfg, _, _ = _fused_volume()
    pc = jax.jit(lambda v: extract.extract_points(v, vol_cfg, capacity=50_000))(vol)
    n = min(int(pc.count), 50_000)
    p = str(tmp_path / "cloud.ply")
    ply.export_ply(p, np.asarray(pc.points)[:n], np.asarray(pc.normals)[:n])
    rp, rn = ply.read_ply(p)
    assert rp.shape == (n, 3)


def test_checkpoint_resume(tmp_path):
    """Save mid-run, reload, continue: trajectories must match an unbroken
    run (no resume path exists in the reference)."""
    cfg = small_config(end_frame=6)
    ds = small_dataset(6, degrees_per_frame=0.5)

    # unbroken run
    e1 = XSlamEngine(cfg)
    s1 = e1.init_state()
    for i in range(6):
        s1, r1 = e1.process_frame(s1, ds.get_depth(i))
        e1.log_pose(r1)

    # broken run: 3 frames, checkpoint, reload, 3 more
    e2 = XSlamEngine(cfg)
    s2 = e2.init_state()
    for i in range(3):
        s2, r2 = e2.process_frame(s2, ds.get_depth(i))
        e2.log_pose(r2)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(path, s2, e2.pose_log)

    s3, pose_log = checkpoint.load_state(path)
    e3 = XSlamEngine(cfg)
    e3.pose_log = pose_log
    for i in range(3, 6):
        s3, r3 = e3.process_frame(s3, ds.get_depth(i))
        e3.log_pose(r3)

    np.testing.assert_allclose(e3.pose_log[5], e1.pose_log[5], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s3.volume.value), np.asarray(s1.volume.value), atol=1e-5
    )


def test_mesh_ply_export(tmp_path):
    vol, vol_cfg, _, _ = _fused_volume()
    mesh = jax.jit(lambda v: extract.extract_mesh(v, vol_cfg, capacity=100_000))(vol)
    n = int(mesh.count)
    p = str(tmp_path / "mesh.ply")
    ply.export_ply_mesh(p, np.asarray(mesh.vertices)[:n])
    with open(p) as f:
        head = f.read(400)
    assert f"element vertex {3*n}" in head
    assert f"element face {n}" in head


def test_marching_cubes_256_sphere():
    """Full 256-case MC (derived table): on a synthetic sphere TSDF the
    mesh must be watertight (every edge shared by exactly 2 triangles —
    this pins the face-saddle consistency rule), lie on the isosurface,
    be outward-oriented, and agree with the marching-tetrahedra mesh's
    surface area."""
    import jax
    import jax.numpy as jnp

    from xslam_tpu.ops.extract import extract_mesh, extract_mesh_mc
    from xslam_tpu.ops.fusion import VolumeConfig, VolumeState

    n = 48
    vsz = 0.05
    R = 0.8
    c = (n // 2) * vsz
    g = (np.arange(n) + 0.5) * vsz
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    dist = np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2)
    trunc = 3 * vsz
    sdf = np.clip((dist - R) / trunc, -1.0, 1.0).astype(np.float32)
    vol = VolumeState(
        value=jnp.asarray(sdf), grad=jnp.zeros_like(jnp.asarray(sdf)),
        weight=jnp.ones((n, n, n), jnp.float32),
    )
    cfg = VolumeConfig((n, n, n), vsz, trunc, 100)

    mc = jax.jit(lambda v: extract_mesh_mc(v, cfg, capacity=60_000))(vol)
    mt = jax.jit(lambda v: extract_mesh(v, cfg, capacity=60_000))(vol)
    k = int(mc.count)
    tris = np.asarray(mc.vertices)[:k]
    assert k > 2000

    # watertight: every undirected edge appears exactly twice
    keys = np.round(tris / (vsz * 1e-6)).astype(np.int64)  # exact-ish keys
    edge_count = {}
    for tri in keys:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e = (tuple(tri[a]), tuple(tri[b]))
            e = e if e[0] <= e[1] else (e[1], e[0])
            edge_count[e] = edge_count.get(e, 0) + 1
    counts = np.array(list(edge_count.values()))
    assert (counts == 2).all(), (
        f"non-manifold edges: {np.unique(counts, return_counts=True)}"
    )

    # vertices on the isosurface (|dist - R| well under a voxel)
    verts = tris.reshape(-1, 3)
    r = np.linalg.norm(verts - c, axis=-1)
    assert np.abs(r - R).max() < 0.6 * vsz

    # outward orientation for the vast majority (sphere: normal ~ radial)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    nrm = np.cross(e1, e2)
    radial = tris.mean(1) - c
    dots = (nrm * radial).sum(-1)
    assert (dots > 0).mean() > 0.99, (dots > 0).mean()

    def area(t):
        return 0.5 * np.linalg.norm(
            np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=-1
        ).sum()

    a_mc = area(tris)
    a_mt = area(np.asarray(mt.vertices)[: int(mt.count)])
    a_true = 4 * np.pi * R * R
    assert abs(a_mc - a_true) / a_true < 0.03, (a_mc, a_true)
    assert abs(a_mc - a_mt) / a_true < 0.05, (a_mc, a_mt)

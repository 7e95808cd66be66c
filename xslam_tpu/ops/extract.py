"""Surface extraction from the TSDF volume: points, normals, mesh.

TPU-native re-design of ``XKinectFusion/src/ExtractPointCloud.cu``. The
reference compacts zero-crossing points with warp ballot/scan plus a global
atomic cursor (``extractKernel``, ExtractPointCloud.cu:25-210); here the
stream compaction is a mask + ``jnp.cumsum`` scatter into a fixed-capacity
buffer — deterministic, race-free, and XLA-friendly (SURVEY.md §2.E row 5).

Mesh extraction: the reference carries a classic 256-case marching-cubes
kernel (``extractMeshKernal``, ExtractPointCloud.cu:364-715) that is declared
but never invoked by the public API (``ExportPointCloud`` uses points +
normals only, KinectFusionReconstruction.cpp:334-372). We provide BOTH: the
TPU-native default is *marching tetrahedra* (6 tets/cell, 3-bit case index —
a uniform vectorizable code path), and :func:`extract_mesh_mc` is the full
256-case marching cubes with a table DERIVED at import (face-consistent
saddle rule, watertightness pinned by test) rather than transcribed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..csfd.single import lift
from .fusion import VolumeConfig, VolumeState
from .sampling import trilinear_tsdf


class PointCloud(NamedTuple):
    points: jnp.ndarray  # (capacity, 3) f32, valid entries first
    normals: jnp.ndarray  # (capacity, 3) f32
    count: jnp.ndarray  # int32 scalar


def _edge_crossings(value, weight, axis, voxel_size):
    """Zero-crossing detection + linear interpolation along one +axis edge.

    Mirrors extractKernel's per-axis checks: both voxels must be observed
    (weight > 0) and non-saturated, with a strict sign change.
    """
    F0 = value
    W0 = weight
    F1 = jnp.roll(value, -1, axis)
    W1 = jnp.roll(weight, -1, axis)
    # exclude wrap-around at the far face
    idx = jnp.arange(value.shape[axis])
    last = (idx == value.shape[axis] - 1).reshape(
        [-1 if a == axis else 1 for a in range(3)]
    )
    observed = (W0 > 0) & (W1 > 0) & (jnp.abs(F0) < 1.0) & (jnp.abs(F1) < 1.0)
    crossing = observed & ~last & (jnp.sign(F0) != jnp.sign(F1)) & (F0 != 0)
    denom = jnp.where(F0 - F1 == 0.0, 1.0, F0 - F1)
    frac = jnp.clip(F0 / denom, 0.0, 1.0)
    return crossing, frac


def extract_points(
    vol: VolumeState, cfg: VolumeConfig, capacity: int = 500_000, x_offset: int = 0
) -> PointCloud:
    """Zero-crossing surface points with trilinear central-difference normals
    (``extractPoints`` + ``extractNormals``, ExtractPointCloud.cu:188-362).

    Returns a fixed-capacity buffer (the reference likewise caps output via a
    user buffer, DEFAULT_CLOUD_BUFFER_SIZE, Internal.h:40) with ``count``
    valid leading entries. Points are in volume metric coordinates.
    """
    X, Y, Z = vol.value.shape
    vs = cfg.voxel_size
    cx = (jnp.arange(X, dtype=jnp.float32) + 0.5)[:, None, None] + x_offset
    cy = (jnp.arange(Y, dtype=jnp.float32) + 0.5)[None, :, None]
    cz = (jnp.arange(Z, dtype=jnp.float32) + 0.5)[None, None, :]

    pts_list = []
    mask_list = []
    for axis in range(3):
        crossing, frac = _edge_crossings(vol.value, vol.weight, axis, vs)
        px = (cx + jnp.where(axis == 0, frac, 0.0)) * vs
        py = (cy + jnp.where(axis == 1, frac, 0.0)) * vs
        pz = (cz + jnp.where(axis == 2, frac, 0.0)) * vs
        pts = jnp.stack(
            [jnp.broadcast_to(px, (X, Y, Z)), jnp.broadcast_to(py, (X, Y, Z)),
             jnp.broadcast_to(pz, (X, Y, Z))], -1
        ).reshape(-1, 3)
        pts_list.append(pts)
        mask_list.append(crossing.reshape(-1))

    all_pts = jnp.concatenate(pts_list)
    all_mask = jnp.concatenate(mask_list)

    # cumsum compaction into the fixed buffer
    pos = jnp.cumsum(all_mask.astype(jnp.int32)) - 1
    count = jnp.minimum(pos[-1] + 1, capacity)
    dest = jnp.where(all_mask & (pos < capacity), pos, capacity)  # overflow row
    buf = jnp.zeros((capacity + 1, 3), jnp.float32).at[dest].set(all_pts)
    points = buf[:capacity]

    # normals: central differences of the trilinear TSDF at each point
    # (extractNormalsKernel, ExtractPointCloud.cu:213-362)
    half = 0.5 * vs
    px, py, pz = (points[:, i] - x_offset * vs * (i == 0) for i in range(3))

    def tsdf_at(ax_shift, sign):
        q = [px, py, pz]
        q[ax_shift] = q[ax_shift] + sign * half
        out = trilinear_tsdf(
            vol.value, vol.grad, lift(q[0]), lift(q[1]), lift(q[2]), vs
        )
        return out.v

    n = jnp.stack(
        [tsdf_at(0, 1) - tsdf_at(0, -1),
         tsdf_at(1, 1) - tsdf_at(1, -1),
         tsdf_at(2, 1) - tsdf_at(2, -1)], -1
    )
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    normals = jnp.where(norm > 0, n / jnp.maximum(norm, 1e-20), 0.0)
    normals = jnp.nan_to_num(normals)
    return PointCloud(points=points, normals=normals, count=count)


# ---------------------------------------------------------------- mesh (MT)
# Tetrahedron decomposition of a cube (6 tets sharing the 0-6 diagonal);
# corner ids index _CORNERS below. Host-side numpy so table indexing stays
# concrete under jit.
import numpy as _np

# Kuhn triangulation: tets (0, a, a|b, 7) over the 6 monotone paths
# 0 -> axis -> axis-pair -> 7; they exactly tile the cube.
_TETS = _np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 5, 7],
        [0, 2, 3, 7],
        [0, 2, 6, 7],
        [0, 4, 5, 7],
        [0, 4, 6, 7],
    ],
    _np.int32,
)
# cube corner offsets indexed by corner id
_CORNERS = _np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
    _np.int32,
)


class Mesh(NamedTuple):
    vertices: jnp.ndarray  # (capacity, 3, 3): triangle vertex positions
    count: jnp.ndarray  # number of valid triangles


def extract_mesh(
    vol: VolumeState, cfg: VolumeConfig, capacity: int = 1_000_000
) -> Mesh:
    """Isosurface triangles by marching tetrahedra over observed cells."""
    X, Y, Z = vol.value.shape
    vs = cfg.voxel_size

    # corner fields for each cell (X-1, Y-1, Z-1)
    def corner(c):
        dx, dy, dz = int(_CORNERS[c, 0]), int(_CORNERS[c, 1]), int(_CORNERS[c, 2])
        return (
            vol.value[dx : X - 1 + dx, dy : Y - 1 + dy, dz : Z - 1 + dz],
            vol.weight[dx : X - 1 + dx, dy : Y - 1 + dy, dz : Z - 1 + dz],
        )

    Fs, Ws = zip(*[corner(c) for c in range(8)])
    F = jnp.stack(Fs, -1).reshape(-1, 8)  # (cells, 8)
    W = jnp.stack(Ws, -1).reshape(-1, 8)
    observed = jnp.all((W > 0) & (jnp.abs(F) < 1.0), axis=-1)

    nx, ny, nz = X - 1, Y - 1, Z - 1
    cix = jnp.arange(nx * ny * nz, dtype=jnp.int32)
    base = jnp.stack([cix // (ny * nz), (cix // nz) % ny, cix % nz], -1)  # (cells,3)

    # per-code triangle tables over the 6 tet edges
    # edge order: 0:(0,1) 1:(0,2) 2:(0,3) 3:(1,2) 4:(1,3) 5:(2,3)
    _E = {(0, 1): 0, (0, 2): 1, (0, 3): 2, (1, 2): 3, (1, 3): 4, (2, 3): 5}
    _CASES = {
        1: [[(0, 1), (0, 2), (0, 3)]],
        2: [[(0, 1), (1, 3), (1, 2)]],
        3: [[(0, 2), (0, 3), (1, 3)], [(0, 2), (1, 3), (1, 2)]],
        4: [[(0, 2), (1, 2), (2, 3)]],
        5: [[(0, 1), (1, 2), (2, 3)], [(0, 1), (2, 3), (0, 3)]],
        6: [[(0, 1), (0, 2), (2, 3)], [(0, 1), (2, 3), (1, 3)]],
        7: [[(0, 3), (1, 3), (2, 3)]],
    }
    tri1 = [[0, 0, 0] for _ in range(16)]
    tri2 = [[0, 0, 0] for _ in range(16)]
    n_tris = [0] * 16
    for lo, tris_ in _CASES.items():
        for cc in (lo, 15 - lo):
            tri1[cc] = [_E[e] for e in tris_[0]]
            n_tris[cc] = len(tris_)
            if len(tris_) > 1:
                tri2[cc] = [_E[e] for e in tris_[1]]
    tri1_t = jnp.array(tri1, jnp.int32)
    tri2_t = jnp.array(tri2, jnp.int32)
    ntris_t = jnp.array(n_tris, jnp.int32)
    edge_ends = jnp.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], jnp.int32)

    tris_all = []
    mask_all = []
    for t in range(6):
        ids = _TETS[t]
        f = F[:, ids]  # (cells, 4)
        inside = f < 0.0
        code = (
            inside[:, 0].astype(jnp.int32)
            + 2 * inside[:, 1].astype(jnp.int32)
            + 4 * inside[:, 2].astype(jnp.int32)
            + 8 * inside[:, 3].astype(jnp.int32)
        )
        corners_pos = ((base[:, None, :] + _CORNERS[ids]).astype(jnp.float32) + 0.5) * vs

        # interpolated points on all 6 tet edges: (cells, 6, 3)
        fi = f[:, edge_ends[:, 0]]
        fj = f[:, edge_ends[:, 1]]
        denom = jnp.where(fi - fj == 0.0, 1.0, fi - fj)
        frac = jnp.clip(fi / denom, 0.0, 1.0)[..., None]
        pi = corners_pos[:, edge_ends[:, 0]]
        pj = corners_pos[:, edge_ends[:, 1]]
        e_pts = pi * (1 - frac) + pj * frac  # (cells, 6, 3)

        for tbl, which in ((tri1_t, 1), (tri2_t, 2)):
            edge_idx = tbl[code]  # (cells, 3)
            verts = jnp.take_along_axis(e_pts, edge_idx[..., None], axis=1)
            m = observed & (ntris_t[code] >= which)
            tris_all.append(verts)
            mask_all.append(m)

    tris = jnp.concatenate(tris_all)  # (M, 3, 3)
    mask = jnp.concatenate(mask_all)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    count = jnp.minimum(pos[-1] + 1, capacity)
    dest = jnp.where(mask & (pos < capacity), pos, capacity)
    buf = jnp.zeros((capacity + 1, 3, 3), jnp.float32).at[dest].set(tris)
    return Mesh(vertices=buf[:capacity], count=count)


# ------------------------------------------------------------- mesh (MC-256)
# Full 256-case marching cubes (the reference's extractMeshKernal capability,
# ExtractPointCloud.cu:364-715 — dead code in its own public path). The
# triangle table is DERIVED here rather than transcribed: for every 8-bit
# corner-sign case, each cube face contributes marching-squares segments
# between its crossing edges (the 4-crossing face saddle always isolates the
# cycle's odd corners — neighbouring cells see the shared face with the same
# cyclic order, so the choice is consistent and the mesh watertight); the
# segments form degree-2 loops over the 12 cube edges (each crossing edge
# belongs to exactly 2 faces), which are fan-triangulated and oriented
# toward the outside (positive TSDF) by the edge-midpoint normal test.

# 12 cube edges as corner-id pairs (x-, y-, z-aligned groups)
_MC_EDGES = _np.array(
    [[0, 1], [2, 3], [4, 5], [6, 7],
     [0, 2], [1, 3], [4, 6], [5, 7],
     [0, 4], [1, 5], [2, 6], [3, 7]],
    _np.int32,
)


def _build_mc_table():
    eid = {frozenset(map(int, e)): i for i, e in enumerate(_MC_EDGES)}
    faces = [(0, 2, 6, 4), (1, 3, 7, 5), (0, 1, 5, 4),
             (2, 3, 7, 6), (0, 1, 3, 2), (4, 5, 7, 6)]
    mids = _MC_EDGES.astype(_np.float64)
    mids = 0.5 * (_CORNERS[mids[:, 0].astype(int)] + _CORNERS[mids[:, 1].astype(int)])
    table = []
    max_t = 0
    for case in range(256):
        inside = [(case >> c) & 1 for c in range(8)]
        segs = []
        for cyc in faces:
            pts = []
            for k in range(4):
                a, b = cyc[k], cyc[(k + 1) % 4]
                if inside[a] != inside[b]:
                    pts.append(eid[frozenset((a, b))])
            if len(pts) == 2:
                segs.append((pts[0], pts[1]))
            elif len(pts) == 4:
                # saddle: isolate cyc[1] and cyc[3] (consistent across the
                # two cells sharing this face — same cyclic order)
                segs.append((pts[0], pts[1]))
                segs.append((pts[2], pts[3]))
        # stitch degree-2 segments into closed loops over edge ids
        adj = {}
        for a, b in segs:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        seen = set()
        tris = []
        ci = [c for c in range(8) if inside[c]]
        co = [c for c in range(8) if not inside[c]]
        if ci and co:
            d_out = _CORNERS[co].mean(0) - _CORNERS[ci].mean(0)
            for start in list(adj):
                if start in seen:
                    continue
                loop = [start]
                seen.add(start)
                prev, cur = None, start
                while True:
                    nxt = [n for n in adj[cur] if n != prev]
                    # both neighbours unvisited at the start: pick either
                    step = nxt[0] if nxt[0] not in seen or nxt[0] != loop[0] or len(loop) < 3 else nxt[-1]
                    if step == loop[0] and len(loop) >= 3:
                        break
                    prev, cur = cur, step
                    loop.append(cur)
                    seen.add(cur)
                    if len(loop) > 12:
                        raise AssertionError(f"runaway loop in case {case}")
                for k in range(1, len(loop) - 1):
                    i, j, l = loop[0], loop[k], loop[k + 1]
                    n = _np.cross(mids[j] - mids[i], mids[l] - mids[i])
                    tris.append([i, l, j] if float(n @ d_out) < 0 else [i, j, l])
        max_t = max(max_t, len(tris))
        table.append(tris)
    out = _np.full((256, max_t, 3), -1, _np.int32)
    for case, tris in enumerate(table):
        for t, tri in enumerate(tris):
            out[case, t] = tri
    return out


_MC_TABLE = _build_mc_table()  # (256, max_tris, 3) edge ids, -1 padded


def extract_mesh_mc(
    vol: VolumeState, cfg: VolumeConfig, capacity: int = 1_000_000,
    slab: int = 16,
) -> Mesh:
    """Isosurface triangles by full 256-case marching cubes over observed
    cells — same contract as :func:`extract_mesh` (fixed-capacity
    compacted buffer), classic MC connectivity instead of tetrahedra.

    The cell sweep runs in X-slabs of ``slab`` cells with per-slab
    compaction into the shared output buffer: peak transients are
    O(slab * Y * Z) instead of O(X * Y * Z) — at the canonical 256^3 the
    unchunked per-cell tensors (F/W (cells,8), e_pts (cells,12,3), the
    (cells*T,3,3) triangle stack) were multiple GB (ADVICE round 4);
    slab=16 keeps them under ~200 MB with identical output content
    (triangle ORDER is slab-major rather than case-row-major — consumers
    are order-insensitive)."""
    X, Y, Z = vol.value.shape
    vs = cfg.voxel_size
    table = jnp.asarray(_MC_TABLE)  # (256, T, 3)

    buf = jnp.zeros((capacity + 1, 3, 3), jnp.float32)
    count = jnp.int32(0)

    for x0 in range(0, X - 1, slab):
        nx = min(slab, X - 1 - x0)

        def corner(c):
            dx, dy, dz = int(_CORNERS[c, 0]), int(_CORNERS[c, 1]), int(_CORNERS[c, 2])
            return (
                vol.value[x0 + dx : x0 + nx + dx, dy : Y - 1 + dy, dz : Z - 1 + dz],
                vol.weight[x0 + dx : x0 + nx + dx, dy : Y - 1 + dy, dz : Z - 1 + dz],
            )

        Fs, Ws = zip(*[corner(c) for c in range(8)])
        F = jnp.stack(Fs, -1).reshape(-1, 8)
        W = jnp.stack(Ws, -1).reshape(-1, 8)
        observed = jnp.all((W > 0) & (jnp.abs(F) < 1.0), axis=-1)

        ny, nz = Y - 1, Z - 1
        cix = jnp.arange(nx * ny * nz, dtype=jnp.int32)
        base = jnp.stack(
            [x0 + cix // (ny * nz), (cix // nz) % ny, cix % nz], -1
        )

        inside = (F < 0.0).astype(jnp.int32)
        case = jnp.sum(
            inside * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=-1
        )

        corners_pos = (
            (base[:, None, :] + _CORNERS[None, :, :]).astype(jnp.float32) + 0.5
        ) * vs
        fi = F[:, _MC_EDGES[:, 0]]
        fj = F[:, _MC_EDGES[:, 1]]
        denom = jnp.where(fi - fj == 0.0, 1.0, fi - fj)
        frac = jnp.clip(fi / denom, 0.0, 1.0)[..., None]
        pi = corners_pos[:, _MC_EDGES[:, 0]]
        pj = corners_pos[:, _MC_EDGES[:, 1]]
        e_pts = pi * (1 - frac) + pj * frac  # (slab cells, 12, 3)

        tris_all, mask_all = [], []
        for t in range(_MC_TABLE.shape[1]):
            edge_idx = table[case, t]  # (cells, 3)
            valid = observed & (edge_idx[:, 0] >= 0)
            verts = jnp.take_along_axis(
                e_pts, jnp.maximum(edge_idx, 0)[..., None], axis=1
            )
            tris_all.append(verts)
            mask_all.append(valid)

        tris = jnp.concatenate(tris_all)
        mask = jnp.concatenate(mask_all)
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dest = jnp.where(mask & (count + pos < capacity), count + pos, capacity)
        buf = buf.at[dest].set(tris)
        count = jnp.minimum(count + pos[-1] + 1, capacity)

    return Mesh(vertices=buf[:capacity], count=count)

"""Multi-chip spatially-sharded SLAM: shard_map stages with halo exchange.

New component (the reference is single-GPU; SURVEY.md §2.E "Distributed
communication backend"). Partitioning scheme:

* **TSDF volume**: X-slabs over the ``space`` mesh axis. Fusion is
  embarrassingly parallel (each shard integrates its slab with the proper
  global ``x_offset``; the depth frame is replicated). Raycasting exchanges
  a halo of boundary rows with both neighbours via ``lax.ppermute`` over ICI,
  marches locally, and resolves global ray ownership with ``lax.pmin`` over
  per-shard first-crossing/first-death times (each global event has exactly
  one owning shard — the one whose core rows contain the current sample
  voxel), then ``lax.psum``-combines the refined vertex/normal maps.
* **ICP**: pixel rows sharded over the same axis; the dual 6x7 system is
  reduced with ``lax.psum`` (the cross-chip generalization of the
  reference's two-stage in-GPU reduction, ICP.cu:365-429).

The halo width covers the worst-case X-extent of refinement stencils:
march step (0.8*trunc = 2.4 voxels) + trilinear/normal taps (~2.5) -> 6.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..csfd.single import CSFD
from ..ops import fusion, icp, raycast
from .mesh import SPACE_AXIS

try:
    from jax import shard_map as _shard_map  # jax >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _halo_width(cfg: fusion.VolumeConfig, local_x: int) -> int:
    step_vox = int(np.ceil(0.8 * cfg.trunc_dist / cfg.voxel_size))
    return min(step_vox + 3, local_x)


def sharded_integrate(
    vol, depth_m, r_v2c, t_v2c, intr, vol_cfg, bi_threshold, mesh,
    fusion_mode: str = "dense", brick_cap: int = 2048,
    classify_fine: bool = False, classify_split: bool = False,
    subcell_cap: int = 0,
):
    """Per-slab fusion; the only communication is the psum'd overflow flag.
    ``fusion_mode="brick"`` runs the brick-compacted variant per shard (each
    slab classifies and compacts its own bricks; ``brick_cap`` is the
    per-shard active cap). Returns ``(volume, any_shard_overflowed)``."""

    def stage(vol, depth_m, r_v2c, t_v2c):
        idx = jax.lax.axis_index(SPACE_AXIS)
        local_x = vol.value.shape[0]
        if fusion_mode == "brick":
            from ..ops import fusion_brick

            out, overflow = fusion_brick.integrate_brick(
                vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                bi_threshold=bi_threshold, cap=brick_cap,
                x_offset=idx * local_x, classify_fine=classify_fine,
                classify_split=classify_split,
                subcell_cap=subcell_cap,
            )
        else:
            out = fusion.integrate(
                vol, depth_m, r_v2c, t_v2c, intr, vol_cfg,
                bi_threshold=bi_threshold, x_offset=idx * local_x,
            )
            overflow = jnp.bool_(False)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), SPACE_AXIS) > 0
        return out, overflow

    from jax.sharding import PartitionSpec as P

    vol_spec = fusion.VolumeState(
        value=P(SPACE_AXIS, None, None),
        grad=P(SPACE_AXIS, None, None),
        weight=P(SPACE_AXIS, None, None),
    )
    return _shard_map(
        stage,
        mesh=mesh,
        in_specs=(vol_spec, P(), CSFD(P(), P()), CSFD(P(), P())),
        out_specs=(vol_spec, P()),
        check_vma=False,
    )(vol, depth_m, r_v2c, t_v2c)


def _exchange_halo(arr: jnp.ndarray, h: int, n_shards: int):
    """Fetch left/right neighbour boundary rows over the ring."""
    idx = jnp.arange(n_shards)
    fwd = [(int(i), int((i + 1) % n_shards)) for i in range(n_shards)]
    bwd = [(int(i), int((i - 1) % n_shards)) for i in range(n_shards)]
    left = jax.lax.ppermute(arr[-h:], SPACE_AXIS, fwd)  # from left neighbour
    right = jax.lax.ppermute(arr[:h], SPACE_AXIS, bwd)  # from right neighbour
    return jnp.concatenate([left, arr, right], axis=0)


def sharded_raycast(vol, r_c2v, t_c2v, r_v2w, t_v2w, intr, vol_cfg, mesh,
                    normals_mode: str = "tsdf"):
    n_shards = mesh.shape[SPACE_AXIS]

    def stage(vol, r_c2v, t_c2v, r_v2w, t_v2w):
        idx = jax.lax.axis_index(SPACE_AXIS)
        local_x = vol.value.shape[0]
        x_total = local_x * n_shards
        h = _halo_width(vol_cfg, local_x)

        value_ext = _exchange_halo(vol.value, h, n_shards)
        grad_ext = _exchange_halo(vol.grad, h, n_shards)
        vol_ext = fusion.VolumeState(value=value_ext, grad=grad_ext, weight=vol.weight)

        spec = raycast.ShardSpec(
            x_base=idx * local_x - h,
            x_total=x_total,
            core_start=idx * local_x,
            core_end=(idx + 1) * local_x,
        )

        ray_dir, ray_start = raycast._camera_rays(r_c2v, t_c2v, intr)
        hit = raycast.march(value_ext, ray_start, ray_dir, vol_cfg, spec)

        t_found_min = jax.lax.pmin(hit.t_found, SPACE_AXIS)
        t_dead_min = jax.lax.pmin(hit.t_dead, SPACE_AXIS)
        accept = (t_found_min < raycast.INF_T) & (t_found_min < t_dead_min)
        owner = accept & (hit.t_found == t_found_min)

        vmap, nmap, v_ok, n_ok = raycast.refine(
            vol_ext, ray_start, ray_dir, t_found_min, owner, r_v2w, t_v2w, vol_cfg, spec,
            normals_mode=normals_mode,
        )
        psum = lambda x: jax.lax.psum(x, SPACE_AXIS)
        vmap = CSFD(psum(vmap.v), psum(vmap.g))
        nmap = CSFD(psum(nmap.v), psum(nmap.g))
        v_ok = psum(v_ok.astype(jnp.int32)) > 0
        n_ok = psum(n_ok.astype(jnp.int32)) > 0
        vmap, nmap = raycast.finalize_maps(vmap, nmap, v_ok, n_ok)
        if normals_mode == "screen":
            nmap = raycast.screen_normals(vmap)
        return vmap, nmap

    from jax.sharding import PartitionSpec as P

    vol_spec = fusion.VolumeState(
        value=P(SPACE_AXIS, None, None),
        grad=P(SPACE_AXIS, None, None),
        weight=P(SPACE_AXIS, None, None),
    )
    dual = CSFD(P(), P())
    return _shard_map(
        stage,
        mesh=mesh,
        in_specs=(vol_spec, dual, dual, dual, dual),
        out_specs=(CSFD(P(), P()), CSFD(P(), P())),
        check_vma=False,
    )(vol, r_c2v, t_c2v, r_v2w, t_v2w)


def sharded_icp_system(
    r_curr, t_curr, vmap_curr, nmap_curr, r_prev_inv, t_prev, intr,
    vmap_g_prev, nmap_g_prev, dist_thres, angle_thres, mesh, assoc=None,
):
    """Row-sharded correspondence search + psum'd 6x7 reduction. ``assoc``
    (from :func:`sharded_associate`, column-sharded) skips the per-iteration
    projection+gather — the ``icp_fixed_assoc`` fast path."""

    def stage(vmap_c, nmap_c, vprev, nprev, r_curr, t_curr, r_prev_inv, t_prev,
              *maybe_assoc):
        sys_local = icp.build_system(
            r_curr, t_curr, vmap_c, nmap_c, r_prev_inv, t_prev, intr,
            vprev, nprev, dist_thres, angle_thres,
            assoc=maybe_assoc[0] if maybe_assoc else None,
        )
        psum = lambda x: jax.lax.psum(x, SPACE_AXIS)
        return icp.IcpSystem(
            A=CSFD(psum(sys_local.A.v), psum(sys_local.A.g)),
            b=CSFD(psum(sys_local.b.v), psum(sys_local.b.g)),
            inlier_count=psum(sys_local.inlier_count),
        )

    from jax.sharding import PartitionSpec as P

    # shard the *current* maps over image columns (all pyramid widths are
    # multiples of the mesh size; heights are not). The previous-model maps
    # stay replicated: they are the projection target of the correspondence
    # gather, which may land on any column.
    cols = P(None, None, SPACE_AXIS)
    dual_cols = CSFD(cols, cols)
    dual = CSFD(P(), P())
    in_specs = [cols, cols, dual, dual, dual, dual, dual, dual]
    args = [vmap_curr, nmap_curr, vmap_g_prev, nmap_g_prev, r_curr, t_curr,
            r_prev_inv, t_prev]
    if assoc is not None:
        in_specs.append(icp.Association(
            nprev_g=dual_cols, vprev_g=dual_cols, in_img=P(None, SPACE_AXIS)
        ))
        args.append(assoc)
    return _shard_map(
        stage,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=icp.IcpSystem(A=dual, b=dual, inlier_count=P()),
        check_vma=False,
    )(*args)


# ---------------------------------------------------------------------------
# Brick-major fast path ("gather" strategy — pixel-sharded raycast)
#
# The slab-ownership raycast above replicates the march work on every shard
# (each shard samples every pixel and claims only its core's events) — it
# scales MEMORY, not march time. The brick-major fast path instead shards the
# *pixels*: brick rows stay slab-sharded for fusion (scatter-local), the
# raycaster all-gathers the value/grad rows once per frame (2 x NB x 512 x 4 B
# — ~134 MB at 256^3, a few ms over ICI) plus a few-KB event-brick mask, and
# each chip marches/refines only its own column block with bit-identical
# single-chip semantics. March, refinement, and ICP gathers — the measured
# bottleneck (BASELINE.md) — then genuinely scale 1/N per chip.


def _brick_row_specs():
    from jax.sharding import PartitionSpec as P

    from ..ops.bricks import BrickVolume

    rows = P(SPACE_AXIS, None)
    return BrickVolume(value=rows, grad=rows, weight=rows)


def sharded_integrate_rows(
    bvol, depth_m, r_v2c, t_v2c, intr, vol_cfg, bi_threshold, mesh,
    brick_cap: int = 2048, classify_fine: bool = False, classify_split: bool = False,
    subcell_cap: int = 0,
):
    """Per-slab brick fusion over a row-sharded BrickVolume (rows are
    bx-major, so a contiguous row range is an X-slab). Communication: the
    psum'd overflow flag only. ``brick_cap`` is the per-shard ACTIVE cap."""
    import dataclasses

    from ..ops import fusion_brick

    n = mesh.shape[SPACE_AXIS]
    X, Y, Z = vol_cfg.resolution
    local_x = X // n
    local_cfg = dataclasses.replace(vol_cfg, resolution=(local_x, Y, Z))

    def stage(vol, depth_m, r_v2c, t_v2c):
        idx = jax.lax.axis_index(SPACE_AXIS)
        out, overflow = fusion_brick.integrate_rows(
            vol, depth_m, r_v2c, t_v2c, intr, local_cfg,
            bi_threshold=bi_threshold, cap=brick_cap,
            x_offset=idx * local_x, classify_fine=classify_fine,
                classify_split=classify_split,
                subcell_cap=subcell_cap,
        )
        overflow = jax.lax.psum(overflow.astype(jnp.int32), SPACE_AXIS) > 0
        return out, overflow

    from jax.sharding import PartitionSpec as P

    spec = _brick_row_specs()
    return _shard_map(
        stage,
        mesh=mesh,
        in_specs=(spec, P(), CSFD(P(), P()), CSFD(P(), P())),
        out_specs=(spec, P()),
        check_vma=False,
    )(bvol, depth_m, r_v2c, t_v2c)


def sharded_raycast_bricks(
    bvol, r_c2v, t_c2v, r_v2w, t_v2w, intr, vol_cfg, mesh,
    normals_mode: str = "screen", march_mode: str = "skip",
    hier_window: int = 12, packed_taps: bool = True, skip_gran: int = 8,
    compact: bool = False, pair_taps: bool = False, quad_taps: bool = False,
    t_anchor=None, temporal_window: int = 12,
    temporal_min_coverage: float = 0.5, return_hit: bool = False,
    refine_mode: str = "secant2", temporal_phase1: int = 0,
    temporal_cap_frac: float = 0.16,
):
    """Pixel-sharded brick raycast: all-gather the brick rows, march/refine
    a per-chip column block. ``march_mode="skip"`` is bit-identical to the
    single-chip skip march per pixel; "hier_skip" differs only at column-block
    edges (the coarse 2x2 anchor neighbourhood is clipped there — same
    approximation class, gated downstream like all hier modes). For
    ``normals_mode="screen"`` the caller derives normals from the assembled
    vertex map (column-boundary pixels need their neighbours).
    ``march_mode="temporal"`` slices the replicated ``t_anchor`` map per
    column block (block-edge pixels lose their right-neighbour anchors —
    the hier-mode column-edge approximation class); the refresh cond is
    PER SHARD, which is sound (each branch yields valid hits)."""
    from ..ops import bricks
    from ..ops.bricks import BrickVolume
    from ..ops.raycast_bricks import raycast_bricks_rays

    n = mesh.shape[SPACE_AXIS]
    res = vol_cfg.resolution
    temporal = march_mode == "temporal"
    if temporal and t_anchor is None:
        raise ValueError("march_mode='temporal' requires t_anchor")

    def stage(vol, r_c2v, t_c2v, r_v2w, t_v2w, *maybe_anchor):
        idx = jax.lax.axis_index(SPACE_AXIS)
        value = jax.lax.all_gather(vol.value, SPACE_AXIS, tiled=True)
        grad = jax.lax.all_gather(vol.grad, SPACE_AXIS, tiled=True)
        # weight is only consulted by the skip-row builders (bypassed:
        # packed injected)
        full = BrickVolume(value=value, grad=grad, weight=value)
        if skip_gran == 8:
            ev = jax.lax.all_gather(
                bricks.event_brick_mask(vol), SPACE_AXIS, tiled=True
            )
            dist = bricks.distance_from_event_mask(ev, res)
            packed = bricks.pack_rows(value, dist)
        else:
            # the 4^3 sub-brick mask grid is bx-major in axis 0 like the
            # rows, so tiled all-gather of per-slab grids assembles it
            local_res = (vol.value.shape[0] * 512 // (res[1] * res[2]), res[1], res[2])
            ev4 = jax.lax.all_gather(
                bricks.event_mask4(vol, local_res), SPACE_AXIS, tiled=True
            )
            packed = bricks.pack_rows4(value, bricks.distance_grid(ev4), res)

        ray_dir, ray_start = raycast._camera_rays(r_c2v, t_c2v, intr)
        wl = ray_dir.v.shape[-1] // n
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * wl, wl, axis=-1)
        ray_dir = CSFD(sl(ray_dir.v), sl(ray_dir.g))
        anchor = sl(maybe_anchor[0]) if temporal else None
        return raycast_bricks_rays(
            full, ray_start, ray_dir, r_v2w, t_v2w, vol_cfg,
            normals_mode=normals_mode, march_mode=march_mode,
            hier_window=hier_window, packed=packed, apply_screen=False,
            packed_taps=packed_taps, skip_gran=skip_gran, compact=compact,
            pair_taps=pair_taps, quad_taps=quad_taps,
            t_anchor=anchor, temporal_window=temporal_window,
            temporal_min_coverage=temporal_min_coverage,
            return_hit=return_hit, refine_mode=refine_mode,
            temporal_phase1=temporal_phase1,
            temporal_cap_frac=temporal_cap_frac,
        )

    from jax.sharding import PartitionSpec as P

    spec = _brick_row_specs()
    dual = CSFD(P(), P())
    cols = CSFD(P(None, None, SPACE_AXIS), P(None, None, SPACE_AXIS))
    in_specs = [spec, dual, dual, dual, dual]
    args = [bvol, r_c2v, t_c2v, r_v2w, t_v2w]
    if temporal:
        in_specs.append(P())  # replicated anchor map, sliced per shard
        args.append(t_anchor)
    out_specs = (cols, cols, P(None, SPACE_AXIS)) if return_hit else (cols, cols)
    return _shard_map(
        stage,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )(*args)


def sharded_associate(
    r_curr, t_curr, vmap_curr, r_prev_inv, t_prev, intr,
    vmap_g_prev, nmap_g_prev, mesh,
):
    """Column-sharded projective association (the gather-heavy half of an
    ICP iteration) — computed once per level under ``icp_fixed_assoc`` and
    reused across the level's iterations, like the single-chip fast path."""

    def stage(vmap_c, vprev, nprev, r_curr, t_curr, r_prev_inv, t_prev):
        return icp.associate(
            r_curr, t_curr, vmap_c, r_prev_inv, t_prev, intr, vprev, nprev
        )

    from jax.sharding import PartitionSpec as P

    cols = P(None, None, SPACE_AXIS)
    dual_cols = CSFD(cols, cols)
    dual = CSFD(P(), P())
    out = icp.Association(
        nprev_g=dual_cols, vprev_g=dual_cols, in_img=P(None, SPACE_AXIS)
    )
    return _shard_map(
        stage,
        mesh=mesh,
        in_specs=(cols, dual, dual, dual, dual, dual, dual),
        out_specs=out,
        check_vma=False,
    )(vmap_curr, vmap_g_prev, nmap_g_prev, r_curr, t_curr, r_prev_inv, t_prev)

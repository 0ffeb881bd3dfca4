"""Distributed map rebuild: scan-sharded rasterization + strip-sharded EDT.

reference: GraphSlam2D::generateOccupancyMap re-rasterizes every key-pose
cloud after a pose-graph optimization (src/graph_slam2d.cpp:131-164) — a
sequential per-scan loop in the reference, and a batch job here.

This module is the "map-patch sharding" axis of the parallelism inventory
(SURVEY §2.3): the spatial analogue of tensor sharding. Two phases:

1. **Rasterize — shard over scans.** Hit/visit counts are additive and
   order-independent, so each device deposits its scan subset into a dense
   global count grid with the MXU one-hot contraction
   (ops/scatter_matmul.py — the [S_local*N] element stream accumulates
   across chunks inside the kernel), and one ``psum`` over the mesh merges
   the partial grids. The final ``4*occ > vis`` obstacle mask from totals
   equals the reference's sequential end state exactly
   (frequency_occupancy_map.cpp:40-44; see sdm/mapping.py).
2. **Distance field — shard over row strips.** The exact capped EDT
   (sdm/distance.py) splits by rows: the vertical min-plus pass needs a
   ``radius``-row halo from the neighboring strips (one ``ppermute`` up and
   one down), after which the horizontal lower-envelope pass is row-local.
   Each device transforms ``H/ndev`` rows; output is bit-identical to the
   single-device EDT.

Both phases compile and run on any `jax.sharding.Mesh` (validated on the
8-device virtual CPU mesh; see tests/test_map_rebuild.py and
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import scatter_matmul
from ..sdm import mapping as mapping_mod
from ..sdm import pool as pool_mod
from ..sdm.distance import edt2d
from ..sdm.geometry import MapGeometry


class DenseRebuild(NamedTuple):
    """Dense rebuild products on a patch-aligned global grid."""

    org_cell: jax.Array    # int32[2] (x, y) cell coords of grid origin
    occ: jax.Array         # int32[H, W] hit counts
    vis: jax.Array         # int32[H, W] visit counts
    dist: jax.Array        # f32[H, W] meters


def grid_bounds(cfg, geo: MapGeometry, poses_np: np.ndarray):
    """Patch-aligned (org_cell, H, W) covering every scan's reach.

    H is rounded to a multiple of 8 * mesh-size-friendly strip count and W
    to the patch length; both stay multiples of the patch length so the
    dense grid packs directly into pool patches.
    """
    reach = int(np.ceil(cfg.max_range * geo.scale)) + cfg.distance.radius_cells + 2
    cells = geo.np_w2m(poses_np[:, :2].astype(np.float64))
    lo = cells.min(0) - reach
    hi = cells.max(0) + reach
    length = geo.patch_length
    lo = (lo // length) * length
    nx = int(np.ceil((hi[0] - lo[0] + 1) / length))
    ny = int(np.ceil((hi[1] - lo[1] + 1) / length))
    return lo.astype(np.int64), ny * length, nx * length


def _scan_cells(cfg, pose, points, mask, origin, org_cell, h: int, w: int):
    """Window-free beam rasterization: global-grid cell streams for one
    scan (same geometry path as sdm/mapping.update_maps)."""
    geo = cfg.geometry
    g = mapping_mod.beam_geometry(cfg, pose, points, mask, origin)
    mhit = geo.w2m(g.hit_xy)
    mstart = geo.w2m(g.start_xy)
    free_cells, free_mask = mapping_mod.ray_cells(mstart, mhit, cfg.ray_steps)
    free_mask = jnp.logical_and(free_mask, g.valid[:, None])

    hit_loc = mhit - org_cell
    free_loc = free_cells - org_cell

    def in_grid(loc):
        return ((loc[..., 0] >= 0) & (loc[..., 0] < w) &
                (loc[..., 1] >= 0) & (loc[..., 1] < h))

    hit_ok = jnp.logical_and(jnp.logical_and(g.valid, g.mark_hit),
                             in_grid(hit_loc))
    free_ok = jnp.logical_and(free_mask, in_grid(free_loc))

    def stream(loc, ok):
        ly = jnp.where(ok, loc[..., 1], h).reshape(-1)
        lx = jnp.where(ok, loc[..., 0], h).reshape(-1)
        return ly, lx

    return stream(hit_loc, hit_ok), stream(free_loc, free_ok)


def rasterize_scans(cfg, poses, points, masks, origins, org_cell,
                    h: int, w: int):
    """Deposit ALL scans into one dense [h, w] count-grid pair.

    poses f32[S, 4]; points f32[S, B, 3]; masks bool[S, B];
    origins f32[S, 3]. Returns (occ int32[h, w], vis int32[h, w]).
    """
    (hy, hx), (fy, fx) = jax.vmap(
        lambda p, pts, m, o: _scan_cells(cfg, p, pts, m, o, org_cell, h, w)
    )(poses, points, masks, origins)
    occ = scatter_matmul.scatter_counts_2d(hy.reshape(-1), hx.reshape(-1),
                                           h, w, impl="xla")
    free = scatter_matmul.scatter_counts_2d(fy.reshape(-1), fx.reshape(-1),
                                            h, w)
    return occ, occ + free


def edt_strips(obst, max_sqdist: int, radius: int, axis_name: str):
    """Exact capped EDT of a row-strip-sharded bool grid.

    ``obst`` is this device's [h_local, W] strip (inside shard_map). The
    vertical pass needs ``radius`` rows from each neighbor — fetched with
    two ppermutes — after which everything is strip-local. Equals the
    unsharded edt2d exactly.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = obst[:radius]
    bot = obst[-radius:]
    # strip i+1's upper halo is strip i's bottom rows; strip i-1's lower
    # halo is strip i's top rows
    from_above = jax.lax.ppermute(bot, axis_name,
                                  [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(top, axis_name,
                                  [(i, i - 1) for i in range(1, n)])
    # edge strips get all-False halos (outside the grid there is nothing)
    from_above = jnp.where(idx > 0, from_above, False)
    from_below = jnp.where(idx < n - 1, from_below, False)
    padded = jnp.concatenate([from_above, obst, from_below], axis=0)
    d2 = edt2d(padded, max_sqdist, radius)
    return d2[radius:-radius]


def rebuild_dense(cfg, poses, points, masks, origins, org_cell,
                  h: int, w: int, mesh: Mesh | None = None,
                  axis: str = "s") -> DenseRebuild:
    """Full rebuild: counts + obstacle mask + exact distance field.

    With ``mesh``, scans shard over ``axis`` for the rasterize (psum-merged
    counts) and the grid's rows shard for the EDT. Without, everything runs
    on one device. Results are identical.
    """
    geo = cfg.geometry
    dcfg = cfg.distance
    org = jnp.asarray(org_cell, jnp.int32)

    if mesh is None:
        occ, vis = rasterize_scans(cfg, poses, points, masks, origins,
                                   org, h, w)
        obst = (4 * occ) > vis
        d2 = edt2d(obst, dcfg.max_sqdist, dcfg.radius_cells)
    else:
        from jax.experimental.shard_map import shard_map

        ndev = mesh.devices.size

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P()),
        )
        def raster_sharded(p, pts, m, o, org_):
            occ_l, vis_l = rasterize_scans(cfg, p, pts, m, o, org_, h, w)
            return (jax.lax.psum(occ_l, axis),
                    jax.lax.psum(vis_l, axis))

        pad = (-poses.shape[0]) % ndev
        if pad:
            # padded scans: masks all False -> sentinel-only streams
            poses = jnp.concatenate([poses, jnp.tile(poses[-1:], (pad, 1))])
            points = jnp.concatenate([points,
                                      jnp.tile(points[-1:], (pad, 1, 1))])
            masks = jnp.concatenate(
                [masks, jnp.zeros((pad,) + masks.shape[1:], bool)])
            origins = jnp.concatenate([origins,
                                       jnp.tile(origins[-1:], (pad, 1))])
        occ, vis = jax.jit(raster_sharded)(poses, points, masks, origins,
                                           org)
        obst = (4 * occ) > vis

        @functools.partial(shard_map, mesh=mesh, in_specs=(P(axis),),
                           out_specs=P(axis))
        def edt_sharded(o):
            return edt_strips(o, dcfg.max_sqdist, dcfg.radius_cells, axis)

        # pad rows to a mesh multiple (all-False rows are exact no-ops for
        # the capped EDT) and require strips taller than the halo
        hpad = (-h) % ndev
        obst_p = jnp.concatenate(
            [obst, jnp.zeros((hpad, w), bool)]) if hpad else obst
        assert (h + hpad) // ndev >= dcfg.radius_cells, \
            "strips shorter than the EDT radius"
        d2 = jax.jit(edt_sharded)(obst_p)[:h]

    dist = jnp.sqrt(d2.astype(jnp.float32)) * jnp.float32(geo.resolution)
    return DenseRebuild(org, occ.astype(jnp.int32), vis.astype(jnp.int32),
                        dist)


def dense_to_state(cfg, dense: DenseRebuild) -> mapping_mod.SlamMapState:
    """Pack a dense rebuild into a pool-backed SlamMapState (host path;
    rebuilds are rare offline events)."""
    geo = cfg.geometry
    length = geo.patch_length
    occ = np.asarray(dense.occ)
    vis = np.asarray(dense.vis)
    dist = np.asarray(dense.dist)
    org = np.asarray(dense.org_cell)
    h, w = occ.shape
    ny, nx = h // length, w // length
    d2_max = cfg.distance.max_dist

    keys, blocks = [], []
    for py in range(ny):
        for px in range(nx):
            sl = np.s_[py * length:(py + 1) * length,
                       px * length:(px + 1) * length]
            if (vis[sl] > 0).any() or (dist[sl] < d2_max - 1e-9).any():
                anchor = org + np.array([px * length, py * length])
                key = (int(anchor[0]) >> geo.log2dim << 15) | \
                    (int(anchor[1]) >> geo.log2dim)
                keys.append(key)
                blocks.append((occ[sl], vis[sl], dist[sl]))

    cap = max(cfg.capacity, 1)
    while cap < len(keys) + 1:
        cap *= 2
    import dataclasses as _dc
    state = mapping_mod.slam_map_init(_dc.replace(cfg, capacity=cap))
    if not keys:
        return state
    table, slots = pool_mod.table_insert(
        state.table, jnp.asarray(np.asarray(keys, np.int32)))
    o_arr = np.asarray(state.occupied).copy()
    v_arr = np.asarray(state.visited).copy()
    d_arr = np.asarray(state.dist).copy()
    for s_, (bo, bv, bd) in zip(np.asarray(slots), blocks):
        o_arr[int(s_)] = np.minimum(bo, 65535).astype(o_arr.dtype)
        v_arr[int(s_)] = np.minimum(bv, 65535).astype(v_arr.dtype)
        d_arr[int(s_)] = bd
    return mapping_mod.SlamMapState(table, jnp.asarray(o_arr),
                                    jnp.asarray(v_arr), jnp.asarray(d_arr))

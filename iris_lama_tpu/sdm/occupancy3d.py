"""3D occupancy maps (is_3d parity) + exact 3D distance transform.

reference: every Map subclass accepts ``is3d`` (map.h:308, container 3D
volumes, 3D ray walk map.cpp:198-258, 3D DT neighborhood
dynamic_distance_map.cpp:41-46, trilinear interpolation :96-135). No
reference *algorithm* consumes 3D occupancy — it is library capability —
so this module provides the storage/query/update layer:

* a 3D patch pool ([P+1, L, L, L], 10-bit/axis packed keys — the same
  scheme as sdm/tsdf.py);
* Simple / Frequency / Probabilistic cell semantics in 3D;
* batched integration of point clouds with the closed-form 3D ray walk
  (sdm/raycast.py is dimension-generic);
* ``edt3d`` — exact capped 3D EDT via separable passes (1D erosion along z,
  then lower-envelope mins along y and x), the 3D analogue of
  sdm/distance.py:edt2d, for building 3D distance fields from obstacle
  masks.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import pool as pool_mod
from .raycast import ray_cells

PKEY3_BITS = 10
CENTER_PATCH3 = 1 << (PKEY3_BITS - 1)
_BIG = 1 << 20

OCC_THRESH = 0.25


@dataclasses.dataclass(frozen=True)
class MapGeometry3:
    """3D analogue of MapGeometry (same integer-offset trick)."""

    resolution: float = 0.05
    log2dim: int = 4

    @property
    def patch_length(self) -> int:
        return 1 << self.log2dim

    @property
    def scale(self) -> float:
        return 1.0 / self.resolution

    @property
    def cell_offset(self) -> int:
        return CENTER_PATCH3 * self.patch_length

    def w2m(self, world):
        mf = jnp.asarray(world, jnp.float32) * jnp.float32(self.scale)
        return (jnp.floor(mf + 0.5).astype(jnp.int32)
                + jnp.int32(self.cell_offset))

    def m2w(self, cells):
        rel = jnp.asarray(cells, jnp.int32) - jnp.int32(self.cell_offset)
        return rel.astype(jnp.float32) * jnp.float32(self.resolution)

    def m2p(self, cells):
        p = jnp.asarray(cells, jnp.int32) >> self.log2dim
        return ((p[..., 0] << (2 * PKEY3_BITS)) | (p[..., 1] << PKEY3_BITS)
                | p[..., 2])

    def m2local(self, cells):
        return jnp.asarray(cells, jnp.int32) & (self.patch_length - 1)


class Frequency3State(NamedTuple):
    table: pool_mod.PatchTable
    occupied: jax.Array    # u16[P+1, L, L, L]
    visited: jax.Array


class Simple3State(NamedTuple):
    table: pool_mod.PatchTable
    cells: jax.Array       # int8


class Probabilistic3State(NamedTuple):
    table: pool_mod.PatchTable
    logodds: jax.Array
    touched: jax.Array


def _zeros(geo, dtype, capacity):
    length = geo.patch_length
    return jnp.zeros((capacity + 1, length, length, length), dtype)


def frequency3_init(geo: MapGeometry3, capacity: int = 4096):
    return Frequency3State(pool_mod.table_init(capacity),
                           _zeros(geo, jnp.uint16, capacity),
                           _zeros(geo, jnp.uint16, capacity))


def simple3_init(geo: MapGeometry3, capacity: int = 4096):
    return Simple3State(pool_mod.table_init(capacity),
                        _zeros(geo, jnp.int8, capacity))


def probabilistic3_init(geo: MapGeometry3, capacity: int = 4096):
    return Probabilistic3State(pool_mod.table_init(capacity),
                               _zeros(geo, jnp.float32, capacity),
                               _zeros(geo, jnp.bool_, capacity))


def _locate(table, geo, cells, trash):
    keys = geo.m2p(cells)
    slots = pool_mod.table_lookup(table, keys)
    loc = geo.m2local(cells)
    safe = jnp.where(slots >= 0, slots, trash)
    return slots, (safe, loc[..., 2], loc[..., 1], loc[..., 0])


def _locate_alloc(table, geo, cells, trash):
    keys = geo.m2p(cells).reshape(-1)
    uniq = jnp.unique(keys, size=min(keys.shape[0], 4096),
                      fill_value=jnp.int32(-1))
    table, _ = pool_mod.table_insert(table, uniq)
    keys2 = geo.m2p(cells)
    slots = pool_mod.table_lookup(table, keys2)
    loc = geo.m2local(cells)
    safe = jnp.where(slots >= 0, slots, trash)
    return table, slots, (safe, loc[..., 2], loc[..., 1], loc[..., 0])


# ---------------------------------------------------------------------------
# Frequency 3D: batched scan integration with the 3D ray walk
# ---------------------------------------------------------------------------

def frequency3_insert_scan(state: Frequency3State, geo: MapGeometry3,
                           points, mask, origin, max_steps: int):
    """Rasterize a 3D cloud: hits mark occupied, 3D rays mark free
    (the Slam2D updateMaps pattern lifted to 3D; end-state equivalent)."""
    trash = state.occupied.shape[0] - 1
    hits = geo.w2m(points)                                  # [B, 3]
    start = jnp.broadcast_to(geo.w2m(origin), hits.shape)
    frees, fmask = ray_cells(start, hits, max_steps)        # [B, T, 3]
    fmask = jnp.logical_and(fmask, mask[:, None])

    all_cells = jnp.concatenate([hits[:, None, :], frees], axis=1)
    all_occ = jnp.concatenate(
        [mask[:, None].astype(jnp.uint16),
         jnp.zeros(fmask.shape, jnp.uint16)], axis=1)
    all_vis = jnp.concatenate(
        [mask[:, None].astype(jnp.uint16), fmask.astype(jnp.uint16)], axis=1)

    table, slots, idx = _locate_alloc(state.table, geo, all_cells, trash)
    occ = state.occupied.at[idx].add(all_occ)
    vis = state.visited.at[idx].add(all_vis)
    occ = occ.at[trash].set(0)
    vis = vis.at[trash].set(0)
    return Frequency3State(table, occ, vis)


def frequency3_is_occupied(state, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.occupied.shape[0] - 1)
    occ = state.occupied[idx].astype(jnp.int32)
    vis = state.visited[idx].astype(jnp.int32)
    return jnp.where(slots >= 0, 4 * occ > vis, False)


def frequency3_is_free(state, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.occupied.shape[0] - 1)
    occ = state.occupied[idx].astype(jnp.int32)
    vis = state.visited[idx].astype(jnp.int32)
    return jnp.where(slots >= 0, (vis > 0) & (4 * occ < vis), False)


# ---------------------------------------------------------------------------
# Simple / probabilistic 3D setters (same per-cell semantics as 2D)
# ---------------------------------------------------------------------------

def simple3_set(state: Simple3State, geo, cells, value):
    trash = state.cells.shape[0] - 1
    table, slots, idx = _locate_alloc(state.table, geo, cells, trash)
    val = jnp.broadcast_to(jnp.asarray(value, jnp.int8), idx[0].shape)
    return Simple3State(table, state.cells.at[idx].set(val))


def simple3_query(state: Simple3State, geo, cells):
    """-> int8 values (0 for unallocated)."""
    slots, idx = _locate(state.table, geo, cells, state.cells.shape[0] - 1)
    return jnp.where(slots >= 0, state.cells[idx], jnp.int8(0))


def probabilistic3_apply(state: Probabilistic3State, geo, cells, hits,
                         misses):
    from .occupancy import probabilistic_saturate
    trash = state.logodds.shape[0] - 1
    table, slots, idx = _locate_alloc(state.table, geo, cells, trash)
    zeros = jnp.zeros_like(state.logodds)
    hcount = zeros.at[idx].add(hits.astype(jnp.float32))
    mcount = zeros.at[idx].add(misses.astype(jnp.float32))
    lo = probabilistic_saturate(state.logodds, hcount, mcount)
    touched = state.touched.at[idx].max(jnp.logical_or(hits > 0, misses > 0))
    lo = lo.at[trash].set(0.0)
    return Probabilistic3State(table, lo, touched.at[trash].set(False))


# ---------------------------------------------------------------------------
# Exact capped 3D EDT (separable passes)
# ---------------------------------------------------------------------------

def edt3d(obstacle, max_sqdist: int, radius: int):
    """Exact capped squared EDT of a bool grid [Z, Y, X] -> int32.

    Separable: g = 1D distance along z (log-doubling erosion), then
    h = min_dy dy^2 + g^2, then d2 = min_dx dx^2 + h. Exactness follows
    from the separability of squared Euclidean distance.
    """
    g = jnp.where(obstacle, jnp.int32(0), _BIG)
    shift = 1
    while shift <= radius:
        pad = jnp.full((shift,) + g.shape[1:], _BIG, jnp.int32)
        up = jnp.concatenate([g[shift:], pad], axis=0)
        down = jnp.concatenate([pad, g[:-shift]], axis=0)
        g = jnp.minimum(g, jnp.minimum(up + shift, down + shift))
        shift <<= 1
    g = jnp.minimum(g, radius + 1)
    cap = jnp.int32(max_sqdist)

    def envelope(sq, axis):
        out = sq
        for d in range(1, radius + 1):
            padshape = list(sq.shape)
            padshape[axis] = d
            padc = jnp.full(padshape, cap, jnp.int32)
            sl_lo = [slice(None)] * sq.ndim
            sl_lo[axis] = slice(d, None)
            sl_hi = [slice(None)] * sq.ndim
            sl_hi[axis] = slice(None, -d)
            left = jnp.concatenate([sq[tuple(sl_lo)], padc], axis=axis)
            right = jnp.concatenate([padc, sq[tuple(sl_hi)]], axis=axis)
            out = jnp.minimum(out, jnp.minimum(left, right) + d * d)
        return out

    h = envelope(g * g, axis=1)          # along y
    d2 = envelope(h, axis=2)             # along x
    return jnp.minimum(d2, cap)

"""Dynamic Euclidean distance field, TPU-style.

reference: include/lama/sdm/dynamic_distance_map.h:47-52 and
src/sdm/dynamic_distance_map.cpp — the Lau/Sprunk/Burgard incremental
distance transform driven by raise/lower priority queues, plus bilinear
interpolation with analytic gradient (dynamic_distance_map.cpp:66-138).

The sequential two-queue wavefront is hostile to SIMD, so the TPU build
replaces it with an *exact dense recompute over the active window*:

* ``edt2d`` — exact squared Euclidean distance transform of an obstacle mask,
  computed as (1) a 1D vertical distance via log-doubling min-plus erosion and
  (2) the exact row lower-envelope min over dx in [-R, R]. Both passes are
  pure elementwise/shift ops on a dense grid — ideal VPU work. Capped at
  ``max_sqdist`` exactly like the reference (cells with no obstacle within
  range keep distance sqrt(max_sqdist)*resolution,
  dynamic_distance_map.cpp:140-147).
* obstacle add/remove becomes "rebuild the mask, recompute the window":
  removal needs no raise wavefront because nothing is incremental.

The persistent store keeps only ``dist`` (f32 meters) and ``obstacle``
per cell; sqdist/offset/valid are transient inside the window recompute.

Interpolation (`interp_*`) reproduces the reference formulas bit-for-bit in
structure: floor-discretized coords, 4-cell bilinear value and gradient
scaled by -scale (dynamic_distance_map.cpp:66-93).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import MapGeometry
from . import pool as pool_mod

_BIG = jnp.int32(1 << 20)

# IRIS_EDT_T=1: run edt2d's horizontal pass on the transposed grid (shift
# rounds ride the sublane axis instead of lane-crossing concats). Bit-exact;
# default off until the TPU A/B says otherwise.
_EDT_T = os.environ.get("IRIS_EDT_T") == "1"


@dataclasses.dataclass(frozen=True)
class DistanceConfig:
    """Static parameters of a distance map (hashable jit static)."""

    geometry: MapGeometry = MapGeometry()
    l2_max: float = 0.5   # meters (setMaxDistance, dynamic_distance_map.cpp:149)

    @property
    def max_sqdist(self) -> int:
        # reference: max_sqdist = ceil(distance * scale)^2 (.cpp:151-153)
        r = math.ceil(self.l2_max * self.geometry.scale)
        return r * r

    @property
    def radius_cells(self) -> int:
        return math.ceil(self.l2_max * self.geometry.scale)

    @property
    def max_dist(self) -> float:
        # distance() for invalid cells: sqrt(max_sqdist) * resolution (.cpp:143)
        return math.sqrt(self.max_sqdist) * self.geometry.resolution

    @property
    def sq_dtype(self):
        """Narrowest dtype for squared-distance grids. int8 unlocks the s8
        MXU row-selection path in ``_interp_window_sq``; u8/i16 still cut
        HBM traffic 4x/2x vs f32 meters."""
        if self.max_sqdist <= 127:
            return jnp.int8
        if self.max_sqdist <= 255:
            return jnp.uint8
        return jnp.int16 if self.max_sqdist <= 32767 else jnp.int32

    def dist_to_sq(self, dist):
        """f32 meters -> capped squared cell distance (exact: stored meters
        are always sqrt(k)*res for integer k <= max_sqdist, and the f32
        round trip k -> sqrt -> square -> rint recovers k exactly)."""
        d2 = jnp.rint((dist * jnp.float32(self.geometry.scale)) ** 2)
        return jnp.clip(d2, 0, self.max_sqdist).astype(self.sq_dtype)

    def sq_to_dist(self, d2):
        """Squared cell distance -> f32 meters (the canonical arithmetic —
        identical to scan_window_compute's, so values are bit-stable)."""
        return (jnp.sqrt(d2.astype(jnp.float32))
                * jnp.float32(self.geometry.resolution))


def _edt_dtype(radius: int, max_sqdist: int):
    """Narrowest integer type the capped transform fits in.

    Bounds: vertical values stay <= radius+1 (capped from the start — a
    min-plus erosion with saturated inputs yields the same capped result),
    squared values <= (radius+1)^2 + radius^2 and max_sqdist. Narrow types
    cut pass traffic 4x (u8) / 2x (i16) and multiply VPU lanes — the
    transform is bandwidth/VPU bound, not FLOP bound.
    """
    hi = max((radius + 1) ** 2 + radius * radius, max_sqdist + 1,
             radius + 1 + radius)
    if hi <= 255:
        return jnp.uint8
    if hi <= 32767:
        return jnp.int16
    return jnp.int32


def edt2d(obstacle, max_sqdist: int, radius: int):
    """Exact capped squared EDT of a bool grid [H, W] (indexed [y, x]).

    Returns int32[H, W] sqdist, clipped to ``max_sqdist``.
    """
    dt = _edt_dtype(radius, max_sqdist)
    big_g = jnp.asarray(radius + 1, dt)   # vertical cap doubles as BIG

    # --- vertical pass: g[y, x] = min |dy| with obstacle[(y+dy), x] ---------
    # g stays <= radius+1 throughout (g_new = min(g_old, ...) and the
    # initial values are 0 / radius+1), so shifts can never overflow dt.
    g = jnp.where(obstacle, jnp.asarray(0, dt), big_g)
    shift = 1
    while shift <= radius:
        sh = jnp.asarray(shift, dt)
        up = jnp.concatenate([g[shift:], jnp.full((shift, g.shape[1]),
                                                  big_g, dt)], axis=0)
        down = jnp.concatenate([jnp.full((shift, g.shape[1]), big_g, dt),
                                g[:-shift]], axis=0)
        g = jnp.minimum(g, jnp.minimum(up + sh, down + sh))
        g = jnp.minimum(g, big_g)
        shift <<= 1

    # --- horizontal pass: d2 = min_dx dx^2 + g[y, x+dx]^2 -------------------
    cap = jnp.asarray(max_sqdist, dt)
    if _EDT_T:
        # transposed variant (IRIS_EDT_T=1): the horizontal shifts walk the
        # minor (lane) dimension, which XLA lowers as lane-crossing
        # concatenates; transposing once moves all `radius` shift+min
        # rounds onto the sublane axis (same integer min/add per element —
        # bit-exact), at the cost of two transposes.
        g2 = (g * g).T
        d2 = g2
        for dx in range(1, radius + 1):
            dx2 = jnp.asarray(dx * dx, dt)
            left = jnp.concatenate([g2[dx:], jnp.full((dx, g2.shape[1]),
                                                      cap, dt)], axis=0)
            right = jnp.concatenate([jnp.full((dx, g2.shape[1]), cap, dt),
                                     g2[:-dx]], axis=0)
            d2 = jnp.minimum(d2, jnp.minimum(left, right) + dx2)
        return jnp.minimum(d2.T, cap).astype(jnp.int32)
    g2 = g * g
    d2 = g2
    for dx in range(1, radius + 1):
        dx2 = jnp.asarray(dx * dx, dt)
        left = jnp.concatenate([g2[:, dx:], jnp.full((g.shape[0], dx), cap,
                                                     dt)], axis=1)
        right = jnp.concatenate([jnp.full((g.shape[0], dx), cap, dt),
                                 g2[:, :-dx]], axis=1)
        d2 = jnp.minimum(d2, jnp.minimum(left, right) + dx2)
    return jnp.minimum(d2, cap).astype(jnp.int32)


def sqdist_to_meters(d2, cfg: DistanceConfig):
    return jnp.sqrt(d2.astype(jnp.float32)) * jnp.float32(cfg.geometry.resolution)


# ---------------------------------------------------------------------------
# Interpolated distance + gradient (dynamic_distance_map.cpp:66-93)
# ---------------------------------------------------------------------------

def _bilinear(v00, v10, v01, v11, mu, scale):
    """The reference's 2D interpolation + analytic gradient.

    v10 is the (+1, 0) neighbor, v01 the (0, +1) neighbor.
    """
    mux, muy = mu[..., 0], mu[..., 1]
    mix, miy = 1.0 - mux, 1.0 - muy
    dist = (v00 * mix * miy + v10 * miy * mux +
            v01 * mix * muy + v11 * mux * muy)
    gx = -((v00 - v10) * miy + (v01 - v11) * muy) * scale
    gy = -((v00 - v01) * mix + (v10 - v11) * mux) * scale
    return dist, jnp.stack([gx, gy], axis=-1)


def interp_window(grid, org_cell, geo: MapGeometry, world_xy, max_dist):
    """Interpolated distance+gradient from a dense window grid [H, W] ([y,x]).

    Cells outside the window read ``max_dist`` (same as unallocated patches
    in the reference, dynamic_distance_map.cpp:140-143).

    TPU note: there is no hardware gather — XLA serializes `grid[ly, lx]`.
    The 4-neighbor reads are instead *matmulized*: two one-hot row-selection
    matmuls pull rows ly and ly+1 onto the MXU, then one-hot column masks
    reduce out the 4 cell values. ~100x faster than scalar gathers at
    scan-matching sizes.

    Integer grids hold capped *squared cell distances* (the d2 the EDT
    produces); the selection then rides the s8 (or bf16) MXU path — far
    cheaper than f32 — and each selected corner converts to meters with the
    exact same ``sqrt(d2)*resolution`` arithmetic the f32 grid was built
    with, so results are bit-identical.
    """
    if jnp.issubdtype(grid.dtype, jnp.integer):
        return _interp_window_sq(grid, org_cell, geo, world_xy, max_dist)
    mi, mu = geo.w2m_frac(world_xy)                  # int cell (x, y), frac
    loc = mi - jnp.asarray(org_cell, jnp.int32)      # [..., 2] (lx, ly)
    h, w = grid.shape
    lx = loc[..., 0]
    ly = loc[..., 1]

    def inx(v):
        return (v >= 0) & (v < w)

    def iny(v):
        return (v >= 0) & (v < h)

    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    oh0 = (jnp.clip(ly, 0, h - 1)[..., None] == rows).astype(grid.dtype)
    oh1 = (jnp.clip(ly + 1, 0, h - 1)[..., None] == rows).astype(grid.dtype)
    # rows via MXU. Precision MUST be pinned: TPU's default f32 matmul
    # truncates the INPUTS to bf16, so selected distances lose mantissa
    # and the matcher's gradients (differences of adjacent corners) get
    # percent-level noise — measured as LidarOdometry2D losing lock at the
    # first corner of the office world (13-19 m/100m drift vs 0.8 on CPU,
    # r4). HIGHEST keeps the one-hot selection bit-exact.
    hp = jax.lax.Precision.HIGHEST
    r0 = jax.lax.dot_general(oh0, grid, (((oh0.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=hp)
    r1 = jax.lax.dot_general(oh1, grid, (((oh1.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=hp)
    c0 = (jnp.clip(lx, 0, w - 1)[..., None] == cols).astype(jnp.float32)
    c1 = (jnp.clip(lx + 1, 0, w - 1)[..., None] == cols).astype(jnp.float32)
    md = jnp.float32(max_dist)
    v00 = jnp.where(inx(lx) & iny(ly), jnp.sum(r0 * c0, axis=-1), md)
    v10 = jnp.where(inx(lx + 1) & iny(ly), jnp.sum(r0 * c1, axis=-1), md)
    v01 = jnp.where(inx(lx) & iny(ly + 1), jnp.sum(r1 * c0, axis=-1), md)
    v11 = jnp.where(inx(lx + 1) & iny(ly + 1), jnp.sum(r1 * c1, axis=-1), md)
    return _bilinear(v00, v10, v01, v11, mu, jnp.float32(geo.scale))


def _interp_window_sq(grid, org_cell, geo: MapGeometry, world_xy, max_dist):
    """interp_window for an integer squared-distance grid (see dispatch).

    s8 grids (max_sqdist <= 127) contract s8 x s8 -> s32 on the MXU (2x the
    bf16 rate, 8x f32); u8 grids use bf16 one-hots (ints <= 255 are exact in
    bf16, single-term selection sums are exact in f32); wider grids fall
    back to f32 operands. Corner values convert to meters via
    ``sqrt(d2) * resolution`` — the identical f32 arithmetic used to build
    f32 distance grids (mapping.scan_window_compute), so the bilinear
    result is bit-equal to the f32-grid path.
    """
    mi, mu = geo.w2m_frac(world_xy)                  # int cell (x, y), frac
    loc = mi - jnp.asarray(org_cell, jnp.int32)      # [..., 2] (lx, ly)
    h, w = grid.shape
    lx = loc[..., 0]
    ly = loc[..., 1]

    def inx(v):
        return (v >= 0) & (v < w)

    def iny(v):
        return (v >= 0) & (v < h)

    # the 4-corner integer selection is one fused op (ops/select4.py): a
    # VMEM-resident s8 one-hot contraction on TPU, the equivalent jnp
    # one-hot math elsewhere — exact either way
    from ..ops import select4
    v = select4.select4_sq(grid, ly, lx)             # i32[4, B]
    md = jnp.float32(max_dist)
    res = jnp.float32(geo.resolution)

    def corner(s, ok):
        # identical arithmetic to the f32 grids' sqrt(d2)*res construction
        return jnp.where(ok, jnp.sqrt(s.astype(jnp.float32)) * res, md)

    v00 = corner(v[0], inx(lx) & iny(ly))
    v10 = corner(v[1], inx(lx + 1) & iny(ly))
    v01 = corner(v[2], inx(lx) & iny(ly + 1))
    v11 = corner(v[3], inx(lx + 1) & iny(ly + 1))
    return _bilinear(v00, v10, v01, v11, mu, jnp.float32(geo.scale))


def interp_pool(table, dist, geo: MapGeometry, world_xy, max_dist):
    """Interpolated distance+gradient straight from the patch pool.

    Used where no dense window exists (global localization hypotheses spread
    over the whole map, reference src/loc2d.cpp:249-286).
    """
    mi, mu = geo.w2m_frac(world_xy)

    def read(dx, dy):
        cells = mi + jnp.array([dx, dy], jnp.int32)
        return cell_distance(table, dist, geo, cells, max_dist)

    v00, v10, v01, v11 = read(0, 0), read(1, 0), read(0, 1), read(1, 1)
    return _bilinear(v00, v10, v01, v11, mu, jnp.float32(geo.scale))


def cell_distance(table, dist, geo: MapGeometry, cells, max_dist):
    """Nearest-cell distance lookup (reference dynamic_distance_map.cpp:140).

    cells int32[..., 2] -> f32[...]. Missing patches read ``max_dist``.
    """
    keys = geo.m2p(cells)
    slots = pool_mod.table_lookup(table, keys)
    local = geo.m2local(cells)
    safe = jnp.where(slots >= 0, slots, dist.shape[0] - 1)
    val = dist[safe, local[..., 1], local[..., 0]]
    return jnp.where(slots >= 0, val, jnp.float32(max_dist))


class DistanceMapState(NamedTuple):
    """Standalone dynamic distance map (pool-backed).

    Used by Loc2D where maps are loaded rather than built (loc2d.h:103-104);
    Slam2D/PFSlam2D use the fused mapping state instead (sdm/mapping.py).
    """

    table: pool_mod.PatchTable
    obstacle: jnp.ndarray   # bool[P+1, L, L]
    dist: jnp.ndarray       # f32[P+1, L, L] (meters)


def distance_map_init(cfg: DistanceConfig, capacity: int) -> DistanceMapState:
    length = cfg.geometry.patch_length
    return DistanceMapState(
        table=pool_mod.table_init(capacity),
        obstacle=jnp.zeros((capacity + 1, length, length), jnp.bool_),
        dist=jnp.full((capacity + 1, length, length), cfg.max_dist,
                      jnp.float32),
    )

"""Standalone occupancy maps (pool-backed): simple / probabilistic / frequency.

reference: include/lama/sdm/occupancy_map.h:43-77 (abstract interface) and the
three concrete maps:
* SimpleOccupancyMap   — tri-state int8 cell (src/sdm/simple_occupancy_map.cpp)
* ProbabilisticOccupancyMap — log-odds float cell with clamping
  (src/sdm/probabilistic_occupancy_map.cpp:38-59)
* FrequencyOccupancyMap — {occupied, visited} uint16 counts with
  occ_thresh = 0.25 (src/sdm/frequency_occupancy_map.cpp:38-45)

These standalone states are used where maps are *inputs* (Loc2D consumes
prebuilt maps, loc2d.h:103-104) and for IO/export parity. The SLAM hot path
uses the fused ``sdm/mapping.py`` state instead.

Batch-update semantics: updates are applied as per-scan aggregates
(scatter-add of counts / log-odds deltas with end-of-scan clamping) rather
than per-call sequential transitions; end states match the reference for the
frequency map exactly and for the probabilistic map up to intra-scan clamp
ordering.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import pool as pool_mod
from .geometry import MapGeometry

OCC_THRESH = 0.25  # frequency_occupancy_map.cpp:38


def _logodds(p: float) -> float:
    return math.log(p / (1.0 - p))


# Probabilistic constants (probabilistic_occupancy_map.cpp:51-59)
PROB_MISS = _logodds(0.4)
PROB_HIT = _logodds(0.7)
PROB_CLAMP_MIN = _logodds(0.12)
PROB_CLAMP_MAX = _logodds(0.97)


def probabilistic_saturate(lo, hit_counts, miss_counts):
    """Per-visit-clamped log-odds update, order-independent given counts.

    The reference clamps after EVERY visit (one-sided: setOccupied clamps at
    clamp_max, setFree at clamp_min — probabilistic_occupancy_map.cpp:82-107),
    not once per scan. For a pure hit (or pure miss) run the per-visit clamp
    has an exact closed form: iterating ``x <- min(x + hit, cmax)`` h times
    equals ``min(x + h*hit, cmax)`` (monotone), likewise for misses at cmin.
    Mixed cells are resolved in a canonical per-cell order — all hits, then
    all misses — matching the reference's per-beam order (endpoint setOccupied
    precedes that beam's ray setFree calls, src/slam2d.cpp:308-316); the
    cross-beam interleaving is scan-order-arbitrary in the reference, so any
    canonical order lies inside its own nondeterminism envelope. Unlike
    end-of-sum clamping, a saturated cell receiving mixed evidence
    de-saturates exactly as the sequential reference does.

    State invariant: ``lo`` stays within [cmin, cmax] (init 0 is interior),
    so the unconditional min/max below are no-ops for untouched cells.
    """
    h = hit_counts.astype(jnp.float32)
    m = miss_counts.astype(jnp.float32)
    lo = jnp.minimum(lo + h * PROB_HIT, PROB_CLAMP_MAX)
    return jnp.maximum(lo + m * PROB_MISS, PROB_CLAMP_MIN)


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    geometry: MapGeometry = MapGeometry()
    capacity: int = 4096


class SimpleOccupancyState(NamedTuple):
    table: pool_mod.PatchTable
    cells: jax.Array       # int8[P+1, L, L]: -1 free / 0 unknown / +1 occupied


class ProbabilisticOccupancyState(NamedTuple):
    table: pool_mod.PatchTable
    logodds: jax.Array     # f32[P+1, L, L]
    touched: jax.Array     # bool[P+1, L, L] — cell ever written (for unknown)


class FrequencyOccupancyState(NamedTuple):
    table: pool_mod.PatchTable
    occupied: jax.Array    # u16[P+1, L, L]
    visited: jax.Array     # u16[P+1, L, L]


def simple_init(cfg: OccupancyConfig) -> SimpleOccupancyState:
    length = cfg.geometry.patch_length
    return SimpleOccupancyState(
        pool_mod.table_init(cfg.capacity),
        jnp.zeros((cfg.capacity + 1, length, length), jnp.int8))


def probabilistic_init(cfg: OccupancyConfig) -> ProbabilisticOccupancyState:
    length = cfg.geometry.patch_length
    p1 = cfg.capacity + 1
    return ProbabilisticOccupancyState(
        pool_mod.table_init(cfg.capacity),
        jnp.zeros((p1, length, length), jnp.float32),
        jnp.zeros((p1, length, length), jnp.bool_))


def frequency_init(cfg: OccupancyConfig) -> FrequencyOccupancyState:
    length = cfg.geometry.patch_length
    p1 = cfg.capacity + 1
    return FrequencyOccupancyState(
        pool_mod.table_init(cfg.capacity),
        jnp.zeros((p1, length, length), jnp.uint16),
        jnp.zeros((p1, length, length), jnp.uint16))


# ---------------------------------------------------------------------------
# Shared cell addressing
# ---------------------------------------------------------------------------

def _locate(table, geo: MapGeometry, cells, trash: int):
    keys = geo.m2p(cells)
    slots = pool_mod.table_lookup(table, keys)
    local = geo.m2local(cells)
    safe = jnp.where(slots >= 0, slots, trash)
    return slots, (safe, local[..., 1], local[..., 0])


def _locate_alloc(table, geo: MapGeometry, cells, trash: int):
    """Locate cells, allocating missing patches (mutable-get semantics,
    map.cpp:371-411)."""
    keys = geo.m2p(cells)
    flatk = keys.reshape(-1)
    uniq = jnp.unique(flatk, size=flatk.shape[0], fill_value=jnp.int32(-1))
    table, _ = pool_mod.table_insert(table, uniq)
    slots = pool_mod.table_lookup(table, keys)
    local = geo.m2local(cells)
    safe = jnp.where(slots >= 0, slots, trash)
    return table, slots, (safe, local[..., 1], local[..., 0])


# ---------------------------------------------------------------------------
# Simple occupancy (simple_occupancy_map.cpp:36-130)
# ---------------------------------------------------------------------------

def simple_set(state: SimpleOccupancyState, geo, cells, value,
               mask=None) -> SimpleOccupancyState:
    """Set cells to -1 (free), 0 (unknown) or +1 (occupied)."""
    trash = state.cells.shape[0] - 1
    table, slots, idx = _locate_alloc(state.table, geo, cells, trash)
    val = jnp.broadcast_to(jnp.asarray(value, jnp.int8), idx[0].shape)
    if mask is not None:
        safe0, ly, lx = idx
        safe0 = jnp.where(mask, safe0, trash)
        idx = (safe0, ly, lx)
    return SimpleOccupancyState(table, state.cells.at[idx].set(val))


def simple_is_free(state: SimpleOccupancyState, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.cells.shape[0] - 1)
    return jnp.where(slots >= 0, state.cells[idx] == -1, False)


def simple_is_occupied(state: SimpleOccupancyState, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.cells.shape[0] - 1)
    return jnp.where(slots >= 0, state.cells[idx] == 1, False)


def simple_is_unknown(state: SimpleOccupancyState, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.cells.shape[0] - 1)
    return jnp.where(slots >= 0, state.cells[idx] == 0, True)


# ---------------------------------------------------------------------------
# Frequency occupancy (frequency_occupancy_map.cpp)
# ---------------------------------------------------------------------------

def frequency_apply_counts(state: FrequencyOccupancyState, geo, cells,
                           occ_add, vis_add) -> FrequencyOccupancyState:
    """Scatter-add per-cell counts (ends equal to sequential set* calls)."""
    trash = state.occupied.shape[0] - 1
    table, slots, idx = _locate_alloc(state.table, geo, cells, trash)
    occ = state.occupied.at[idx].add(occ_add.astype(jnp.uint16))
    vis = state.visited.at[idx].add(vis_add.astype(jnp.uint16))
    # keep the trash slot clean so pool-wide derivations stay valid
    occ = occ.at[trash].set(0)
    vis = vis.at[trash].set(0)
    return FrequencyOccupancyState(table, occ, vis)


def frequency_prob(state: FrequencyOccupancyState, geo, cells):
    """getProbability (frequency_occupancy_map.cpp:157-170)."""
    slots, idx = _locate(state.table, geo, cells, state.occupied.shape[0] - 1)
    occ = state.occupied[idx].astype(jnp.float32)
    vis = state.visited[idx].astype(jnp.float32)
    prob = jnp.where(vis > 0, occ / jnp.maximum(vis, 1.0), OCC_THRESH)
    return jnp.where(slots >= 0, prob, OCC_THRESH)


def frequency_is_free(state, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.occupied.shape[0] - 1)
    occ = state.occupied[idx].astype(jnp.int32)
    vis = state.visited[idx].astype(jnp.int32)
    free = jnp.logical_and(vis > 0, 4 * occ < vis)
    return jnp.where(slots >= 0, free, False)


def frequency_is_occupied(state, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.occupied.shape[0] - 1)
    occ = state.occupied[idx].astype(jnp.int32)
    vis = state.visited[idx].astype(jnp.int32)
    return jnp.where(slots >= 0, 4 * occ > vis, False)


def frequency_is_unknown(state, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.occupied.shape[0] - 1)
    unknown = state.visited[idx] == 0
    return jnp.where(slots >= 0, unknown, True)


def frequency_prune(state: FrequencyOccupancyState) -> FrequencyOccupancyState:
    """Drop single-visit cells (frequency_occupancy_map.cpp:146-155)."""
    drop = jnp.logical_and(state.visited == 1, state.occupied <= 1)
    return state._replace(
        occupied=jnp.where(drop, jnp.uint16(0), state.occupied),
        visited=jnp.where(drop, jnp.uint16(0), state.visited))


# ---------------------------------------------------------------------------
# Probabilistic occupancy (probabilistic_occupancy_map.cpp)
# ---------------------------------------------------------------------------

def probabilistic_apply(state: ProbabilisticOccupancyState, geo, cells,
                        hits, misses) -> ProbabilisticOccupancyState:
    """Apply per-cell hit/miss counts with per-visit clamping.

    Duplicate cells in ``cells`` accumulate their counts first (scatter-add),
    then the per-visit saturating closed form applies pool-wide
    (probabilistic_saturate)."""
    trash = state.logodds.shape[0] - 1
    table, slots, idx = _locate_alloc(state.table, geo, cells, trash)
    zeros = jnp.zeros_like(state.logodds)
    hcount = zeros.at[idx].add(hits.astype(jnp.float32))
    mcount = zeros.at[idx].add(misses.astype(jnp.float32))
    lo = probabilistic_saturate(state.logodds, hcount, mcount)
    touched_add = jnp.logical_or(hits > 0, misses > 0)
    touched = state.touched.at[idx].max(touched_add)
    lo = lo.at[trash].set(0.0)
    touched = touched.at[trash].set(False)
    return ProbabilisticOccupancyState(table, lo, touched)


def probabilistic_prob(state: ProbabilisticOccupancyState, geo, cells):
    """getProbability = 1 - 1/(1+exp(l)) (probabilistic_occupancy_map.cpp:40)."""
    slots, idx = _locate(state.table, geo, cells, state.logodds.shape[0] - 1)
    lo = state.logodds[idx]
    prob = 1.0 - 1.0 / (1.0 + jnp.exp(lo))
    return jnp.where(slots >= 0, prob, 0.5)


def probabilistic_is_occupied(state, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.logodds.shape[0] - 1)
    return jnp.where(slots >= 0, state.logodds[idx] > 0.0, False)


def probabilistic_is_free(state, geo, cells):
    slots, idx = _locate(state.table, geo, cells, state.logodds.shape[0] - 1)
    occ = jnp.logical_and(state.logodds[idx] < 0.0, state.touched[idx])
    return jnp.where(slots >= 0, occ, False)

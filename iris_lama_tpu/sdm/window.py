"""Dense pose-centered windows over the patch pool.

The TPU-native trick that removes per-cell hash probing from every hot path:
each scan update / scan match works inside a dense [W, W] cell window centered
on the robot. The window is gathered from the pool with *patch-level*
indexing (one hash lookup per patch, not per cell), all inner-loop work
(raycast scatter, EDT, bilinear interpolation) is plain dense array math, and
results are scattered back patch-blocked.

This replaces the reference's per-cell ``Map::get`` pointer walk
(src/sdm/map.cpp:371-411) for the three hot loops identified in SURVEY §3.1.

Conventions: cell coords are (x, y); dense grids are indexed [y, x];
patch-block tensors are [py, px, ly, lx].
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .geometry import MapGeometry, PKEY_BITS
from . import pool as pool_mod

# Patch-block gathers ride the MXU on TPU (byte-plane one-hot matmuls,
# bit-exact for every dtype): XLA's row-gather lowering SERIALIZES at
# ~0.4-0.7 us per patch block — 52.6 ms on-device for a 30-particle
# resident-window gather vs 8.2 ms for the matmul (r4, prof_r4_gather3,
# jax.profiler device times). IRIS_WINDOW_GATHER_MXU=0 restores row
# gathers everywhere (the CPU/oracle path never changes).
_GATHER_MXU = os.environ.get("IRIS_WINDOW_GATHER_MXU", "1") != "0"


def _plane_split(raw):
    """Split an integer array into s8 byte planes (little-endian)."""
    if raw.dtype in (jnp.int8, jnp.uint8):
        return [raw.astype(jnp.int8)], raw.dtype
    if raw.dtype in (jnp.uint16, jnp.int16):
        u = raw.astype(jnp.uint16)
        return [(u & 0xFF).astype(jnp.int8),
                (u >> 8).astype(jnp.int8)], raw.dtype
    if raw.dtype == jnp.float32:
        u = jax.lax.bitcast_convert_type(raw, jnp.uint32)
        return [((u >> (8 * i)) & 0xFF).astype(jnp.int8)
                for i in range(4)], raw.dtype
    if raw.dtype in (jnp.int32, jnp.uint32):
        u = raw.astype(jnp.uint32)
        return [((u >> (8 * i)) & 0xFF).astype(jnp.int8)
                for i in range(4)], raw.dtype
    raise NotImplementedError(f"byte planes for {raw.dtype}")


def _plane_join(planes_i32, dtype):
    """Reassemble matmul plane outputs (i32, sign-extended bytes)."""
    if dtype == jnp.int8:
        return planes_i32[0].astype(jnp.int8)
    if dtype == jnp.uint8:
        return (planes_i32[0] & 0xFF).astype(jnp.uint8)
    acc = jnp.zeros(planes_i32[0].shape, jnp.uint32)
    for i, p in enumerate(planes_i32):
        acc = acc | ((p.astype(jnp.uint32) & 0xFF) << (8 * i))
    if dtype in (jnp.uint16, jnp.int16):
        return acc.astype(dtype)
    if dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(acc, jnp.float32)
    return acc.astype(dtype)


def _gather_rows_mxu(arr2, slots_flat, default):
    """arr2 [CAP, K] -> [N, K] rows via one-hot s8 matmuls, bit-exact.

    Missing slots (< 0) match no one-hot column (all-zero row) and are
    filled with ``default`` — the trash row is never touched.
    """
    cap = arr2.shape[0]
    oh = (slots_flat[:, None] ==
          jnp.arange(cap, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    planes, dtype = _plane_split(arr2)
    outs = [jax.lax.dot_general(oh, p, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            for p in planes]
    sel = _plane_join(outs, dtype)
    return jnp.where((slots_flat >= 0)[:, None], sel,
                     jnp.asarray(default, arr2.dtype))


def window_org(geo: MapGeometry, center_cell, wp: int):
    """Patch-aligned window origin (cell coords) for a [wp x wp]-patch window
    centered at ``center_cell`` (int32[2])."""
    l2 = geo.log2dim
    cp = jnp.asarray(center_cell, jnp.int32) >> l2        # center patch
    org_p = cp - (wp // 2)
    return org_p << l2                                     # cell coords [2]


def window_patch_keys(geo: MapGeometry, org_cell, wp: int):
    """Packed patch keys for the window, shape [wp, wp] indexed [py, px]."""
    org_p = jnp.asarray(org_cell, jnp.int32) >> geo.log2dim
    py = org_p[1] + jnp.arange(wp, dtype=jnp.int32)
    px = org_p[0] + jnp.arange(wp, dtype=jnp.int32)
    return (px[None, :] << PKEY_BITS) | py[:, None]


def gather_window(table, arr, keys, default, slots=None):
    """Gather a dense [wp*L, wp*L] grid from pool array ``arr`` [P+1, L, L].

    Missing patches are filled with ``default``. Returns (grid, slots) where
    slots is int32[wp, wp] (-1 for missing) for reuse by the writeback and
    by further gathers of sibling arrays (pass it back in to skip the table
    probe).

    Patch blocks are pulled with XLA's native row gather. (A one-hot matmul
    variant was the original choice; it loses badly once the map is vmapped
    over particles, because it casts the ENTIRE pool array to f32 per
    particle — measured 50.3 ms vs 0.59 ms for 3 gathers at 30 particles,
    prof12. Row gather also keeps the pool dtype end-to-end.)
    """
    ap, bp = keys.shape            # [patch rows, patch cols] (square or band)
    length = arr.shape[-1]
    if slots is None:
        slots = pool_mod.table_lookup(table, keys)         # [ap, bp]
    if _GATHER_MXU and jax.default_backend() == "tpu":
        rows = _gather_rows_mxu(arr.reshape(arr.shape[0], -1),
                                slots.reshape(-1), default)
        blocks = rows.reshape(ap, bp, length, length)
    else:
        safe = jnp.where(slots >= 0, slots, arr.shape[0] - 1).reshape(-1)
        blocks = arr[safe].reshape(ap, bp, length, length)
        blocks = jnp.where((slots >= 0)[:, :, None, None], blocks,
                           jnp.asarray(default, arr.dtype))
    return blocks.transpose(0, 2, 1, 3).reshape(ap * length, bp * length), \
        slots


def scatter_window(arr, slots, grid, write_mask=None):
    """Write a dense window grid back into pool array ``arr``.

    ``slots`` int32[wp, wp] from gather_window (missing -> dropped).
    ``write_mask`` optional bool[wp*L, wp*L]: cells not in the mask keep the
    grid value only if the caller already merged old values (callers pass a
    grid built as ``where(mask, new, old)``); when given, patches with no
    masked cell are skipped entirely.

    Skipped/missing blocks route to DISTINCT out-of-range rows (dropped by
    XLA) rather than a shared trash row: duplicate scatter indices force
    XLA's serialized scatter lowering, unique ones keep it parallel — and
    the trash slot stays clean as a bonus.
    """
    ap, bp = slots.shape
    length = arr.shape[-1]
    blocks = grid.reshape(ap, length, bp, length).transpose(0, 2, 1, 3)
    nb = ap * bp
    oob = arr.shape[0] + jnp.arange(nb, dtype=jnp.int32).reshape(ap, bp)
    target = jnp.where(slots >= 0, slots, oob)
    if write_mask is not None:
        mblocks = write_mask.reshape(ap, length, bp,
                                     length).transpose(0, 2, 1, 3)
        patch_has = jnp.any(mblocks, axis=(2, 3))
        target = jnp.where(patch_has, target, oob)
    flat_slots = target.reshape(-1)
    flat_blocks = blocks.reshape(nb, length, length).astype(arr.dtype)
    return arr.at[flat_slots].set(flat_blocks, mode="drop",
                                  unique_indices=True)


def cells_to_local(org_cell, cells):
    """Map cell coords [..., 2] -> window-local (lx, ly) int32 [..., 2]."""
    return jnp.asarray(cells, jnp.int32) - jnp.asarray(org_cell, jnp.int32)

"""Batched per-particle 2D sub-window extraction as s8 one-hot MXU
matmuls — the r4 byte-plane-gather trick applied to the PF match window
slice.

Why: ``vmap(dynamic_slice)`` with per-particle offsets lowers to XLA's
serialized row gather (~0.18 us/row on the v5e): slicing the [N, 432,
432] match sub-windows out of the [N, 1088, 1088] resident distance
grids measured 40 ms ON DEVICE at N=512 (prof_r5_gnb: 70.7 vs 31.0 ms
for the same solve with pre-sliced grids) and ~2.3 ms at N=30. Row/col
selection by one-hot s8 contractions runs on the MXU instead
(~3.6e11 MACs at 512 particles ~ 1-2 ms) and is EXACT for s8 payloads:
each output cell is a sum over exactly one matching product (integer
accumulation into i32 — no bf16 input truncation, which only affects
f32 matmuls).

Used by algos/pf_slam2d._pf_match_phase on TPU; CPU keeps the
dynamic_slice path as the oracle (tests/test_window_mxu.py::test_slice_mxu*).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# default ON; IRIS_SLICE_MXU=0 restores the vmapped dynamic_slice for A/B
ENABLED = bool(int(os.environ.get("IRIS_SLICE_MXU", "1")))

# particle chunk for the lax.map: bounds the [g, ws, W] i32 row-selection
# intermediate (64 x 432 x 1088 i32 = 120 MB)
_CHUNK = 64


def _slice_chunk(grids, starts, ws: int):
    """grids s8[g, H, W], starts i32[g, 2] (x, y) -> s8[g, ws, ws] equal to
    ``grids[p, sy:sy+ws, sx:sx+ws]`` per particle."""
    g, h, w = grids.shape
    i_ws = jnp.arange(ws, dtype=jnp.int32)
    # rows: R[p, i, y] = (y == sy[p] + i)
    iota_h = jnp.arange(h, dtype=jnp.int32)
    rows = (iota_h[None, None, :]
            == (starts[:, 1, None, None] + i_ws[None, :, None])
            ).astype(jnp.int8)                          # [g, ws, H]
    tmp = jax.lax.dot_general(
        rows, grids, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)               # [g, ws, W]
    iota_w = jnp.arange(w, dtype=jnp.int32)
    cols = (iota_w[None, None, :]
            == (starts[:, 0, None, None] + i_ws[None, :, None])
            ).astype(jnp.int8)                          # [g, ws, W]
    out = jax.lax.dot_general(
        tmp.astype(jnp.int8), cols, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)               # [g, ws, ws]
    return out.astype(grids.dtype)


def slice_windows(grids, starts, ws: int):
    """Batched exact [ws, ws] sub-window extraction from s8 grids at
    per-particle (x, y) cell offsets; MXU path for the serialized-gather
    shapes, chunked over particles to bound intermediates.

    grids s8[N, H, W]; starts i32[N, 2] (x, y), pre-clipped to
    [0, W-ws] x [0, H-ws]. Returns s8[N, ws, ws].
    """
    n = grids.shape[0]
    if n <= _CHUNK:
        return _slice_chunk(grids, starts, ws)
    c = -(-n // _CHUNK)
    pad = c * _CHUNK - n
    if pad:
        grids = jnp.concatenate(
            [grids, jnp.broadcast_to(grids[:1], (pad,) + grids.shape[1:])])
        starts = jnp.concatenate(
            [starts, jnp.broadcast_to(starts[:1], (pad, 2))])
    grids = grids.reshape(c, _CHUNK, *grids.shape[1:])
    starts = starts.reshape(c, _CHUNK, 2)
    out = jax.lax.map(lambda t: _slice_chunk(t[0], t[1], ws),
                      (grids, starts))
    return out.reshape(c * _CHUNK, ws, ws)[:n]

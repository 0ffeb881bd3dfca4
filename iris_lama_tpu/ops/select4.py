"""4-corner squared-distance selection for bilinear interpolation, fused
on the MXU with VMEM-resident intermediates.

The scan matcher's residual evaluation (match_surface_2d.cpp:42-90 in the
reference; distance._interp_window_sq here) needs the four cells
``grid[ly, lx]``, ``grid[ly, lx+1]``, ``grid[ly+1, lx]``,
``grid[ly+1, lx+1]`` for ~720 beams per particle, every IRLS iteration.
The jnp formulation materializes the [B, W] one-hot masks and the two
selected-row intermediates in HBM each iteration — at 30 particles that is
tens of MB of traffic per Gauss-Newton step and dominates the match cost.

This kernel performs the same exact integer selection entirely in VMEM:
one s8 one-hot dot ([2B, H] x [H, W] -> s32 [2B, W]) followed by masked
column reductions. Per call, only the i32 indices and the four [B] corner
values cross HBM (plus one [H, W] s8 grid block per particle).

Exactness: identical one-hot + integer arithmetic to the jnp path — the
kernel returns raw s32 corner values; all float conversion happens in the
caller with unchanged formulas.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# kill-switch: IRIS_INTERP_MXU=0 restores the jnp one-hot path
ENABLED = bool(int(os.environ.get("IRIS_INTERP_MXU", "1")))

_LANES = 128


def _kernel(ly_ref, lx_ref, g_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401 (kept for parity)

    b = ly_ref.shape[-1]
    h = g_ref.shape[-2]
    w = g_ref.shape[-1]
    ly = ly_ref[0, 0]                                     # [b] i32
    lx = lx_ref[0, 0]
    ly0 = jnp.clip(ly, 0, h - 1)
    ly1 = jnp.clip(ly + 1, 0, h - 1)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (b, h), 1)
    a0 = (iota_h == ly0[:, None]).astype(jnp.int8)
    a1 = (iota_h == ly1[:, None]).astype(jnp.int8)
    a = jnp.concatenate([a0, a1], axis=0)                 # [2b, h] s8
    r = jax.lax.dot_general(a, g_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)   # [2b, w]
    r0, r1 = r[:b], r[b:]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    m0 = iota_w == jnp.clip(lx, 0, w - 1)[:, None]
    m1 = iota_w == jnp.clip(lx + 1, 0, w - 1)[:, None]
    zero = jnp.int32(0)
    v00 = jnp.sum(jnp.where(m0, r0, zero), axis=-1)
    v10 = jnp.sum(jnp.where(m1, r0, zero), axis=-1)
    v01 = jnp.sum(jnp.where(m0, r1, zero), axis=-1)
    v11 = jnp.sum(jnp.where(m1, r1, zero), axis=-1)
    pad = jnp.zeros((4, b), jnp.int32)
    out_ref[0] = jnp.concatenate(
        [jnp.stack([v00, v10, v01, v11], axis=0), pad], axis=0)


@functools.partial(jax.jit, static_argnums=(3,))
def _select_batched(grid, ly, lx, interpret: bool = False):
    """i32[P, 4, B] corners from s8 grid[P, H, W] and i32 indices [P, B]."""
    from jax.experimental import pallas as pl

    p, h, w = grid.shape
    b = ly.shape[-1]
    bk = (b + _LANES - 1) // _LANES * _LANES
    if bk != b:
        fill = jnp.zeros((p, bk - b), jnp.int32)
        ly = jnp.concatenate([ly, fill], axis=1)
        lx = jnp.concatenate([lx, fill], axis=1)

    # index operands as [P, 1, bk] so the block's last-two dims are (1, bk)
    # with the second-minor equal to the array dim (TPU block rule)
    ly = ly[:, None, :]
    lx = lx[:, None, :]
    idx = pl.BlockSpec((1, 1, bk), lambda pp: (pp, 0, 0))
    out = pl.pallas_call(
        _kernel,
        grid=(p,),
        in_specs=[idx, idx, pl.BlockSpec((1, h, w), lambda pp: (pp, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, bk), lambda pp: (pp, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p, 8, bk), jnp.int32),
        interpret=interpret,
    )(ly, lx, grid)
    return out[:, :4, :b]


def _select_jnp(grid, ly, lx):
    """Reference path (CPU / non-s8): same selection via jnp one-hots."""
    h, w = grid.shape
    if grid.dtype == jnp.int8:
        oh_dtype, acc = jnp.int8, jnp.int32
        g = grid
    else:
        oh_dtype, acc = jnp.float32, jnp.float32
        g = grid.astype(jnp.float32)
    rows = jnp.arange(h, dtype=jnp.int32)
    oh0 = (jnp.clip(ly, 0, h - 1)[:, None] == rows).astype(oh_dtype)
    oh1 = (jnp.clip(ly + 1, 0, h - 1)[:, None] == rows).astype(oh_dtype)
    # pinned precision: the TPU default truncates f32 matmul inputs to
    # bf16, breaking the exact-selection contract (see distance.py note)
    hp = jax.lax.Precision.HIGHEST
    r0 = jax.lax.dot_general(oh0, g, (((1,), (0,)), ((), ())),
                             preferred_element_type=acc, precision=hp)
    r1 = jax.lax.dot_general(oh1, g, (((1,), (0,)), ((), ())),
                             preferred_element_type=acc, precision=hp)
    cols = jnp.arange(w, dtype=jnp.int32)
    m0 = jnp.clip(lx, 0, w - 1)[:, None] == cols
    m1 = jnp.clip(lx + 1, 0, w - 1)[:, None] == cols
    z = jnp.zeros((), r0.dtype)
    v00 = jnp.sum(jnp.where(m0, r0, z), axis=-1)
    v10 = jnp.sum(jnp.where(m1, r0, z), axis=-1)
    v01 = jnp.sum(jnp.where(m0, r1, z), axis=-1)
    v11 = jnp.sum(jnp.where(m1, r1, z), axis=-1)
    return jnp.stack([v00, v10, v01, v11], axis=0).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _make(impl: str):
    interpret = impl == "interpret"
    use_kernel = impl in ("mxu", "interpret")

    @jax.custom_batching.custom_vmap
    def select(grid, ly, lx):
        if use_kernel:
            return _select_batched(grid[None], ly[None], lx[None],
                                   interpret)[0]
        return _select_jnp(grid, ly, lx)

    @select.def_vmap
    def _batch_rule(axis_size, in_batched, grid, ly, lx):
        gb, lyb, lxb = in_batched
        grid = grid if gb else jnp.broadcast_to(grid,
                                                (axis_size,) + grid.shape)
        ly = ly if lyb else jnp.broadcast_to(ly, (axis_size,) + ly.shape)
        lx = lx if lxb else jnp.broadcast_to(lx, (axis_size,) + lx.shape)
        if use_kernel:
            return _select_batched(grid, ly, lx, interpret), True
        return jax.vmap(_select_jnp)(grid, ly, lx), True

    return select


def select4_sq(grid, ly, lx, impl: str | None = None):
    """Four bilinear corners from an integer squared-distance grid.

    grid: int [H, W] ([y, x]); ly/lx: i32[B] cell coords (clipped inside).
    Returns i32[4, B]: (v00, v10, v01, v11) with v10 = (lx+1, ly),
    v01 = (lx, ly+1). vmap-aware (particle-batched kernel on TPU).

    impl: "mxu" | "jnp" | "interpret"; default "mxu" on TPU for s8 grids
    (and ENABLED), else "jnp".
    """
    if impl is None:
        tpu = jax.default_backend() == "tpu"
        impl = ("mxu" if (tpu and ENABLED and grid.dtype == jnp.int8)
                else "jnp")
    return _make(impl)(grid, ly, lx)

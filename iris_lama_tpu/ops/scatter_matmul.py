"""Scatter-add of unit counts as an MXU contraction (the raycast deposit).

The raycast rasterizer needs ``counts[y, x] = sum_t [ly_t == y][lx_t == x]``
over ~150k ray cells per scan (reference semantics: the per-beam callback
walk of Slam2D::updateMaps, src/slam2d.cpp:313-317, re-expressed as
order-independent counts in sdm/mapping.py). XLA lowers ``grid.at[ly,
lx].add(1)`` to a serialized HBM read-modify-write stream (~13.5 ns/element
on v5e — ~2 ms/scan, ~60 ms for a 30-particle filter), and per-element
Pallas scatters are worse (4 KB aligned-tile RMW each; see
ops/scatter_pallas.py / ops/scatter_sorted.py for the measured attempts).

This op instead treats the deposit as algebra: with one-hot operands
``A[y, t] = [ly_t == y]`` and ``B[x, t] = [lx_t == x]``,

    counts = A @ B^T

— a contraction over the element axis that rides the 128x128 systolic
array. The kernel generates the one-hot tiles *in VMEM* (so nothing but the
int32 indices and the final counts ever touch HBM) and accumulates f32
counts in the output block across sequential grid steps. bf16 one-hots are
exact (0/1), and f32 accumulation is exact for counts < 2^24.

Measured (TPU v5e, W=512, N=145k): ~0.5 ms/particle at 30 particles — ~80%
of bf16 MXU peak, ~4x faster than XLA's scatter; the win grows with batch.

Invalid elements are encoded as ``ly == H`` (one-hot row of zeros), which
replaces the mask multiply: callers route masked-out cells to the sentinel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_DEFAULT_I8 = bool(int(os.environ.get("IRIS_DEPOSIT_I8", "1")))
# kill-switch for the banded kernel (A/B; band requests become full-height)
_BAND_ENABLED = bool(int(os.environ.get("IRIS_DEPOSIT_BAND", "1")))
# route unbatched (P=1) deposits through the MXU kernel instead of XLA's
# scatter. Default ON: the banded s8 kernel beats XLA's serialized scatter
# even at P=1 (slam2d 237-314 -> 437-491 scans/s, interleaved A/B; the
# earlier "ties at P=1" finding was the full-height bf16 kernel).
_P1_MXU = bool(int(os.environ.get("IRIS_P1_MXU", "1")))

# Elements per one-hot operand tile. 512 keeps each (W, CHUNK) bf16 operand
# at 512 KB and the contraction MXU-shaped; 8 sub-chunks amortize grid-step
# overheads (index blocks must have a sublane dim divisible by 8).
CHUNK = 512
SUBS = 8
_MACRO = SUBS * CHUNK


def _kernel(ly_ref, lx_ref, out_ref, *, op_dtype=jnp.bfloat16):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    chunk = ly_ref.shape[-1]
    h = out_ref.shape[-2]
    w = out_ref.shape[-1]
    acc_dtype = jnp.int32 if op_dtype == jnp.int8 else jnp.float32
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, chunk), 0)
    iota_w = (iota_h if h == w else
              jax.lax.broadcasted_iota(jnp.int32, (w, chunk), 0))
    acc = jnp.zeros((h, w), acc_dtype)
    for i in range(SUBS):
        a = (iota_h == jnp.broadcast_to(ly_ref[0, 0, i, :],
                                        (h, chunk))).astype(op_dtype)
        b = (iota_w == jnp.broadcast_to(lx_ref[0, 0, i, :],
                                        (w, chunk))).astype(op_dtype)
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype)
    out_ref[0] = out_ref[0] + acc.astype(out_ref.dtype)


def _kernel_band(off_ref, ly_ref, lx_ref, out_ref, *, op_dtype, bh):
    """Banded variant: one-hot rows span only [offy, offy+bh) per chunk.

    Consecutive chunks are consecutive beams (callers deposit beam-major
    ray cells), i.e. a narrow angular sector whose cells all lie within
    ``reach`` rows of the chunk's minimum row — the per-chunk row band.
    Elements outside the band (adversarial beam order) deposit nothing
    here; the wrapper adds them back with an XLA scatter under a cond.
    """
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # the prefetch holds offy/8; multiplying here lets Mosaic statically
    # prove the dynamic sublane offset is 8-aligned
    offy = off_ref[pl.program_id(0), pl.program_id(1)] * 8
    chunk = ly_ref.shape[-1]
    w = out_ref.shape[-1]
    acc_dtype = jnp.int32 if op_dtype == jnp.int8 else jnp.float32
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (bh, chunk), 0) + offy
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, chunk), 0)
    acc = jnp.zeros((bh, w), acc_dtype)
    for i in range(SUBS):
        a = (iota_b == jnp.broadcast_to(ly_ref[0, 0, i, :],
                                        (bh, chunk))).astype(op_dtype)
        b = (iota_w == jnp.broadcast_to(lx_ref[0, 0, i, :],
                                        (w, chunk))).astype(op_dtype)
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype)
    cur = out_ref[0, pl.dslice(offy, bh), :]
    out_ref[0, pl.dslice(offy, bh), :] = cur + acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _scatter_batched(ly, lx, h: int, w: int, interpret: bool = False,
                     int8: bool = False, band: int = 0):
    """f32[P, h, w] counts from int32[P, N] indices (invalid: ly >= h).

    ``w`` is padded up to a lane multiple (128) for the kernel and sliced
    back — extra columns are never indexed (lx < w) so they only cost MXU
    cycles, not correctness. ``int8`` contracts s8 one-hots to s32 (2x the
    bf16 MXU rate on v5e; exact — counts are integers). ``band`` > 0
    restricts each chunk's one-hot rows to a [band, w] window starting at
    the chunk's (8-aligned) minimum row — callers size it so any single
    scan sector fits (see _kernel_band); out-of-band elements are added
    back exactly via an XLA scatter that only runs when any exist.
    """
    from jax.experimental import pallas as pl

    wk = (w + 127) // 128 * 128
    p, n = ly.shape
    pad = (-n) % _MACRO
    if pad:
        fill = jnp.full((p, pad), h, jnp.int32)
        ly = jnp.concatenate([ly, fill], axis=1)
        lx = jnp.concatenate([lx, fill], axis=1)
    n_chunks = ly.shape[1] // _MACRO
    lyc = ly.reshape(p, n_chunks, SUBS, CHUNK)
    lxc = lx.reshape(p, n_chunks, SUBS, CHUNK)

    op_dtype = jnp.int8 if int8 else jnp.bfloat16
    out_dtype = jnp.int32 if int8 else jnp.float32
    idx = pl.BlockSpec((1, 1, SUBS, CHUNK), lambda pp, cc: (pp, cc, 0, 0))
    banded = 0 < band < h
    if banded:
        bh = (band + 7) // 8 * 8
        # 8-aligned per-(particle, chunk) band starts, carried as offy/8
        # (sentinel-only chunks have min h -> clamped to the top band,
        # which they cannot hit)
        offy8 = jnp.clip(jnp.min(lyc, axis=(2, 3)) // 8, 0,
                         (h - bh) // 8).astype(jnp.int32)
        from jax.experimental.pallas import tpu as pltpu
        idx_s = pl.BlockSpec((1, 1, SUBS, CHUNK),
                             lambda pp, cc, off: (pp, cc, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(p, n_chunks),
            in_specs=[idx_s, idx_s],
            out_specs=pl.BlockSpec((1, h, wk),
                                   lambda pp, cc, off: (pp, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(_kernel_band, op_dtype=op_dtype, bh=bh),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p, h, wk), out_dtype),
            interpret=interpret,
        )(offy8, lyc, lxc)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, op_dtype=op_dtype),
            grid=(p, n_chunks),
            in_specs=[idx, idx],
            out_specs=pl.BlockSpec((1, h, wk), lambda pp, cc: (pp, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((p, h, wk), out_dtype),
            interpret=interpret,
        )(lyc, lxc)
    out = out.astype(jnp.float32)
    out = out[:, :, :w] if wk != w else out

    if banded:
        # exactness fallback: elements outside their chunk's band (only
        # possible when beams are not angle-ordered) are scattered in by
        # XLA; the branch is skipped entirely in the common case
        offy_e = jnp.repeat(offy8 * 8, _MACRO, axis=1)[:, :ly.shape[1]]
        oob = (ly < h) & ((ly < offy_e) | (ly >= offy_e + bh))

        def fix(o):
            ly_fix = jnp.where(oob, ly, h)
            return o + jax.vmap(
                lambda a, b: _scatter_xla(a, b, h, w))(ly_fix, lx
                                                       ).astype(o.dtype)

        out = jax.lax.cond(jnp.any(oob), fix, lambda o: o, out)
    return out


def _scatter_xla(ly, lx, h: int, w: int):
    """Reference path (CPU tests / tiny batches): XLA scatter-add."""
    ok = ((ly >= 0) & (ly < h) & (lx >= 0) & (lx < w)).astype(jnp.int32)
    grid = jnp.zeros((h, w), jnp.int32)
    return grid.at[jnp.clip(ly, 0, h - 1), jnp.clip(lx, 0, w - 1)].add(ok)


@functools.lru_cache(maxsize=None)
def _make(h: int, w: int, impl: str, band: int = 0):
    if impl == "xla":
        return functools.partial(_scatter_xla, h=h, w=w)

    interpret = impl.startswith("interpret")
    int8 = impl.endswith("_i8")

    # Unbatched calls keep XLA's scatter by default: at P=1 the bf16 MXU
    # kernel only tied it (measured in-situ on slam2d), and XLA fuses the
    # scatter with its neighbors. The batched (vmapped) case is where the
    # contraction wins big — 30-particle map updates went 82.5 -> 41.3 ms.
    # IRIS_P1_MXU=1 routes P=1 through the (now banded s8) kernel for A/B.
    @jax.custom_batching.custom_vmap
    def scatter(ly, lx):
        if interpret or (_P1_MXU and band):
            return _scatter_batched(ly[None], lx[None], h, w, interpret,
                                    int8, band)[0]
        return _scatter_xla(ly, lx, h, w).astype(jnp.float32)

    @scatter.def_vmap
    def _batch_rule(axis_size, in_batched, ly, lx):
        ly_b, lx_b = in_batched
        ly = ly if ly_b else jnp.broadcast_to(ly, (axis_size,) + ly.shape)
        lx = lx if lx_b else jnp.broadcast_to(lx, (axis_size,) + lx.shape)
        return _scatter_batched(ly, lx, h, w, interpret, int8, band), True

    return scatter


def scatter_counts_2d(ly, lx, h: int, w: int, impl: str | None = None,
                      band: int = 0):
    """int32[h, w] unit-count deposit; vmap-aware (batches the MXU kernel).

    ly/lx: int32[N] grid coordinates; invalid elements must hold ly >= h
    (they contribute nothing). ``h`` must be a multiple of 8 for the TPU
    kernel (window grids are patch multiples); ``w`` is padded to a lane
    multiple internally. ``band``: optional static bound on the row extent
    of any 4096-element chunk (beam-major callers: the scan reach in
    cells, plus rounding slack) — enables the banded kernel, ~h/band fewer
    MXU MACs, exact for any input (out-of-band fallback).

    impl: "mxu" | "mxu_i8" | "xla" | "interpret" | "interpret_i8" (testing);
    default picks "mxu_i8" on TPU backends (s8 contraction, 2x bf16 MXU
    rate, exact; set IRIS_DEPOSIT_I8=0 for the bf16 kernel) and "xla"
    elsewhere.
    """
    if impl is None:
        mxu = "mxu_i8" if _DEFAULT_I8 else "mxu"
        impl = mxu if jax.default_backend() == "tpu" else "xla"
    if impl != "xla" and h % 8:
        impl = "xla"
    out = _make(h, w, impl, int(band) if _BAND_ENABLED else 0)(ly, lx)
    return out.astype(jnp.int32)

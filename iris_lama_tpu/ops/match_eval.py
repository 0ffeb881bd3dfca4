"""Fused Gauss-Newton evaluation for the scan matcher, one launch per
IRLS evaluation. MEASURED SLOWER than the select4-based jnp path — kept
(default-off) as a recorded attempt; see the numbers below before
revisiting.

Per GN iteration the matcher needs the normal-equation pieces
``A = Jw'Jw`` (6 scalars), ``g = Jw'rw`` (3) and ``chi2 = rw'rw`` for each
particle, where (r, J) come from the bilinear distance-field interpolation
(match_surface_2d.cpp:42-90) and ``w = sqrt(robust(r))`` (solver.cpp:71-77).
The jnp formulation spends ~25 medium elementwise/reduction ops on
[P, B(, W)] intermediates per evaluation; this kernel performs corner
selection (s8 one-hot MXU contraction, as ops/select4.py), the corner->
meters conversion, the bilinear value+gradient, masking, Cauchy weighting
and all ten reductions in VMEM and writes 10 scalars per particle.

Measured (TPU v5e, PF bench, 30 particles, interleaved A/B, 3 pairs):
fused 22.4/23.1/22.7 vs jnp-path 28.3/28.6/28.3 updates/s — the two
pallas launches per GN iteration re-DMA all particle grids (~5.6 MB) and
seven operand arrays every evaluation with no residency across the
while_loop, which costs more than the elementwise fusion saves. A win
here needs the WHOLE solve loop inside one kernel (grid loaded once per
solve) — that requires in-kernel while over per-particle convergence and
batched per-particle dots; attempt only with that design.

Exact formula parity: every float expression mirrors
``distance._interp_window_sq`` / ``match_surface_2d.make_window_eval`` /
``nlls_solver._weighted`` term for term. Reduction association may differ
from XLA's (Mosaic schedules the sums), so chi2 can differ in the last
ulp from the jnp path — the CPU jnp path remains the oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# default OFF (measured regression, header); IRIS_GN_FUSED=1 to A/B again
ENABLED = bool(int(os.environ.get("IRIS_GN_FUSED", "0")))

_LANES = 128
N_OUT = 10   # a00 a01 a02 a11 a12 a22 g0 g1 g2 chi2


def _corners(ly, lx, g, h, w):
    """s32 corner values (v00, v10, v01, v11), clipped reads."""
    b = ly.shape[0]
    ly0 = jnp.clip(ly, 0, h - 1)
    ly1 = jnp.clip(ly + 1, 0, h - 1)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (b, h), 1)
    a0 = (iota_h == ly0[:, None]).astype(jnp.int8)
    a1 = (iota_h == ly1[:, None]).astype(jnp.int8)
    a = jnp.concatenate([a0, a1], axis=0)
    r = jax.lax.dot_general(a, g, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    r0, r1 = r[:b], r[b:]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    m0 = iota_w == jnp.clip(lx, 0, w - 1)[:, None]
    m1 = iota_w == jnp.clip(lx + 1, 0, w - 1)[:, None]
    z = jnp.int32(0)
    v00 = jnp.sum(jnp.where(m0, r0, z), axis=-1)
    v10 = jnp.sum(jnp.where(m1, r0, z), axis=-1)
    v01 = jnp.sum(jnp.where(m0, r1, z), axis=-1)
    v11 = jnp.sum(jnp.where(m1, r1, z), axis=-1)
    return v00, v10, v01, v11


def _eval_math(ly, lx, v00i, v10i, v01i, v11i, mux, muy, hx, hy, fm,
               h, w, max_dist, res, scale, cauchy_c):
    """Everything after corner selection — shared by kernel and jnp path.

    Mirrors _interp_window_sq + make_window_eval + solver._weighted exactly.
    """
    md = jnp.float32(max_dist)
    resf = jnp.float32(res)

    def corner(s, ok):
        return jnp.where(ok, jnp.sqrt(s.astype(jnp.float32)) * resf, md)

    def inx(v):
        return (v >= 0) & (v < w)

    def iny(v):
        return (v >= 0) & (v < h)

    v00 = corner(v00i, inx(lx) & iny(ly))
    v10 = corner(v10i, inx(lx + 1) & iny(ly))
    v01 = corner(v01i, inx(lx) & iny(ly + 1))
    v11 = corner(v11i, inx(lx + 1) & iny(ly + 1))

    mix, miy = 1.0 - mux, 1.0 - muy
    dist = (v00 * mix * miy + v10 * miy * mux +
            v01 * mix * muy + v11 * mux * muy)
    scl = jnp.float32(scale)
    gx_ = -((v00 - v10) * miy + (v01 - v11) * muy) * scl
    gy_ = -((v00 - v01) * mix + (v10 - v11) * mux) * scl

    r = dist * fm
    gx = gx_ * fm
    gy = gy_ * fm
    jw = gy * hx - gx * hy

    if cauchy_c > 0.0:
        cinv = jnp.float32(1.0 / (cauchy_c * cauchy_c))
        wgt = 1.0 / (1.0 + r * r * cinv)
    else:
        wgt = jnp.ones_like(r)
    sw = jnp.sqrt(wgt)
    rw = r * sw
    gxw = gx * sw
    gyw = gy * sw
    jww = jw * sw

    return (jnp.sum(gxw * gxw), jnp.sum(gxw * gyw), jnp.sum(gxw * jww),
            jnp.sum(gyw * gyw), jnp.sum(gyw * jww), jnp.sum(jww * jww),
            jnp.sum(gxw * rw), jnp.sum(gyw * rw), jnp.sum(jww * rw),
            jnp.sum(rw * rw))


def _kernel(ly_ref, lx_ref, mux_ref, muy_ref, hx_ref, hy_ref, fm_ref,
            g_ref, out_ref, *, max_dist, res, scale, cauchy_c):
    h = g_ref.shape[-2]
    w = g_ref.shape[-1]
    ly = ly_ref[0, 0]
    lx = lx_ref[0, 0]
    v00, v10, v01, v11 = _corners(ly, lx, g_ref[0], h, w)
    sums = _eval_math(ly, lx, v00, v10, v01, v11,
                      mux_ref[0, 0], muy_ref[0, 0], hx_ref[0, 0],
                      hy_ref[0, 0], fm_ref[0, 0], h, w,
                      max_dist, res, scale, cauchy_c)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (16, _LANES), 0)
    acc = jnp.zeros((16, _LANES), jnp.float32)
    for i, s in enumerate(sums):
        acc = acc + jnp.where(lanes == i, s, jnp.float32(0.0))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12))
def _eval_batched(grid, ly, lx, mux, muy, hx, hy, fm,
                  max_dist: float, res: float, scale: float,
                  cauchy_c: float, interpret: bool = False):
    """f32[P, N_OUT] GN sums; operands [P, B] (+ grid [P, H, W] s8)."""
    from jax.experimental import pallas as pl

    p, h, w = grid.shape
    b = ly.shape[-1]
    bk = (b + _LANES - 1) // _LANES * _LANES

    def pad(a, fill=0):
        if bk == b:
            return a[:, None, :]
        f = jnp.full((p, bk - b), fill, a.dtype)
        return jnp.concatenate([a, f], axis=1)[:, None, :]

    ly, lx = pad(ly), pad(lx)
    mux, muy = pad(mux), pad(muy)
    hx, hy = pad(hx), pad(hy)
    fm = pad(fm)   # zero-fill -> padded lanes contribute nothing

    idx_i = pl.BlockSpec((1, 1, bk), lambda pp: (pp, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, max_dist=max_dist, res=res, scale=scale,
                          cauchy_c=cauchy_c),
        grid=(p,),
        in_specs=[idx_i] * 7 + [pl.BlockSpec((1, h, w),
                                             lambda pp: (pp, 0, 0))],
        out_specs=pl.BlockSpec((1, 16, _LANES), lambda pp: (pp, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p, 16, _LANES), jnp.float32),
        interpret=interpret,
    )(ly, lx, mux, muy, hx, hy, fm, grid)
    return out[:, :N_OUT, 0]


def _eval_jnp(grid, ly, lx, mux, muy, hx, hy, fm,
              max_dist, res, scale, cauchy_c):
    from . import select4
    h, w = grid.shape
    v = select4.select4_sq(grid, ly, lx, impl="jnp")
    sums = _eval_math(ly, lx, v[0], v[1], v[2], v[3], mux, muy, hx, hy, fm,
                      h, w, max_dist, res, scale, cauchy_c)
    return jnp.stack(sums)


@functools.lru_cache(maxsize=None)
def _make(max_dist: float, res: float, scale: float, cauchy_c: float,
          impl: str):
    interpret = impl == "interpret"
    use_kernel = impl in ("mxu", "interpret")

    @jax.custom_batching.custom_vmap
    def ev(grid, ly, lx, mux, muy, hx, hy, fm):
        if use_kernel:
            return _eval_batched(grid[None], ly[None], lx[None], mux[None],
                                 muy[None], hx[None], hy[None], fm[None],
                                 max_dist, res, scale, cauchy_c,
                                 interpret)[0]
        return _eval_jnp(grid, ly, lx, mux, muy, hx, hy, fm,
                         max_dist, res, scale, cauchy_c)

    @ev.def_vmap
    def _batch_rule(axis_size, in_batched, *args):
        full = tuple(
            a if ab else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, ab in zip(args, in_batched))
        if use_kernel:
            return _eval_batched(*full, max_dist, res, scale, cauchy_c,
                                 interpret), True
        return jax.vmap(lambda *xs: _eval_jnp(
            *xs, max_dist, res, scale, cauchy_c))(*full), True

    return ev


def gn_eval_sq(grid, ly, lx, mux, muy, hx, hy, fm, *, max_dist, res, scale,
               cauchy_c, impl: str | None = None):
    """GN normal-equation sums from an s8 squared-distance window.

    Returns f32[N_OUT]: (a00, a01, a02, a11, a12, a22, g0, g1, g2, chi2).
    vmap-aware: particle batches run as one multi-step kernel on TPU.

    cauchy_c <= 0 selects unit weights.
    """
    if impl is None:
        tpu = jax.default_backend() == "tpu"
        impl = ("mxu" if (tpu and ENABLED and grid.dtype == jnp.int8)
                else "jnp")
    return _make(float(max_dist), float(res), float(scale), float(cauchy_c),
                 impl)(grid, ly, lx, mux, muy, hx, hy, fm)

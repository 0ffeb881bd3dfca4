"""Whole-solve Gauss-Newton IRLS kernel: ONE Pallas launch per scan-match
solve, with the particle's distance grid resident in VMEM across all
iterations.

Why this shape: ops/match_eval.py (the per-evaluation fused kernel)
measured SLOWER than the jnp path because every GN iteration re-DMA'd all
particle grids from HBM and paid two launches; its header concludes "a win
here needs the WHOLE solve loop inside one kernel (grid loaded once per
solve)". This module is that design. Each pallas program instance owns one
particle: it loads the s8 squared-distance window once, then runs the full
IRLS loop (solver.cpp:53-118 / gauss_newton.cpp:53-91 semantics, identical
to match_surface_2d._solve_window_fused) with only scalars in the loop
carry. Because grid programs execute sequentially on the core, each
particle pays its OWN iteration count — the batched-while_loop jnp path
pays the slowest particle's count for every lane (mean-max ~35 of 50 on
the PF bench; see docs/STATUS.md).

Exact formula parity: corner selection and the residual/Jacobian/robust
algebra reuse ops/match_eval's `_corners`/`_eval_math` (term-for-term
mirrors of distance._interp_window_sq + match_surface_2d.make_window_eval
+ nlls_solver._weighted). Reduction association is Mosaic-scheduled, so
sums can differ from the XLA path in the last ulp; the CPU jnp path stays
the oracle (same policy as ops/match_eval.py).

MEASURED (TPU v5e, interleaved A/B vs the default jnp paths, 2026-08):
  PF 30 particles:  26.2/26.4/26.7 vs 30.7/31.7 updates/s  -> LOSES ~15%
  Slam2D (P=1):     392/460 vs 469/425 scans/s             -> tie
  Loc2D (P=1):      79 vs 149/200 updates/s                -> loses
Verdict: default OFF, recorded attempt. Although residency + per-particle
early exit work exactly as designed (correctness verified bit-equal to
interpret mode through multi-iteration solves), the sequential grid
serializes [2B,W]x[W,W] matmuls that XLA's batched while_loop overlaps
across particles, and sum-of-iterations (~25x30) is not enough below
max*N (~35x30) to pay for that. The Loc2D number also carries the s8
covariance/rmse evals its f32 default avoids. A future attempt would
need cross-particle MXU batching INSIDE the kernel (block-diagonal
corner dots), which this grid layout cannot express.

RE-MEASURED late r3 (after host-gated re-orgs made the surrounding PF
step ~10x cheaper): PF 88.3 vs 85.7-90.2 default — now a TIE (the 15%
loss was partly masked overhead that host-gating removed). Still default
OFF: no win, and the XLA path stays the bit-exactness oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import match_eval

# default-off until the interleaved PF/Slam2D A/B says otherwise;
# IRIS_GN_SOLVE=0/1 to force
ENABLED = bool(int(os.environ.get("IRIS_GN_SOLVE", "0")))

_LANES = 128
N_ROWS = 8   # tx ty cos sin chi2 iters sum_d2 pad


def _sin_cos(w):
    """Scalar sin/cos computed on a vector tile (Mosaic's transcendentals
    are vector-unit ops; scalar lowering is not guaranteed)."""
    v = jnp.full((1, _LANES), w, jnp.float32)
    return jnp.sin(v)[0, 0], jnp.cos(v)[0, 0]


def _exp_compose(h0, h1, h2, tx, ty, c, s):
    """state' = exp(h) * state on scalars (lie.se2_exp + se2_compose)."""
    sw, cw = _sin_cos(h2)
    small = jnp.abs(h2) < 1e-4
    t2 = h2 * h2
    safe = jnp.where(small, jnp.float32(1.0), h2)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, sw / safe)
    cosc = jnp.where(small, h2 / 2.0 - t2 * h2 / 24.0, (1.0 - cw) / safe)
    etx = sinc * h0 - cosc * h1
    ety = cosc * h0 + sinc * h1
    # compose(exp(h), state)
    ntx = etx + cw * tx - sw * ty
    nty = ety + sw * tx + cw * ty
    nc = cw * c - sw * s
    ns = sw * c + cw * s
    return ntx, nty, nc, ns


def _solve3_scalar(a00, a01, a02, a11, a12, a22, g0, g1, g2):
    """nlls_solver._solve3 on scalars (adjugate closed form)."""
    co00 = a11 * a22 - a12 * a12
    co01 = a02 * a12 - a01 * a22
    co02 = a01 * a12 - a02 * a11
    det = a00 * co00 + a01 * co01 + a02 * co02
    co11 = a00 * a22 - a02 * a02
    co12 = a01 * a02 - a00 * a12
    co22 = a00 * a11 - a01 * a01
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    h0 = -(co00 * g0 + co01 * g1 + co02 * g2) * inv_det
    h1 = -(co01 * g0 + co11 * g1 + co12 * g2) * inv_det
    h2 = -(co02 * g0 + co12 * g1 + co22 * g2) * inv_det
    return h0, h1, h2


def _kernel(org_ref, st0_ref, px_ref, py_ref, fm_ref, g_ref, out_ref, *,
            max_dist, res, scale, cell_offset, cauchy_c, eps1, eps2,
            max_iter, want_lik):
    from jax.experimental import pallas as pl

    h = g_ref.shape[-2]
    w = g_ref.shape[-1]
    g = g_ref[0]
    px = px_ref[0, 0]
    py = py_ref[0, 0]
    fm = fm_ref[0, 0]
    pid = pl.program_id(0)
    org_x = org_ref[pid, 0]
    org_y = org_ref[pid, 1]
    scl = jnp.float32(scale)
    off = jnp.int32(cell_offset)

    def sums_at(tx, ty, c, s, cc):
        # lie.se2_apply + geometry.w2m_frac (floor + integer offset)
        hx = tx + c * px - s * py
        hy = ty + s * px + c * py
        mfx = hx * scl
        mfy = hy * scl
        flx = jnp.floor(mfx)
        fly = jnp.floor(mfy)
        lx = flx.astype(jnp.int32) + off - org_x
        ly = fly.astype(jnp.int32) + off - org_y
        mux = mfx - flx
        muy = mfy - fly
        v00, v10, v01, v11 = match_eval._corners(ly, lx, g, h, w)
        return match_eval._eval_math(ly, lx, v00, v10, v01, v11, mux, muy,
                                     hx, hy, fm, h, w, max_dist, res,
                                     scale, cc)

    s0 = sums_at(st0_ref[pid, 0], st0_ref[pid, 1], st0_ref[pid, 2],
                 st0_ref[pid, 3], cauchy_c)

    def cond(carry):
        stop, it = carry[14], carry[15]
        return jnp.logical_and(stop == 0, it < max_iter)

    def body(carry):
        tx, ty, c, s = carry[0], carry[1], carry[2], carry[3]
        sm = carry[4:14]
        it = carry[15]
        chi2 = sm[9]
        g_max = jnp.maximum(jnp.maximum(jnp.abs(sm[6]), jnp.abs(sm[7])),
                            jnp.abs(sm[8]))
        stop_g = g_max < eps1
        h0, h1, h2 = _solve3_scalar(sm[0], sm[1], sm[2], sm[3], sm[4],
                                    sm[5], sm[6], sm[7], sm[8])
        zero = jnp.float32(0)
        h0 = jnp.where(stop_g, zero, h0)
        h1 = jnp.where(stop_g, zero, h1)
        h2 = jnp.where(stop_g, zero, h2)
        h_max = jnp.maximum(jnp.maximum(jnp.abs(h0), jnp.abs(h1)),
                            jnp.abs(h2))
        stop_now = jnp.logical_or(stop_g, h_max < eps2)

        def converged(_):
            return (tx, ty, c, s) + sm + (jnp.int32(1), it)

        def take_step(_):
            ntx, nty, nc, ns = _exp_compose(h0, h1, h2, tx, ty, c, s)
            nsm = sums_at(ntx, nty, nc, ns, cauchy_c)
            ok = (chi2 - nsm[9]) > 0.0
            out_state = tuple(jnp.where(ok, n, o) for n, o in
                              zip((ntx, nty, nc, ns), (tx, ty, c, s)))
            out_sums = tuple(jnp.where(ok, n, o) for n, o in zip(nsm, sm))
            return out_state + out_sums + ((~ok).astype(jnp.int32), it + 1)

        return jax.lax.cond(stop_now, converged, take_step, None)

    init = (st0_ref[pid, 0], st0_ref[pid, 1], st0_ref[pid, 2],
            st0_ref[pid, 3]) + s0 + (jnp.int32(0), jnp.int32(0))
    fin = jax.lax.while_loop(cond, body, init)
    tx, ty, c, s = fin[0], fin[1], fin[2], fin[3]
    chi2 = fin[13]
    it_f = fin[15].astype(jnp.float32)
    if want_lik:
        # unweighted masked sum d^2 at the final state (cauchy_c=0 makes
        # _eval_math's s9 exactly sum((d*fm)^2) — the PF likelihood input)
        sum_d2 = sums_at(tx, ty, c, s, 0.0)[9]
    else:
        sum_d2 = jnp.float32(0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (N_ROWS, _LANES), 0)
    acc = jnp.zeros((N_ROWS, _LANES), jnp.float32)
    for i, v in enumerate((tx, ty, c, s, chi2, it_f, sum_d2)):
        acc = acc + jnp.where(rows == i, v, jnp.float32(0.0))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnums=tuple(range(5, 15)))
def _solve_batched(grid, org, st0, pts, fm,
                   max_dist: float, res: float, scale: float,
                   cell_offset: int, cauchy_c: float, eps1: float,
                   eps2: float, max_iter: int, want_lik: bool,
                   interpret: bool = False):
    """grid s8[P, H, W], org i32[P, 2], st0 f32[P, 4], pts f32[Pp, B, 2],
    fm f32[Pp, B] with Pp in {1, P} -> f32[P, N_ROWS] result rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, h, w = grid.shape
    pp_pts = pts.shape[0]
    b = pts.shape[1]
    bk = (b + _LANES - 1) // _LANES * _LANES

    px = pts[..., 0]
    py = pts[..., 1]
    if bk != b:
        zf = jnp.zeros((pp_pts, bk - b), jnp.float32)
        px = jnp.concatenate([px, zf], axis=1)
        py = jnp.concatenate([py, zf], axis=1)
        fm = jnp.concatenate([fm, zf], axis=1)
    px, py, fm = px[:, None, :], py[:, None, :], fm[:, None, :]

    if pp_pts == 1:
        vec = pl.BlockSpec((1, 1, bk), lambda i: (0, 0, 0))
    else:
        vec = pl.BlockSpec((1, 1, bk), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, max_dist=max_dist, res=res, scale=scale,
                          cell_offset=cell_offset, cauchy_c=cauchy_c,
                          eps1=eps1, eps2=eps2, max_iter=max_iter,
                          want_lik=want_lik),
        grid=(p,),
        in_specs=[
            # whole scalar tables resident in SMEM, indexed by program_id
            # (blocked SMEM specs would need 8x128-divisible shapes)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vec, vec, vec,
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N_ROWS, _LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p, N_ROWS, _LANES), jnp.float32),
        interpret=interpret,
    )(org, st0, px, py, fm, grid)
    return out[:, :, 0]


@functools.lru_cache(maxsize=None)
def _make(max_dist: float, res: float, scale: float, cell_offset: int,
          cauchy_c: float, eps1: float, eps2: float, max_iter: int,
          want_lik: bool, impl: str):
    interpret = impl == "interpret"
    statics = (max_dist, res, scale, cell_offset, cauchy_c, eps1, eps2,
               max_iter, want_lik, interpret)

    @jax.custom_batching.custom_vmap
    def ev(grid, org, st0, pts, fm):
        return _solve_batched(grid[None], org[None], st0[None], pts[None],
                              fm[None], *statics)[0]

    @ev.def_vmap
    def _batch_rule(axis_size, in_batched, grid, org, st0, pts, fm):
        gb, ob, sb, pb, fb = in_batched

        def bc(a, ab):
            return a if ab else jnp.broadcast_to(a, (axis_size,) + a.shape)

        grid, org, st0 = bc(grid, gb), bc(org, ob), bc(st0, sb)
        if pb or fb:
            pts, fm = bc(pts, pb), bc(fm, fb)
        else:
            pts, fm = pts[None], fm[None]
        return _solve_batched(grid, org, st0, pts, fm, *statics), True

    return ev


def solve_window_sq(grid, org_cell, state0, points_xy, mask, *,
                    max_dist, res, scale, cell_offset, cauchy_c,
                    eps1, eps2, max_iter, want_lik=False,
                    impl: str | None = None):
    """Full GN IRLS scan-match on an s8 squared-distance window.

    Returns (state f32[4], iterations i32, chi2 f32, sum_d2 f32) where
    sum_d2 is the unweighted masked residual SSE at the final state (0
    unless want_lik). vmap-aware over (grid, org_cell, state0).
    """
    if impl is None:
        impl = "mxu" if jax.default_backend() == "tpu" else "interpret"
    fm = mask.astype(jnp.float32)
    rows = _make(float(max_dist), float(res), float(scale),
                 int(cell_offset), float(cauchy_c), float(eps1),
                 float(eps2), int(max_iter), bool(want_lik),
                 impl)(grid, org_cell, state0, points_xy, fm)
    state = rows[0:4]
    return (state, rows[5].astype(jnp.int32), rows[4], rows[6])

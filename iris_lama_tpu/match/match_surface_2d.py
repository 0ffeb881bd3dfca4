"""Point-to-distance-field scan matching (the LaMa core cost).

reference: src/match_surface_2d.cpp:42-122 —
residual_i = distance(T * p_i), Jacobian row [gx, gy, gy*x - gx*y],
manifold update state' = exp(h) * state.

TPU shape: residual+Jacobian evaluation is one fused gather/bilinear kernel
over all beams (and, under vmap, all particles/hypotheses); the distance
source is either a dense pose-centered window (hot path) or the patch pool
(global localization).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..core import lie
from ..ops import gn_batch, gn_solve, match_eval
from ..sdm import distance as dist_mod
from ..sdm.geometry import MapGeometry
from ..nlls import solver as nlls_solver


def make_window_eval(grid, org_cell, geo: MapGeometry, max_dist,
                     points_xy, mask):
    """Build eval_fn(state)->(r, J) reading a dense distance window.

    points_xy: f32[B, 2] — scan points already transformed by the sensor
    (moving) frame; ``state`` applies the robot pose on top
    (match_surface_2d.cpp:49-59: tf = fixed_tf * moving_tf).
    """
    fmask = mask.astype(jnp.float32)

    def eval_fn(state):
        hits = lie.se2_apply(state, points_xy)            # [B, 2]
        d, grad = dist_mod.interp_window(grid, org_cell, geo, hits, max_dist)
        r = d * fmask
        gx, gy = grad[..., 0] * fmask, grad[..., 1] * fmask
        # J = Je * Js with Js = [[1,0,-y],[0,1,x]] (match_surface_2d.cpp:77-88)
        jw = gy * hits[..., 0] - gx * hits[..., 1]
        J = jnp.stack([gx, gy, jw], axis=-1)
        return r, J

    return eval_fn


def make_pool_eval(table, dist, geo: MapGeometry, max_dist, points_xy, mask):
    """Same cost, reading straight from the patch pool (no window)."""
    fmask = mask.astype(jnp.float32)

    def eval_fn(state):
        hits = lie.se2_apply(state, points_xy)
        d, grad = dist_mod.interp_pool(table, dist, geo, hits, max_dist)
        r = d * fmask
        gx, gy = grad[..., 0] * fmask, grad[..., 1] * fmask
        jw = gy * hits[..., 0] - gx * hits[..., 1]
        J = jnp.stack([gx, gy, jw], axis=-1)
        return r, J

    return eval_fn


def update_state(state, h):
    """state' = exp(h) * state (match_surface_2d.cpp:118-122)."""
    return lie.se2_compose(lie.se2_exp(h), state)


def rmse_cells(table, dist, geo: MapGeometry, max_dist, points_xy, mask,
               state):
    """Nearest-cell RMSE (match_surface_2d.cpp:92-116 ``error``).

    Uses the uninterpolated per-cell distance like the reference.
    """
    hits = lie.se2_apply(state, points_xy)
    cells = geo.w2m(hits)
    d = dist_mod.cell_distance(table, dist, geo, cells, max_dist)
    d = d * mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sqrt(jnp.sum(d * d) / n)


def solve_window(grid, org_cell, geo, max_dist, points_xy, mask,
                 state0, opts) -> nlls_solver.SolveResult:
    """Scan-match against a dense window (Slam2D/PFSlam2D hot path).

    On TPU, GN solves against s8 squared-distance windows use the fused
    evaluation kernel (ops/match_eval.py): one launch per evaluation
    instead of ~25 elementwise/reduction ops. Identical formulas; the CPU
    path keeps the generic IRLS solver (the oracle for tests).
    """
    if (opts.strategy == "gn" and grid.dtype == jnp.int8
            and opts.robust.kind in ("cauchy", "unit")
            and jax.default_backend() == "tpu"):
        if gn_solve.ENABLED:
            # whole-solve kernel: grid VMEM-resident across ALL IRLS
            # iterations, per-particle early exit (ops/gn_solve.py)
            cauchy_c = (opts.robust.param if opts.robust.kind == "cauchy"
                        else 0.0)
            st, it, chi2, _ = gn_solve.solve_window_sq(
                grid, jnp.asarray(org_cell, jnp.int32), state0,
                points_xy, mask, max_dist=max_dist, res=geo.resolution,
                scale=geo.scale, cell_offset=geo.cell_offset,
                cauchy_c=cauchy_c, eps1=opts.eps1, eps2=opts.eps2,
                max_iter=opts.max_iterations)
            zero = jnp.float32(0)
            return nlls_solver.SolveResult(state=st, iterations=it,
                                           chi2=chi2, r=zero, J=zero)
        if match_eval.ENABLED:
            return _solve_window_fused(grid, org_cell, geo, max_dist,
                                       points_xy, mask, state0, opts)
    eval_fn = make_window_eval(grid, org_cell, geo, max_dist, points_xy, mask)
    return nlls_solver.solve(eval_fn, update_state, state0, opts)


def _solve_window_fused(grid, org_cell, geo, max_dist, points_xy, mask,
                        state0, opts) -> nlls_solver.SolveResult:
    """GN IRLS consuming fused normal-equation sums.

    Control flow mirrors nlls_solver.solve's GN branch statement for
    statement (solver.cpp:53-118 / gauss_newton.cpp:53-91): eval + weight,
    eps1/eps2 stops with the converged-before-step shortcut, chi2-decrease
    validity, invalid => stop without applying; ``iterations``/``chi2``
    carry the same values. r/J are not materialized (no caller uses them).
    """
    cauchy_c = opts.robust.param if opts.robust.kind == "cauchy" else 0.0
    fm = mask.astype(jnp.float32)

    def sums_at(state):
        hits = lie.se2_apply(state, points_xy)
        mi, mu = geo.w2m_frac(hits)
        loc = mi - jnp.asarray(org_cell, jnp.int32)
        return match_eval.gn_eval_sq(
            grid, loc[..., 1], loc[..., 0], mu[..., 0], mu[..., 1],
            hits[..., 0], hits[..., 1], fm,
            max_dist=max_dist, res=geo.resolution, scale=geo.scale,
            cauchy_c=cauchy_c)

    # Like nlls_solver.solve, the carry holds the evaluation (the 10 sums)
    # at the current state so each iteration runs exactly one fused eval —
    # the tentative step's — instead of re-evaluating the carried state.
    s0 = jnp.stack(sums_at(state0))

    def cond(c):
        state, s, stop, it = c
        return jnp.logical_and(~stop, it < opts.max_iterations)

    def body(c):
        state, s, _, it = c
        A = jnp.stack([jnp.stack([s[0], s[1], s[2]]),
                       jnp.stack([s[1], s[3], s[4]]),
                       jnp.stack([s[2], s[4], s[5]])])
        g = jnp.stack([s[6], s[7], s[8]])
        chi2 = s[9]
        stop_g = jnp.max(jnp.abs(g)) < opts.eps1
        h = nlls_solver._solve3(A, g)
        h = jnp.where(stop_g, jnp.zeros_like(h), h)
        stop_h = jnp.max(jnp.abs(h)) < opts.eps2
        stop_now = jnp.logical_or(stop_g, stop_h)

        def converged(_):
            return (state, s, jnp.bool_(True), it)

        def take_step(_):
            new_state = update_state(state, h)
            ns = jnp.stack(sums_at(new_state))
            ok = (chi2 - ns[9]) > 0.0
            st = jnp.where(ok, new_state, state)
            return (st, jnp.where(ok, ns, s), ~ok, it + 1)

        return jax.lax.cond(stop_now, converged, take_step, None)

    # IRIS_MATCH_UNROLL=k (trace-time, like solver._irls_mode): chain k
    # cond-guarded IRLS steps per while trip. Semantics are EXACTLY k
    # while-loop trips (each sub-step re-checks `cond` before running, so
    # a mid-chain stop leaves the carry untouched); what changes is the
    # per-trip loop overhead count — the r5 budget puts the office Slam2D
    # wall in the fused-eval while body's launch-to-launch latency
    # (~0.9 ms/scan at median 3 iterations vs 0.37 converged,
    # docs/BUDGET.md). Default 1 = the plain loop.
    k = int(os.environ.get("IRIS_MATCH_UNROLL", "1"))
    if k > 1:
        def body_k(c):
            c = body(c)
            for _ in range(k - 1):
                c = jax.lax.cond(cond(c), body, lambda x: x, c)
            return c
        loop_body = body_k
    else:
        loop_body = body
    final = jax.lax.while_loop(
        cond, loop_body, (state0, s0, jnp.bool_(False), jnp.int32(0)))
    state, s, _, it = final
    zero = jnp.float32(0)
    return nlls_solver.SolveResult(state=state, iterations=it, chi2=s[9],
                                   r=zero, J=zero)


def solve_window_lik(grid, org_cell, geo, max_dist, points_xy, mask,
                     state0, opts, batch_hint: int = 1):
    """solve_window + the unweighted masked residual SSE at the final
    state (PFSlam2D's likelihood input, pf_slam2d.cpp:393-414).

    On the whole-solve kernel paths the SSE comes out of the same launch
    (ops/gn_batch.py / ops/gn_solve.py want_lik) — no separate
    interpolation pass. ``batch_hint``: the caller's vmap batch size
    (particle count); >1 selects the batched whole-solve kernel when the
    batch's grids fit VMEM (ops/gn_batch.py).
    """
    # no VMEM guard here: gn_batch chunks over VMEM-sized particle groups
    # internally (gn_batch.group_size), so any batch size is admissible
    if (opts.strategy == "gn" and grid.dtype == jnp.int8
            and opts.robust.kind in ("cauchy", "unit")
            and gn_batch.ENABLED and batch_hint > 1
            and jax.default_backend() == "tpu"):
        cauchy_c = (opts.robust.param if opts.robust.kind == "cauchy"
                    else 0.0)
        st, it, chi2, sum_d2 = gn_batch.solve_window_sq(
            grid, jnp.asarray(org_cell, jnp.int32), state0,
            points_xy, mask, max_dist=max_dist, res=geo.resolution,
            scale=geo.scale, cell_offset=geo.cell_offset,
            cauchy_c=cauchy_c, eps1=opts.eps1, eps2=opts.eps2,
            max_iter=opts.max_iterations, want_lik=True)
        zero = jnp.float32(0)
        return nlls_solver.SolveResult(state=st, iterations=it, chi2=chi2,
                                       r=zero, J=zero), sum_d2
    if (opts.strategy == "gn" and grid.dtype == jnp.int8
            and opts.robust.kind in ("cauchy", "unit")
            and gn_solve.ENABLED and jax.default_backend() == "tpu"):
        cauchy_c = (opts.robust.param if opts.robust.kind == "cauchy"
                    else 0.0)
        st, it, chi2, sum_d2 = gn_solve.solve_window_sq(
            grid, jnp.asarray(org_cell, jnp.int32), state0,
            points_xy, mask, max_dist=max_dist, res=geo.resolution,
            scale=geo.scale, cell_offset=geo.cell_offset,
            cauchy_c=cauchy_c, eps1=opts.eps1, eps2=opts.eps2,
            max_iter=opts.max_iterations, want_lik=True)
        zero = jnp.float32(0)
        return nlls_solver.SolveResult(state=st, iterations=it, chi2=chi2,
                                       r=zero, J=zero), sum_d2
    res = solve_window(grid, org_cell, geo, max_dist, points_xy, mask,
                       state0, opts)
    hits = lie.se2_apply(res.state, points_xy)
    d, _ = dist_mod.interp_window(grid, org_cell, geo, hits, max_dist)
    d = d * mask.astype(jnp.float32)
    return res, jnp.sum(d * d)


def solve_pool(table, dist, geo, max_dist, points_xy, mask,
               state0, opts) -> nlls_solver.SolveResult:
    """Scan-match straight against the pool (Loc2D with loaded maps)."""
    eval_fn = make_pool_eval(table, dist, geo, max_dist, points_xy, mask)
    return nlls_solver.solve(eval_fn, update_state, state0, opts)

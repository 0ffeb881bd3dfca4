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

import jax.numpy as jnp

from ..core import lie
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
    """Scan-match against a dense window (Slam2D/PFSlam2D hot path)."""
    eval_fn = make_window_eval(grid, org_cell, geo, max_dist, points_xy, mask)
    return nlls_solver.solve(eval_fn, update_state, state0, opts)


def solve_pool(table, dist, geo, max_dist, points_xy, mask,
               state0, opts) -> nlls_solver.SolveResult:
    """Scan-match straight against the pool (Loc2D with loaded maps)."""
    eval_fn = make_pool_eval(table, dist, geo, max_dist, points_xy, mask)
    return nlls_solver.solve(eval_fn, update_state, state0, opts)

"""ops/gn_solve: the whole-solve GN kernel vs nlls_solver.solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.core import lie
from iris_lama_tpu.match import match_surface_2d as match
from iris_lama_tpu.nlls import solver as nlls_solver
from iris_lama_tpu.nlls.robust import CAUCHY_SCAN
from iris_lama_tpu.ops import gn_solve
from iris_lama_tpu.sdm import distance as dist_mod
from iris_lama_tpu.sdm.geometry import MapGeometry

GEO = MapGeometry(0.1, 4, False)
H = W = 96
MAXD = 0.5
# window origin == cell_offset so world [0,9.6)^2 maps onto the
# 96x96 grid (loc = floor(w*scale)+cell_offset-ORG in [0,96))
ORG = jnp.asarray([MapGeometry(0.1, 4, False).cell_offset] * 2,
                  jnp.int32)
OPTS = nlls_solver.SolverOptions(max_iterations=40, strategy="gn",
                                 robust=CAUCHY_SCAN)


def _world(rng, b):
    """Structured world: scan points ON obstacle surfaces, so a perturbed
    start pose makes the solver actually iterate back (several GN steps),
    exercising the loop body, step-revert and stop logic."""
    obst = np.zeros((H, W), bool)
    obst[20, 10:80] = True       # wall y=20
    obst[20:80, 75] = True       # wall x=75
    extra = rng.integers(15, 80, (10, 2))
    obst[extra[:, 0], extra[:, 1]] = True
    ys, xs = np.nonzero(obst)
    yy, xx = np.mgrid[0:H, 0:W]
    d2 = ((yy[..., None] - ys) ** 2 + (xx[..., None] - xs) ** 2).min(-1)
    grid = np.minimum(d2, 25).astype(np.int8)
    # beams sample the obstacle cells (world coords of cell centers,
    # org offset included: world = (cell - ORG) * res)
    k = rng.integers(0, len(ys), b)
    pts = np.stack([(xs[k] + 0.5) * 0.1, (ys[k] + 0.5) * 0.1],
                   -1).astype(np.float32)
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
    mask = (rng.uniform(size=b) < 0.9)
    return jnp.asarray(grid), jnp.asarray(pts), jnp.asarray(mask)


def _kernel_solve(grid, pts, mask, state0, want_lik=False):
    return gn_solve.solve_window_sq(
        grid, ORG, state0, pts, mask, max_dist=MAXD, res=GEO.resolution,
        scale=GEO.scale, cell_offset=GEO.cell_offset,
        cauchy_c=OPTS.robust.param, eps1=OPTS.eps1, eps2=OPTS.eps2,
        max_iter=OPTS.max_iterations, want_lik=want_lik, impl="interpret")


def _ref_solve(grid, pts, mask, state0):
    meters = jnp.sqrt(grid.astype(jnp.float32)) * jnp.float32(GEO.resolution)
    return match.solve_window(meters, ORG, GEO, MAXD, pts, mask, state0,
                              OPTS)


@pytest.mark.parametrize("seed", [0, 3])
def test_kernel_solve_matches_generic(seed):
    rng = np.random.default_rng(seed)
    grid, pts, mask = _world(rng, 200)
    state0 = jnp.asarray([0.25, -0.15, np.cos(0.05), np.sin(0.05)],
                         jnp.float32)
    st, it, chi2, _ = _kernel_solve(grid, pts, mask, state0)
    ref = _ref_solve(grid, pts, mask, state0)
    # the structured world must actually drive the loop (a window origin
    # that misses the grid degenerates to 0 iterations — seen once)
    assert int(ref.iterations) >= 3
    np.testing.assert_allclose(np.asarray(st), np.asarray(ref.state),
                               rtol=1e-4, atol=1e-5)
    assert int(it) == int(ref.iterations)
    np.testing.assert_allclose(float(chi2), float(ref.chi2),
                               rtol=1e-4, atol=1e-6)


def test_kernel_solve_vmapped():
    rng = np.random.default_rng(1)
    grid, pts, mask = _world(rng, 170)
    grids = jnp.stack([grid, jnp.clip(grid + 1, 0, 25)])
    states = jnp.asarray([[0.25, -0.15, np.cos(0.05), np.sin(0.05)],
                          [-0.1, 0.2, np.cos(-0.08), np.sin(-0.08)]],
                         jnp.float32)

    def kern(g, st):
        return _kernel_solve(g, pts, mask, st)

    sts, its, chi2s, _ = jax.vmap(kern)(grids, states)
    for k in range(2):
        ref = _ref_solve(grids[k], pts, mask, states[k])
        np.testing.assert_allclose(np.asarray(sts[k]), np.asarray(ref.state),
                                   rtol=1e-4, atol=1e-5)
        assert int(its[k]) == int(ref.iterations)


def test_kernel_likelihood_sum():
    """want_lik returns the unweighted masked SSE at the final state —
    exactly what pf_slam2d's likelihood computes via interp_window."""
    rng = np.random.default_rng(2)
    grid, pts, mask = _world(rng, 150)
    state0 = jnp.asarray([0.1, 0.05, 1.0, 0.0], jnp.float32)
    st, _, _, sum_d2 = _kernel_solve(grid, pts, mask, state0, want_lik=True)
    hits = lie.se2_apply(st, pts)
    d, _ = dist_mod.interp_window(grid, ORG, GEO, hits, MAXD)
    d = d * mask.astype(jnp.float32)
    np.testing.assert_allclose(float(sum_d2), float(jnp.sum(d * d)),
                               rtol=1e-5, atol=1e-6)

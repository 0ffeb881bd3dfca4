"""ops/match_eval: fused GN sums vs the jnp eval path, and the fused
solve loop vs nlls_solver.solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.core import lie
from iris_lama_tpu.match import match_surface_2d as match
from iris_lama_tpu.nlls import solver as nlls_solver
from iris_lama_tpu.nlls.robust import CAUCHY_SCAN
from iris_lama_tpu.ops import match_eval as me
from iris_lama_tpu.sdm.geometry import MapGeometry

GEO = MapGeometry(0.1, 4, False)
H = W = 96
MAXD = 0.5
# origin == cell_offset so world [0,9.6)^2 lands on the grid (an origin
# that misses the window makes every corner read max_dist and the solves
# trivial — the original [-40,-40] did exactly that)
ORG0 = MapGeometry(0.1, 4, False).cell_offset


def _world(rng, b):
    # walls + clutter; beams on obstacle surfaces so solves iterate
    obst = np.zeros((H, W), bool)
    obst[20, 10:80] = True
    obst[20:80, 75] = True
    extra = rng.integers(15, 80, (10, 2))
    obst[extra[:, 0], extra[:, 1]] = True
    ys, xs = np.nonzero(obst)
    yy, xx = np.mgrid[0:H, 0:W]
    d2 = ((yy[..., None] - ys) ** 2 + (xx[..., None] - xs) ** 2).min(-1)
    grid = np.minimum(d2, 25).astype(np.int8)
    k = rng.integers(0, len(ys), b)
    pts = np.stack([(xs[k] + 0.5) * 0.1, (ys[k] + 0.5) * 0.1],
                   -1).astype(np.float32)
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
    mask = (rng.uniform(size=b) < 0.9)
    return jnp.asarray(grid), jnp.asarray(pts), jnp.asarray(mask)


def _sums_args(grid, pts, mask, state, org):
    hits = lie.se2_apply(state, pts)
    mi, mu = GEO.w2m_frac(hits)
    loc = mi - org
    fm = mask.astype(jnp.float32)
    return (grid, loc[..., 1], loc[..., 0], mu[..., 0], mu[..., 1],
            hits[..., 0], hits[..., 1], fm)


@pytest.mark.parametrize("impl", ["interpret"])
def test_kernel_sums_match_jnp(impl):
    rng = np.random.default_rng(0)
    grid, pts, mask = _world(rng, 170)
    state = jnp.asarray([0.3, -0.2, np.cos(0.1), np.sin(0.1)], jnp.float32)
    org = jnp.asarray([ORG0, ORG0], jnp.int32)
    args = _sums_args(grid, pts, mask, state, org)
    kw = dict(max_dist=MAXD, res=GEO.resolution, scale=GEO.scale,
              cauchy_c=0.15)
    ref = me.gn_eval_sq(*args, **kw, impl="jnp")
    out = me.gn_eval_sq(*args, **kw, impl=impl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_kernel_sums_vmapped():
    rng = np.random.default_rng(1)
    grid, pts, mask = _world(rng, 130)
    states = jnp.asarray(
        [[0.3, -0.2, 1.0, 0.0], [0.1, 0.4, np.cos(0.2), np.sin(0.2)],
         [-0.2, 0.0, np.cos(-0.1), np.sin(-0.1)]], jnp.float32)
    org = jnp.asarray([ORG0, ORG0], jnp.int32)
    kw = dict(max_dist=MAXD, res=GEO.resolution, scale=GEO.scale,
              cauchy_c=0.15)

    def one(impl):
        def f(st):
            return me.gn_eval_sq(*_sums_args(grid, pts, mask, st, org),
                                 **kw, impl=impl)
        return jax.vmap(f)(states)

    np.testing.assert_allclose(np.asarray(one("interpret")),
                               np.asarray(one("jnp")),
                               rtol=1e-5, atol=1e-4)


def test_fused_solve_matches_generic():
    """The fused GN loop (jnp eval path) vs nlls_solver.solve."""
    rng = np.random.default_rng(2)
    grid, pts, mask = _world(rng, 200)
    org = jnp.asarray([ORG0, ORG0], jnp.int32)
    state0 = jnp.asarray([0.25, -0.15, np.cos(0.05), np.sin(0.05)],
                         jnp.float32)
    opts = nlls_solver.SolverOptions(max_iterations=40, strategy="gn",
                                     robust=CAUCHY_SCAN)
    meters = jnp.sqrt(grid.astype(jnp.float32)) * jnp.float32(GEO.resolution)
    ref = match.solve_window(meters, org, GEO, MAXD, pts, mask, state0, opts)
    out = match._solve_window_fused(grid, org, GEO, MAXD, pts, mask,
                                    state0, opts)
    np.testing.assert_allclose(np.asarray(out.state), np.asarray(ref.state),
                               rtol=1e-4, atol=1e-5)
    assert int(out.iterations) == int(ref.iterations)
    np.testing.assert_allclose(float(out.chi2), float(ref.chi2),
                               rtol=1e-4, atol=1e-6)


def test_fused_solve_unroll_identical(monkeypatch):
    """IRIS_MATCH_UNROLL=k is bit-identical to the plain fused loop (the
    k-chain re-checks `cond` before every sub-step, so semantics are
    exactly k while trips)."""
    rng = np.random.default_rng(3)
    grid, pts, mask = _world(rng, 200)
    org = jnp.asarray([ORG0, ORG0], jnp.int32)
    state0 = jnp.asarray([0.25, -0.15, np.cos(0.05), np.sin(0.05)],
                         jnp.float32)
    opts = nlls_solver.SolverOptions(max_iterations=40, strategy="gn",
                                     robust=CAUCHY_SCAN)
    base = match._solve_window_fused(grid, org, GEO, MAXD, pts, mask,
                                     state0, opts)
    assert int(base.iterations) >= 2
    for k in ("2", "3", "4"):
        monkeypatch.setenv("IRIS_MATCH_UNROLL", k)
        out = match._solve_window_fused(grid, org, GEO, MAXD, pts, mask,
                                        state0, opts)
        np.testing.assert_array_equal(np.asarray(out.state),
                                      np.asarray(base.state))
        assert int(out.iterations) == int(base.iterations)
        np.testing.assert_array_equal(np.asarray(out.chi2),
                                      np.asarray(base.chi2))

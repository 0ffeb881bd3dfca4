"""ops/gn_batch: the batched whole-solve GN kernel vs nlls_solver.solve.

Same oracle setup as tests/test_gn_solve.py; the batched kernel must
reproduce the generic IRLS solver's state/iterations/chi2 for every
particle of a vmapped batch in one launch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.core import lie
from iris_lama_tpu.match import match_surface_2d as match
from iris_lama_tpu.nlls import solver as nlls_solver
from iris_lama_tpu.nlls.robust import CAUCHY_SCAN
from iris_lama_tpu.ops import gn_batch
from iris_lama_tpu.sdm import distance as dist_mod
from iris_lama_tpu.sdm.geometry import MapGeometry

GEO = MapGeometry(0.1, 4, False)
H = W = 96
MAXD = 0.5
ORG = jnp.asarray([GEO.cell_offset] * 2, jnp.int32)
OPTS = nlls_solver.SolverOptions(max_iterations=40, strategy="gn",
                                 robust=CAUCHY_SCAN)


def _world(rng, b):
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


def _kernel_solve(grid, org, pts, mask, state0, want_lik=False):
    return gn_batch.solve_window_sq(
        grid, org, state0, pts, mask, max_dist=MAXD, res=GEO.resolution,
        scale=GEO.scale, cell_offset=GEO.cell_offset,
        cauchy_c=OPTS.robust.param, eps1=OPTS.eps1, eps2=OPTS.eps2,
        max_iter=OPTS.max_iterations, want_lik=want_lik, impl="interpret")


def _ref_solve(grid, pts, mask, state0):
    meters = jnp.sqrt(grid.astype(jnp.float32)) * jnp.float32(GEO.resolution)
    return match.solve_window(meters, ORG, GEO, MAXD, pts, mask, state0,
                              OPTS)


def test_batched_matches_generic():
    """Three particles with different grids/poses, one launch."""
    rng = np.random.default_rng(0)
    grid, pts, mask = _world(rng, 200)
    grids = jnp.stack([grid, jnp.clip(grid + 1, 0, 25),
                       jnp.clip(grid + 2, 0, 25)])
    states = jnp.asarray([[0.25, -0.15, np.cos(0.05), np.sin(0.05)],
                          [-0.1, 0.2, np.cos(-0.08), np.sin(-0.08)],
                          [0.05, 0.1, 1.0, 0.0]], jnp.float32)
    orgs = jnp.broadcast_to(ORG, (3, 2))

    def kern(g, o, st):
        return _kernel_solve(g, o, pts, mask, st, want_lik=True)

    sts, its, chi2s, sses = jax.vmap(kern)(grids, orgs, states)
    n_iter_total = 0
    for k in range(3):
        ref = _ref_solve(grids[k], pts, mask, states[k])
        n_iter_total += int(ref.iterations)
        np.testing.assert_allclose(np.asarray(sts[k]), np.asarray(ref.state),
                                   rtol=1e-4, atol=1e-5)
        assert int(its[k]) == int(ref.iterations)
        np.testing.assert_allclose(float(chi2s[k]), float(ref.chi2),
                                   rtol=1e-4, atol=1e-6)
        # likelihood SSE at the final state
        hits = lie.se2_apply(sts[k], pts)
        d, _ = dist_mod.interp_window(grids[k], ORG, GEO, hits, MAXD)
        d = d * mask.astype(jnp.float32)
        np.testing.assert_allclose(float(sses[k]), float(jnp.sum(d * d)),
                                   rtol=1e-4, atol=1e-5)
    # the structured world must actually drive the loop
    assert n_iter_total >= 6


def test_unbatched_single_particle():
    rng = np.random.default_rng(3)
    grid, pts, mask = _world(rng, 150)
    state0 = jnp.asarray([0.25, -0.15, np.cos(0.05), np.sin(0.05)],
                         jnp.float32)
    st, it, chi2, _ = _kernel_solve(grid, ORG, pts, mask, state0)
    ref = _ref_solve(grid, pts, mask, state0)
    assert int(ref.iterations) >= 3
    np.testing.assert_allclose(np.asarray(st), np.asarray(ref.state),
                               rtol=1e-4, atol=1e-5)
    assert int(it) == int(ref.iterations)


def test_chunked_groups_match_single_launch(monkeypatch):
    """Batches beyond the VMEM budget chunk over particle groups
    (VERDICT r4 #1: the 512-particle path). A tiny forced budget makes
    the 3-particle batch run as 2 sequential launches (group size 2 +
    padded remainder); results must equal the unchunked launch exactly."""
    rng = np.random.default_rng(11)
    grid, pts, mask = _world(rng, 200)
    grids = jnp.stack([grid, jnp.clip(grid + 1, 0, 25),
                       jnp.clip(grid + 2, 0, 25)])
    states = jnp.asarray([[0.25, -0.15, np.cos(0.05), np.sin(0.05)],
                          [-0.1, 0.2, np.cos(-0.08), np.sin(-0.08)],
                          [0.05, 0.1, 1.0, 0.0]], jnp.float32)
    orgs = jnp.broadcast_to(ORG, (3, 2))
    # pin the env-tunable kernel knobs BEFORE the reference launch: the
    # chunk-vs-single comparison must run one kernel variant
    monkeypatch.setattr(gn_batch, "BSPLIT", 1)
    monkeypatch.setattr(gn_batch, "WAYS", 2)

    def kern(g, o, st):
        return _kernel_solve(g, o, pts, mask, st, want_lik=True)

    ref = jax.vmap(kern)(grids, orgs, states)
    # transient for this shape is ~311 KB; budget 340 KB => group size 2
    monkeypatch.setattr(gn_batch, "VMEM_BUDGET_BYTES", 340_000)
    assert gn_batch.group_size(H, W, pts.shape[0]) == 2
    chunked = jax.vmap(kern)(grids, orgs, states)
    for a, b in zip(ref, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_matches_gn_solve_kernel():
    """gn_batch and gn_solve implement the same contract — interpret-mode
    results must agree to float tolerance on a multi-iteration solve."""
    from iris_lama_tpu.ops import gn_solve
    rng = np.random.default_rng(7)
    grid, pts, mask = _world(rng, 170)
    grids = jnp.stack([grid, jnp.clip(grid + 3, 0, 25)])
    states = jnp.asarray([[0.2, -0.1, np.cos(0.03), np.sin(0.03)],
                          [-0.15, 0.1, np.cos(-0.06), np.sin(-0.06)]],
                         jnp.float32)
    orgs = jnp.broadcast_to(ORG, (2, 2))

    kw = dict(max_dist=MAXD, res=GEO.resolution, scale=GEO.scale,
              cell_offset=GEO.cell_offset, cauchy_c=OPTS.robust.param,
              eps1=OPTS.eps1, eps2=OPTS.eps2,
              max_iter=OPTS.max_iterations, want_lik=True,
              impl="interpret")
    b_st, b_it, b_chi, b_sse = jax.vmap(
        lambda g, o, st: gn_batch.solve_window_sq(g, o, st, pts, mask,
                                                  **kw))(grids, orgs, states)
    s_st, s_it, s_chi, s_sse = jax.vmap(
        lambda g, o, st: gn_solve.solve_window_sq(g, o, st, pts, mask,
                                                  **kw))(grids, orgs, states)
    np.testing.assert_allclose(np.asarray(b_st), np.asarray(s_st),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(b_it), np.asarray(s_it))
    np.testing.assert_allclose(np.asarray(b_chi), np.asarray(s_chi),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_sse), np.asarray(s_sse),
                               rtol=1e-5, atol=1e-6)

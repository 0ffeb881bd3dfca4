"""Solver + scan-matcher tests.

Oracles: linear least squares closed form; pose recovery on a map built from
a known scan (the scan-match convergence property the whole pipeline relies
on, reference src/nlls/gauss_newton.cpp + src/match_surface_2d.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.core import lie
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.match import match_surface_2d as match
from iris_lama_tpu.nlls import solver as nlls
from iris_lama_tpu.nlls.robust import RobustCost, UNIT, CAUCHY_SCAN
from iris_lama_tpu.sdm import mapping, window as win_mod
from iris_lama_tpu.sdm.geometry import MapGeometry

rng = np.random.default_rng(5)


def test_linear_problem_gn_one_step():
    # r(x) = A @ x - b with state abused as a plain 3-vector
    A = np.array([[2.0, 0.1, 0.0], [0.0, 1.5, 0.2], [0.3, 0.0, 1.0],
                  [0.5, 0.5, 0.5]], np.float32)
    b = np.array([1.0, -2.0, 0.5, 0.3], np.float32)
    x_star = np.linalg.lstsq(A, b, rcond=None)[0]

    def eval_fn(x):
        return jnp.asarray(A) @ x - jnp.asarray(b), jnp.asarray(A)

    def update_fn(x, h):
        return x + h

    res = nlls.solve(eval_fn, update_fn, jnp.zeros(3),
                     nlls.SolverOptions(max_iterations=10, strategy="gn",
                                        robust=UNIT))
    np.testing.assert_allclose(np.asarray(res.state), x_star, atol=1e-4)


def test_linear_problem_lm_converges():
    A = np.array([[2.0, 0.1, 0.0], [0.0, 1.5, 0.2], [0.3, 0.0, 1.0],
                  [0.5, 0.5, 0.5]], np.float32)
    b = np.array([1.0, -2.0, 0.5, 0.3], np.float32)
    x_star = np.linalg.lstsq(A, b, rcond=None)[0]

    def eval_fn(x):
        return jnp.asarray(A) @ x - jnp.asarray(b), jnp.asarray(A)

    res = nlls.solve(eval_fn, lambda x, h: x + h, jnp.zeros(3),
                     nlls.SolverOptions(max_iterations=50, strategy="lm",
                                        robust=UNIT))
    np.testing.assert_allclose(np.asarray(res.state), x_star, atol=1e-3)


def test_robust_weights_match_reference_formulas():
    x = np.linspace(-3, 3, 31).astype(np.float32)
    # cauchy
    c = RobustCost("cauchy", 0.15)
    np.testing.assert_allclose(np.asarray(c.weight(x)),
                               1.0 / (1.0 + x * x / 0.15 ** 2), rtol=1e-5)
    # tukey
    t = RobustCost("tukey", 2.0)
    w = np.where(x * x <= 4.0, (1 - x * x / 4.0) ** 2, 0.0)
    np.testing.assert_allclose(np.asarray(t.weight(x)), w, rtol=1e-5)
    # huber: w = 1 if x < k else k/|x|  (note: signed compare like the ref)
    h = RobustCost("huber", 1.0)
    wh = np.where(x < 1.0, 1.0, 1.0 / np.abs(x))
    np.testing.assert_allclose(np.asarray(h.weight(x)), wh, rtol=1e-5)
    # tstudent
    s = RobustCost("tstudent", 3.0)
    np.testing.assert_allclose(np.asarray(s.weight(x)),
                               4.0 / (3.0 + x * x), rtol=1e-5)


def _build_map_from_scan(cfg, pose_xyr, pts):
    state = mapping.slam_map_init(cfg)
    pose = lie.se2(*pose_xyr)
    mask = jnp.ones(len(pts), bool)
    state, _ = mapping.update_maps(state, cfg, pose, jnp.asarray(pts), mask,
                                   jnp.zeros(3))
    return state


def _ring_scan(n=180, r=4.0):
    ang = np.linspace(-np.pi, np.pi, n, endpoint=False)
    radii = r * (0.7 + 0.3 * np.cos(3 * ang) ** 2)
    return np.stack([radii * np.cos(ang), radii * np.sin(ang),
                     np.zeros(n)], -1).astype(np.float32)


def test_scan_match_recovers_pose():
    geo = MapGeometry(resolution=0.05, log2dim=5)
    cfg = mapping.MappingConfig(geometry=geo, l2_max=0.5, max_range=6.0,
                                capacity=1024)
    pts = _ring_scan()
    state = _build_map_from_scan(cfg, (0.0, 0.0, 0.0), pts)

    # initial guess offset from the truth; GN should pull it back
    true_pose = np.array([0.0, 0.0, 0.0])
    for guess in ([0.15, -0.1, 0.05], [-0.2, 0.1, -0.08], [0.1, 0.2, 0.0]):
        pose0 = lie.se2(*guess)
        org = win_mod.window_org(geo, geo.w2m(pose0[:2]), cfg.window_patches)
        keys = win_mod.window_patch_keys(geo, org, cfg.window_patches)
        grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                        cfg.distance.max_dist)
        res = match.solve_window(
            grid, org, geo, cfg.distance.max_dist, jnp.asarray(pts[:, :2]),
            jnp.ones(len(pts), bool), pose0,
            nlls.SolverOptions(100, "gn", CAUCHY_SCAN))
        got = Pose2D.from_se2_array(np.asarray(res.state))
        err = np.linalg.norm(got.xy() - true_pose[:2])
        assert err < 0.03, (guess, got.xyr(), err)
        assert abs(got.rotation() - true_pose[2]) < 0.02


def test_scan_match_vmapped_hypotheses():
    geo = MapGeometry(resolution=0.05, log2dim=5)
    cfg = mapping.MappingConfig(geometry=geo, l2_max=0.5, max_range=6.0,
                                capacity=1024)
    pts = _ring_scan()
    state = _build_map_from_scan(cfg, (0.0, 0.0, 0.0), pts)

    org = win_mod.window_org(geo, geo.w2m(jnp.zeros(2)), cfg.window_patches)
    keys = win_mod.window_patch_keys(geo, org, cfg.window_patches)
    grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                    cfg.distance.max_dist)

    guesses = jnp.asarray(np.array([[0.1, -0.1, 0.04], [-0.15, 0.05, -0.03],
                                    [0.0, 0.18, 0.06]], np.float32))
    pose0 = jax.vmap(lambda g: lie.se2(g[0], g[1], g[2]))(guesses)
    solve = jax.vmap(lambda p0: match.solve_window(
        grid, org, geo, cfg.distance.max_dist, jnp.asarray(pts[:, :2]),
        jnp.ones(len(pts), bool), p0,
        nlls.SolverOptions(60, "gn", CAUCHY_SCAN)).state)
    states = np.asarray(solve(pose0))
    for s in states:
        p = Pose2D.from_se2_array(s)
        assert np.linalg.norm(p.xy()) < 0.03
        assert abs(p.rotation()) < 0.02


def test_covariance_full_rank():
    A = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 2.0],
                  [1.0, 1.0, 0.0]], np.float32)
    b = np.zeros(4, np.float32)

    def eval_fn(x):
        return jnp.asarray(A) @ x - jnp.asarray(b), jnp.asarray(A)

    cov = np.asarray(nlls.covariance(eval_fn, UNIT, jnp.zeros(3)))
    np.testing.assert_allclose(cov, np.linalg.inv(A.T @ A), atol=1e-5)


def test_window_and_pool_paths_agree():
    """The dense-window and pool interp paths produce matching solves."""
    geo = MapGeometry(resolution=0.05, log2dim=5)
    cfg = mapping.MappingConfig(geometry=geo, l2_max=0.5, max_range=6.0,
                                capacity=1024)
    pts = _ring_scan()
    state = _build_map_from_scan(cfg, (0.0, 0.0, 0.0), pts)

    guess = lie.se2(0.12, -0.08, 0.04)
    opts = nlls.SolverOptions(60, "gn", CAUCHY_SCAN)

    org = win_mod.window_org(geo, geo.w2m(guess[:2]), cfg.window_patches)
    keys = win_mod.window_patch_keys(geo, org, cfg.window_patches)
    grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                    cfg.distance.max_dist)
    res_w = match.solve_window(grid, org, geo, cfg.distance.max_dist,
                               jnp.asarray(pts[:, :2]),
                               jnp.ones(len(pts), bool), guess, opts)
    res_p = match.solve_pool(state.table, state.dist, geo,
                             cfg.distance.max_dist, jnp.asarray(pts[:, :2]),
                             jnp.ones(len(pts), bool), guess, opts)
    pw = Pose2D.from_se2_array(np.asarray(res_w.state))
    pp = Pose2D.from_se2_array(np.asarray(res_p.state))
    assert np.linalg.norm(pw.xy() - pp.xy()) < 2e-3
    assert abs(pw.rotation() - pp.rotation()) < 2e-3


def test_covariance_svd_fallback_rank_deficient():
    # J with an all-zero column: rank 2 -> reference SVD fallback
    # (solver.cpp:143-149: sv^2 inverse where |sv| > 1e-3, else 3.0)
    A = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0], [1.0, 1.0, 0.0],
                  [0.5, 0.0, 0.0]], np.float32)

    def eval_fn(x):
        return jnp.asarray(A) @ x, jnp.asarray(A)

    cov = np.asarray(nlls.covariance(eval_fn, UNIT, jnp.zeros(3)))
    _, s, vt = np.linalg.svd(A, full_matrices=False)
    keep = np.abs(s) > 1e-3
    s_inv2 = np.where(keep, 1.0 / np.where(keep, s * s, 1.0), 3.0)
    expect = (vt.T * s_inv2[None, :]) @ vt
    np.testing.assert_allclose(cov, expect, atol=1e-4)


def test_irls_modes_identical(monkeypatch):
    """The three IRIS_IRLS_MODE loop structures produce bit-identical
    SolveResults (ADVICE r2: the A/B levers need a regression guard).

    Uses a genuinely nonlinear problem (several IRLS iterations, Cauchy
    reweighting) solved fresh per mode — the mode is read at trace time,
    so each solve is traced without jit caching in between.
    """
    local = np.random.default_rng(5)   # own stream: test-order independent
    A = local.normal(size=(24, 3)).astype(np.float32)
    b = (0.5 * local.normal(size=(24,))).astype(np.float32)

    def eval_fn(x):
        # nonlinear residual: quadratic warp keeps GN iterating a while
        z = jnp.asarray(A) @ x
        r = z + 0.5 * z ** 2 - jnp.asarray(b)
        J = jnp.asarray(A) * (1.0 + z)[:, None]
        return r, J

    def run(mode, strategy):
        monkeypatch.setenv("IRIS_IRLS_MODE", mode)
        return nlls.solve(
            eval_fn, lambda x, h: x + h, jnp.zeros(3),
            nlls.SolverOptions(max_iterations=25, strategy=strategy,
                               robust=CAUCHY_SCAN))

    for strategy in ("gn", "lm"):
        base = run("while", strategy)
        for mode in ("scan", "unroll2", "unroll4"):
            other = run(mode, strategy)
            np.testing.assert_array_equal(np.asarray(base.state),
                                          np.asarray(other.state))
            np.testing.assert_array_equal(np.asarray(base.chi2),
                                          np.asarray(other.chi2))
            assert int(base.iterations) == int(other.iterations), \
                (strategy, mode)
        assert int(base.iterations) >= 2   # the problem must actually iterate

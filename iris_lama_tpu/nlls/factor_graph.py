"""Batched SE(2) factor-graph optimization (the vendored-minisam replacement).

reference: vendor/minisam — FactorGraph + PriorFactor/BetweenFactor over
Sophus SE2 (minisam/slam/BetweenFactor.h:50-59, minisam/geometry/Sophus.h),
sparse linearization with cached sparsity patterns, and a Levenberg-Marquardt
optimizer over sparse Cholesky (minisam/linear/SparseCholesky.h:14-36).
Used by SimplePGO (src/simple_pgo.cpp:48-105) and GraphSlam2D
(src/graph_slam2d.cpp:394-430).

TPU-native design — no sparse matrices, no AMD orderings:
* factors are dense arrays (padded, masked); residuals AND Jacobians come
  from `vmap` + `jacfwd` of the tangent-space residual (exact, no
  hand-derived Jacobians to get wrong);
* the Gauss-Newton Hessian is assembled by scatter-adding 3x3 blocks into a
  dense [3N, 3N] matrix — at SLAM-scale key-pose counts (hundreds to a few
  thousand) a dense Cholesky on the MXU beats sparse pointer-chasing;
* the LM loop is a `lax.while_loop`; retraction is x <- x * exp(delta)
  (minisam's Sophus manifold convention).

Losses: diagonal sigmas scale residual rows (DiagonalLoss::Sigmas); Huber
on the residual norm for loop-closure factors (sam::HuberLoss::Huber(0.1),
graph_slam2d.cpp:266).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie


class SE2Graph(NamedTuple):
    """Padded factor arrays. All "idx" entries of padding rows are 0 with
    mask False."""

    # prior factors: r = w * log(meas^-1 * x_i)
    prior_idx: jax.Array        # int32[Np]
    prior_meas: jax.Array       # f32[Np, 4] SE(2)
    prior_w: jax.Array          # f32[Np, 3] (1/sigma per dim)
    prior_mask: jax.Array       # bool[Np]
    # between factors: r = w * log(meas^-1 * (x_i^-1 * x_j))
    bet_i: jax.Array            # int32[Nb]
    bet_j: jax.Array            # int32[Nb]
    bet_meas: jax.Array         # f32[Nb, 4]
    bet_w: jax.Array            # f32[Nb, 3]
    bet_huber: jax.Array        # f32[Nb] — Huber k on ||r||; 0 = none
    bet_mask: jax.Array         # bool[Nb]


@dataclasses.dataclass(frozen=True)
class PGOOptions:
    """Optimizer knobs (minisam *OptimizerParams defaults).

    strategy: "lm" (LevenbergMarquardtOptimizer), "gn"
    (GaussNewtonOptimizer — undamped steps, stop on non-improvement) or
    "dogleg" (DoglegOptimizer — Powell's dogleg on a trust region,
    minisam/nonlinear/DoglegOptimizer.cpp: blend of the GN step and the
    Cauchy/steepest-descent step, radius adapted by the gain ratio).
    """

    max_iterations: int = 50
    strategy: str = "lm"
    lambda_init: float = 1e-5
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    rtol: float = 1e-6
    radius_init: float = 1.0      # dogleg trust-region radius (minisam)


def _prior_residual(x, meas, w):
    return w * lie.se2_log(lie.se2_compose(lie.se2_inverse(meas), x))


def _between_residual(xi, xj, meas, w):
    rel = lie.se2_compose(lie.se2_inverse(xi), xj)
    return w * lie.se2_log(lie.se2_compose(lie.se2_inverse(meas), rel))


def _huber_scale(r, k):
    """sqrt of Huber weight on the residual norm (minisam HuberLoss)."""
    n = jnp.linalg.norm(r)
    w = jnp.where((k > 0) & (n > k), k / jnp.maximum(n, 1e-12), 1.0)
    return jnp.sqrt(w)


def _linearize(nodes, graph: SE2Graph):
    """Residuals + tangent Jacobian blocks for every factor (vmap + jacfwd).

    Perturbation convention: x -> x * exp(d) (right/local, matching minisam's
    Sophus traits), so the solved delta retracts the same way.
    """
    def prior_one(idx, meas, w, mask):
        x = nodes[idx]

        def f(d):
            return _prior_residual(lie.se2_compose(x, lie.se2_exp(d)),
                                   meas, w)
        r = f(jnp.zeros(3))
        J = jax.jacfwd(f)(jnp.zeros(3))
        m = mask.astype(jnp.float32)
        return r * m, J * m

    def between_one(i, j, meas, w, k, mask):
        xi, xj = nodes[i], nodes[j]

        def f(d):
            di, dj = d[:3], d[3:]
            return _between_residual(
                lie.se2_compose(xi, lie.se2_exp(di)),
                lie.se2_compose(xj, lie.se2_exp(dj)), meas, w)
        r = f(jnp.zeros(6))
        J = jax.jacfwd(f)(jnp.zeros(6))           # [3, 6]
        s = _huber_scale(r, k) * mask.astype(jnp.float32)
        return r * s, J[:, :3] * s, J[:, 3:] * s

    pr, pJ = jax.vmap(prior_one)(graph.prior_idx, graph.prior_meas,
                                 graph.prior_w, graph.prior_mask)
    br, bJi, bJj = jax.vmap(between_one)(graph.bet_i, graph.bet_j,
                                         graph.bet_meas, graph.bet_w,
                                         graph.bet_huber, graph.bet_mask)
    return pr, pJ, br, bJi, bJj


def _normal_equations(nodes, graph: SE2Graph, active_mask):
    """Assemble H [3N, 3N], g [3N], chi2 by block scatter-add."""
    n = nodes.shape[0]
    pr, pJ, br, bJi, bJj = _linearize(nodes, graph)

    H = jnp.zeros((n, 3, n, 3), jnp.float32)
    g = jnp.zeros((n, 3), jnp.float32)

    # priors
    H = H.at[graph.prior_idx, :, graph.prior_idx, :].add(
        jnp.einsum("fab,fac->fbc", pJ, pJ))
    g = g.at[graph.prior_idx].add(jnp.einsum("fab,fa->fb", pJ, pr))

    # betweens: ii, jj, ij, ji blocks
    H = H.at[graph.bet_i, :, graph.bet_i, :].add(
        jnp.einsum("fab,fac->fbc", bJi, bJi))
    H = H.at[graph.bet_j, :, graph.bet_j, :].add(
        jnp.einsum("fab,fac->fbc", bJj, bJj))
    H = H.at[graph.bet_i, :, graph.bet_j, :].add(
        jnp.einsum("fab,fac->fbc", bJi, bJj))
    H = H.at[graph.bet_j, :, graph.bet_i, :].add(
        jnp.einsum("fab,fac->fbc", bJj, bJi))
    g = g.at[graph.bet_i].add(jnp.einsum("fab,fa->fb", bJi, br))
    g = g.at[graph.bet_j].add(jnp.einsum("fab,fa->fb", bJj, br))

    # inactive (padding) nodes: identity diagonal keeps H nonsingular
    pad = jnp.logical_not(active_mask).astype(jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    H = H + jnp.einsum("n,ab->nanb", pad, eye).reshape(n, 3, n, 3) \
        if False else H.at[jnp.arange(n), :, jnp.arange(n), :].add(
            pad[:, None, None] * eye)

    chi2 = jnp.sum(pr * pr) + jnp.sum(br * br)
    return H.reshape(3 * n, 3 * n), g.reshape(3 * n), chi2


def _chi2_only(nodes, graph: SE2Graph):
    pr, _, br, _, _ = _linearize(nodes, graph)
    return jnp.sum(pr * pr) + jnp.sum(br * br)


def optimize(nodes, graph: SE2Graph, active_mask,
             opts: PGOOptions = PGOOptions()):
    """Optimize the pose graph. nodes f32[N, 4] SE(2); active_mask bool[N].

    Returns (nodes, info dict). Strategy per opts.strategy (LM default;
    GN and Powell-dogleg for minisam optimizer parity).
    """
    n = nodes.shape[0]
    is_lm = opts.strategy == "lm"
    is_dl = opts.strategy == "dogleg"

    def cond(carry):
        nodes, lam, chi2, it, done = carry
        return jnp.logical_and(~done, it < opts.max_iterations)

    def body(carry):
        nodes, lam, chi2, it, done = carry
        # ``lam`` doubles as the dogleg trust radius
        H, g, chi2_now = _normal_equations(nodes, graph, active_mask)
        if is_lm:
            Hd = H + lam * jnp.diag(jnp.diag(H))  # scale-invariant damping
        else:
            Hd = H
        L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        delta = jax.scipy.linalg.cho_solve((L, low), -g)
        if is_dl:
            # Powell's dogleg (minisam/nonlinear/DoglegOptimizer.cpp):
            # h_sd = -alpha g with alpha = g'g / g'Hg; pick h_gn if inside
            # the radius, clipped h_sd if even it exceeds it, else the
            # blend on the segment h_sd -> h_gn hitting the boundary.
            gg = jnp.dot(g, g)
            gHg = jnp.dot(g, H @ g)
            alpha = gg / jnp.maximum(gHg, 1e-30)
            h_sd = -alpha * g
            n_gn = jnp.linalg.norm(delta)
            n_sd = jnp.linalg.norm(h_sd)
            # beta: ||h_sd + beta (h_gn - h_sd)|| = radius
            v = delta - h_sd
            a = jnp.dot(v, v)
            b = 2.0 * jnp.dot(h_sd, v)
            cc = jnp.dot(h_sd, h_sd) - lam * lam
            disc = jnp.maximum(b * b - 4 * a * cc, 0.0)
            beta = (-b + jnp.sqrt(disc)) / jnp.maximum(2 * a, 1e-30)
            h_blend = h_sd + beta * v
            delta = jnp.where(
                n_gn <= lam, delta,
                jnp.where(n_sd >= lam, h_sd * (lam / jnp.maximum(n_sd,
                                                                 1e-30)),
                          h_blend))
        delta = delta.reshape(n, 3) * active_mask[:, None]
        new_nodes = lie.se2_compose(nodes, lie.se2_exp(delta))
        new_chi2 = _chi2_only(new_nodes, graph)
        improved = new_chi2 < chi2_now
        nodes = jnp.where(improved, new_nodes, nodes)
        if is_lm:
            lam = jnp.where(improved, lam * opts.lambda_down,
                            lam * opts.lambda_up)
            lam = jnp.clip(lam, 1e-9, 1e6)
        elif is_dl:
            # gain ratio vs the quadratic model decrease
            df = delta.reshape(-1)
            pred = -(jnp.dot(g, df) + 0.5 * jnp.dot(df, H @ df))
            rho = (chi2_now - new_chi2) / jnp.maximum(pred, 1e-30)
            lam = jnp.where(rho > 0.75, jnp.maximum(lam,
                                                    3.0 * jnp.linalg.norm(df)),
                            jnp.where(rho < 0.25, lam * 0.5, lam))
            lam = jnp.clip(lam, 1e-6, 1e6)
        rel = jnp.abs(chi2_now - new_chi2) / jnp.maximum(chi2_now, 1e-12)
        done = jnp.logical_and(improved, rel < opts.rtol)
        done = jnp.logical_or(done, jnp.max(jnp.abs(delta)) < 1e-8)
        if not is_lm and not is_dl:
            # GN: a non-improving undamped step means we are done
            done = jnp.logical_or(done, ~improved)
        return nodes, lam, jnp.where(improved, new_chi2, chi2_now), it + 1, done

    lam0 = jnp.float32(opts.radius_init if is_dl else opts.lambda_init)
    chi0 = _chi2_only(nodes, graph)
    nodes, lam, chi2, it, done = jax.lax.while_loop(
        cond, body, (nodes, lam0, chi0, jnp.int32(0), jnp.bool_(False)))
    return nodes, {"chi2": chi2, "iterations": it}


def marginal_covariance(nodes, graph: SE2Graph, active_mask, idx):
    """3x3 marginal covariance block of node ``idx`` at the solution.

    reference: minisam's marginal covariance
    (minisam/nonlinear/MarginalCovariance.*) — the (idx, idx) block of the
    inverse Gauss-Newton Hessian. Dense at SLAM-scale node counts; the
    inactive-node identity padding keeps H invertible.
    """
    n = nodes.shape[0]
    H, _, _ = _normal_equations(nodes, graph, active_mask)
    Hinv = jnp.linalg.inv(H)
    block = jax.lax.dynamic_slice(Hinv, (3 * idx, 3 * idx), (3, 3))
    return block


# ---------------------------------------------------------------------------
# Host-side graph builder (padded)
# ---------------------------------------------------------------------------

class GraphBuilder:
    """Accumulates factors on host; ``finalize`` pads to static shapes."""

    def __init__(self):
        self.priors = []      # (idx, se2_meas[4], sigmas[3])
        self.betweens = []    # (i, j, se2_meas[4], sigmas[3], huber_k)

    def add_prior(self, idx, meas_se2, sigmas):
        self.priors.append((idx, np.asarray(meas_se2, np.float32),
                            np.asarray(sigmas, np.float32)))

    def add_between(self, i, j, meas_se2, sigmas, huber_k=0.0):
        self.betweens.append((i, j, np.asarray(meas_se2, np.float32),
                              np.asarray(sigmas, np.float32), huber_k))

    @staticmethod
    def _bucket(k, q=64):
        return max(q, ((k + q - 1) // q) * q)

    def finalize(self) -> SE2Graph:
        np_ = self._bucket(max(len(self.priors), 1))
        nb = self._bucket(max(len(self.betweens), 1))
        ident = np.array([0, 0, 1, 0], np.float32)

        p_idx = np.zeros(np_, np.int32)
        p_meas = np.tile(ident, (np_, 1))
        p_w = np.zeros((np_, 3), np.float32)
        p_mask = np.zeros(np_, bool)
        for k, (i, m, s) in enumerate(self.priors):
            p_idx[k], p_meas[k], p_w[k], p_mask[k] = i, m, 1.0 / s, True

        b_i = np.zeros(nb, np.int32)
        b_j = np.zeros(nb, np.int32)
        b_meas = np.tile(ident, (nb, 1))
        b_w = np.zeros((nb, 3), np.float32)
        b_k = np.zeros(nb, np.float32)
        b_mask = np.zeros(nb, bool)
        for k, (i, j, m, s, hk) in enumerate(self.betweens):
            b_i[k], b_j[k], b_meas[k] = i, j, m
            b_w[k], b_k[k], b_mask[k] = 1.0 / s, hk, True

        return SE2Graph(
            jnp.asarray(p_idx), jnp.asarray(p_meas), jnp.asarray(p_w),
            jnp.asarray(p_mask), jnp.asarray(b_i), jnp.asarray(b_j),
            jnp.asarray(b_meas), jnp.asarray(b_w), jnp.asarray(b_k),
            jnp.asarray(b_mask))

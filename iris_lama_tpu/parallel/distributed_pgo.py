"""Distributed pose-graph Gauss-Newton over a device mesh.

The BASELINE north star calls for "distributed Gauss-Newton with
Schur-complement reduction over ICI collectives (psum/all-gather of Hessian
blocks)" for pose graphs too large for one chip's dense solve. Design:

* factors (between/prior) are sharded over the mesh axis "f" — each shard
  linearizes its own factors (vmap + autodiff, same kernels as
  nlls/factor_graph.py) with zero communication;
* the gradient g = J^T r and the Hessian-vector product H v = J^T (J v) are
  computed shard-locally and reduced with one ``psum`` each — the Hessian is
  never materialized;
* the Newton step solves H delta = -g by conjugate gradients with a
  block-Jacobi (per-node 3x3) preconditioner whose blocks are also
  psum-reduced — this is the Schur-style block reduction: each 3x3 node
  block of H is assembled across shards by an all-reduce, inverted locally
  (closed form), and applied elementwise;
* node states are replicated (poses are tiny — O(N*4) floats), so only
  O(N*3) vectors cross ICI per CG iteration.

Runs under jit with sharding annotations; XLA/GSPMD inserts the collectives.
Single-device execution degenerates to an exact matrix-free GN-CG solver.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import lie
from ..nlls import factor_graph as fg


@dataclasses.dataclass(frozen=True)
class DistributedPGOOptions:
    gn_iterations: int = 10
    cg_iterations: int = 50
    cg_tol: float = 1e-6


def _apply_J(nodes, graph: fg.SE2Graph, v):
    """J @ v without materializing J (jvp through the residual)."""
    def residual_all(delta):
        d = delta.reshape(-1, 3)

        def pr(idx, meas, w, mask):
            x = lie.se2_compose(nodes[idx], lie.se2_exp(d[idx]))
            return fg._prior_residual(x, meas, w) * mask

        def br(i, j, meas, w, k, mask):
            xi = lie.se2_compose(nodes[i], lie.se2_exp(d[i]))
            xj = lie.se2_compose(nodes[j], lie.se2_exp(d[j]))
            r = fg._between_residual(xi, xj, meas, w)
            return r * (fg._huber_scale(
                fg._between_residual(nodes[i], nodes[j], meas, w), k) * mask)

        p = jax.vmap(pr)(graph.prior_idx, graph.prior_meas, graph.prior_w,
                         graph.prior_mask.astype(jnp.float32))
        b = jax.vmap(br)(graph.bet_i, graph.bet_j, graph.bet_meas,
                         graph.bet_w, graph.bet_huber,
                         graph.bet_mask.astype(jnp.float32))
        return jnp.concatenate([p.reshape(-1), b.reshape(-1)])

    zero = jnp.zeros(nodes.shape[0] * 3)
    r0, jv = jax.jvp(residual_all, (zero,), (v,))
    return r0, jv


def _block_jacobi(nodes, graph: fg.SE2Graph, active_mask):
    """Per-node 3x3 diagonal blocks of H = J^T J (psum-reducible)."""
    pr, pJ, br, bJi, bJj = fg._linearize(nodes, graph)
    n = nodes.shape[0]
    blocks = jnp.zeros((n, 3, 3))
    blocks = blocks.at[graph.prior_idx].add(
        jnp.einsum("fab,fac->fbc", pJ, pJ))
    blocks = blocks.at[graph.bet_i].add(jnp.einsum("fab,fac->fbc", bJi, bJi))
    blocks = blocks.at[graph.bet_j].add(jnp.einsum("fab,fac->fbc", bJj, bJj))
    pad = jnp.logical_not(active_mask).astype(jnp.float32)
    eye = jnp.eye(3)
    blocks = blocks + (pad[:, None, None] + 1e-6) * eye
    return blocks


def _inv3(blocks):
    """Closed-form batched 3x3 inverse."""
    a = blocks
    c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
    c01 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
    c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
    det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    adj = jnp.stack([
        jnp.stack([c00,
                   a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2],
                   a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]], -1),
        jnp.stack([c01,
                   a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0],
                   a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]], -1),
        jnp.stack([c02,
                   a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1],
                   a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]], -1),
    ], -2)
    return adj / det[:, None, None]


def optimize_distributed(nodes, graph: fg.SE2Graph, active_mask,
                         opts: DistributedPGOOptions = DistributedPGOOptions()):
    """Matrix-free GN-CG with block-Jacobi preconditioning.

    ``graph`` may be sharded along the factor axis (shard the arrays with
    NamedSharding(mesh, P("f")) before calling a jit of this function);
    every reduction below is a sum over factors, which GSPMD turns into
    psum over the mesh. Nodes are replicated.
    """
    n = nodes.shape[0]
    act = active_mask.astype(jnp.float32).reshape(-1, 1)

    def gn_step(nodes, _):
        r0, _ = _apply_J(nodes, graph, jnp.zeros(n * 3))
        _, vjp_fn = jax.vjp(lambda d: _apply_J(nodes, graph, d)[1],
                            jnp.zeros(n * 3))
        g = vjp_fn(r0)[0]

        pre = _inv3(_block_jacobi(nodes, graph, active_mask))

        def precond(v):
            return jnp.einsum("nab,nb->na", pre,
                              v.reshape(n, 3)).reshape(-1)

        def hvp(v):
            _, jv = _apply_J(nodes, graph, v)
            return vjp_fn(jv)[0]

        # PCG
        b = -g
        x = jnp.zeros_like(b)
        r = b
        z = precond(r)
        p = z
        rz = jnp.dot(r, z)

        def cg_body(carry, _):
            x, r, p, rz = carry
            hp = hvp(p)
            denom = jnp.dot(p, hp)
            alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * hp
            z = precond(r)
            rz_new = jnp.dot(r, z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (x, r, p, rz), _ = jax.lax.scan(cg_body, (x, r, p, rz), None,
                                        length=opts.cg_iterations)
        delta = (x.reshape(n, 3) * act)
        new_nodes = lie.se2_compose(nodes, lie.se2_exp(delta))
        # accept only if chi2 decreased
        new_r0, _ = _apply_J(new_nodes, graph, jnp.zeros(n * 3))
        better = jnp.sum(new_r0 * new_r0) < jnp.sum(r0 * r0)
        return jnp.where(better, new_nodes, nodes), jnp.sum(r0 * r0)

    nodes, chi2s = jax.lax.scan(gn_step, nodes, None,
                                length=opts.gn_iterations)
    return nodes, {"chi2_history": chi2s}


def shard_graph(graph: fg.SE2Graph, mesh: Mesh, axis: str = "f"):
    """Place factor arrays on the mesh (factor axis sharded). Factor counts
    must be divisible by the mesh size (GraphBuilder pads to 64)."""
    spec = NamedSharding(mesh, P(axis))

    def put(a):
        return jax.device_put(a, spec)

    return fg.SE2Graph(*[put(a) for a in graph])

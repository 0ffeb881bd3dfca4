"""Factor-graph optimizer tests.

Oracles: closed-form expectations on small graphs (chain relaxation,
loop-closure correction) and a scipy reference solution of the same
nonlinear least squares.
"""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos.simple_pgo import SimplePGO
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.nlls import factor_graph as fg

rng = np.random.default_rng(6)


def _nodes_array(poses, n_pad):
    nodes = np.tile(np.array([0, 0, 1, 0], np.float32), (n_pad, 1))
    for i, p in enumerate(poses):
        nodes[i] = p.se2_array()
    active = np.zeros(n_pad, bool)
    active[:len(poses)] = True
    return jnp.asarray(nodes), jnp.asarray(active)


def test_prior_only_pulls_to_measurement():
    b = fg.GraphBuilder()
    target = Pose2D(1.0, 2.0, 0.5)
    b.add_prior(0, target.se2_array(), (0.1, 0.1, 0.1))
    graph = b.finalize()
    nodes, active = _nodes_array([Pose2D(0, 0, 0)], 64)
    out, info = fg.optimize(nodes, graph, active)
    got = Pose2D.from_se2_array(np.asarray(out)[0])
    np.testing.assert_allclose(got.xyr(), target.xyr(), atol=1e-4)


def test_chain_consistent_measurements_exact():
    # perfect odometry chain: solution = integrated chain from the prior
    true = [Pose2D(0, 0, 0)]
    for k in range(6):
        true.append(true[-1] + Pose2D(1.0, 0.1 * k, 0.15))
    b = fg.GraphBuilder()
    b.add_prior(0, true[0].se2_array(), (0.01, 0.01, 0.01))
    for i in range(6):
        meas = true[i] - true[i + 1]
        b.add_between(i, i + 1, meas.se2_array(), (0.5, 0.5, 0.1))
    graph = b.finalize()

    # corrupt initial values
    init = [Pose2D(p.x() + rng.normal(0, 0.3), p.y() + rng.normal(0, 0.3),
                   p.rotation() + rng.normal(0, 0.1)) for p in true]
    nodes, active = _nodes_array(init, 64)
    out, info = fg.optimize(nodes, graph, active)
    out = np.asarray(out)
    for i, p in enumerate(true):
        got = Pose2D.from_se2_array(out[i])
        np.testing.assert_allclose(got.xyr(), p.xyr(), atol=1e-3)


def test_loop_closure_distributes_error():
    # square loop with drift; loop edge snaps it closed
    pgo = SimplePGO()
    # ground truth square: 4 sides of length 2, 90 deg turns
    gt = [Pose2D(0, 0, 0)]
    for k in range(8):
        step = Pose2D(1.0, 0, 0) if k % 2 == 0 else Pose2D(1.0, 0, np.pi / 2)
        gt.append(gt[-1] + step)
    # drifted initial: stretch x steps by 5%
    drift = [Pose2D(0, 0, 0)]
    for k in range(8):
        step = Pose2D(1.08, 0.02, 0.01) if k % 2 == 0 else \
            Pose2D(1.08, 0.02, np.pi / 2 + 0.01)
        drift.append(drift[-1] + step)
    pgo.node_list = list(drift)
    # loop edge: node 8 observed back at gt relation to node 0
    rel = gt[0] - gt[8]
    pgo.edge_list = [(0, (8, rel))]
    pgo.fixed_list = [(0, gt[0])]
    assert pgo.optimize()
    # endpoint matches the loop constraint
    end = pgo.node_list[0] + rel
    np.testing.assert_allclose(pgo.node_list[8].xy(), end.xy(), atol=0.05)
    # total chain error decreased vs drifted
    err0 = np.linalg.norm(drift[8].xy() - gt[8].xy())
    err1 = np.linalg.norm(pgo.node_list[8].xy() - gt[8].xy())
    assert err1 < err0 * 0.3, (err0, err1)


def test_huber_downweights_outlier_edge():
    # chain with one wildly wrong loop edge under Huber vs quadratic
    true = [Pose2D(k * 1.0, 0, 0) for k in range(5)]

    def solve(huber):
        b = fg.GraphBuilder()
        b.add_prior(0, true[0].se2_array(), (0.01, 0.01, 0.01))
        for i in range(4):
            b.add_between(i, i + 1, (true[i] - true[i + 1]).se2_array(),
                          (0.1, 0.1, 0.1))
        # outlier edge claims node 4 is at node 0
        b.add_between(0, 4, Pose2D(0.5, 0, 0).se2_array(), (0.1, 0.1, 0.1),
                      huber_k=huber)
        graph = b.finalize()
        nodes, active = _nodes_array(true, 64)
        out, _ = fg.optimize(nodes, graph, active)
        return Pose2D.from_se2_array(np.asarray(out)[4])

    robust = solve(0.1)
    quad = solve(0.0)
    # robust solution stays near the chain answer; quadratic gets dragged
    assert abs(robust.x() - 4.0) < abs(quad.x() - 4.0)
    assert abs(robust.x() - 4.0) < 0.3


def test_padding_nodes_untouched():
    b = fg.GraphBuilder()
    b.add_prior(0, Pose2D(1, 1, 0).se2_array(), (0.1, 0.1, 0.1))
    graph = b.finalize()
    nodes, active = _nodes_array([Pose2D(0, 0, 0)], 64)
    out, _ = fg.optimize(nodes, graph, active)
    out = np.asarray(out)
    np.testing.assert_allclose(out[1:], np.tile([0, 0, 1, 0], (63, 1)),
                               atol=1e-6)


def test_marginal_covariance_prior_only():
    # single node with a prior of sigma s: marginal covariance = s^2 I
    b = fg.GraphBuilder()
    s = 0.2
    b.add_prior(0, Pose2D(1, 2, 0.3).se2_array(), (s, s, s))
    graph = b.finalize()
    nodes, active = _nodes_array([Pose2D(1, 2, 0.3)], 8)
    cov = np.asarray(fg.marginal_covariance(nodes, graph, active, 0))
    np.testing.assert_allclose(cov, s * s * np.eye(3), atol=1e-5)


def test_marginal_covariance_grows_along_chain():
    # odometry chain from a prior: uncertainty accumulates with distance
    b = fg.GraphBuilder()
    poses = [Pose2D(k * 1.0, 0, 0) for k in range(4)]
    b.add_prior(0, poses[0].se2_array(), (0.1, 0.1, 0.1))
    for i in range(3):
        b.add_between(i, i + 1, (poses[i] - poses[i + 1]).se2_array(),
                      (0.2, 0.2, 0.1))
    graph = b.finalize()
    nodes, active = _nodes_array(poses, 8)
    tr = [np.trace(np.asarray(
        fg.marginal_covariance(nodes, graph, active, i))) for i in range(4)]
    assert tr[0] < tr[1] < tr[2] < tr[3], tr


def test_gn_and_dogleg_match_lm():
    """minisam optimizer parity: GN / Dogleg converge to the LM solution
    on a noisy loop graph (same minimum, strategy-independent)."""
    true = [Pose2D(0, 0, 0)]
    for k in range(7):
        true.append(true[-1] + Pose2D(1.0, 0.0, np.pi / 4))
    b = fg.GraphBuilder()
    b.add_prior(0, true[0].se2_array(), (0.01, 0.01, 0.01))
    r2 = np.random.default_rng(3)
    for i in range(7):
        meas = true[i] - true[i + 1]
        noisy = Pose2D(meas.x() + r2.normal(0, 0.05),
                       meas.y() + r2.normal(0, 0.05),
                       meas.rotation() + r2.normal(0, 0.02))
        b.add_between(i, i + 1, noisy.se2_array(), (0.5, 0.5, 0.1))
    # loop closure back to the start
    loop = true[7] - true[0]
    b.add_between(7, 0, loop.se2_array(), (0.2, 0.2, 0.05))
    graph = b.finalize()

    init = [Pose2D(p.x() + r2.normal(0, 0.2), p.y() + r2.normal(0, 0.2),
                   p.rotation() + r2.normal(0, 0.05)) for p in true]
    nodes, active = _nodes_array(init, 64)

    sols = {}
    for strat in ("lm", "gn", "dogleg"):
        out, info = fg.optimize(nodes, graph, active,
                                fg.PGOOptions(strategy=strat))
        sols[strat] = (np.asarray(out)[:8], float(info["chi2"]))
        assert int(info["iterations"]) > 0

    for strat in ("gn", "dogleg"):
        np.testing.assert_allclose(sols[strat][1], sols["lm"][1],
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(sols[strat][0], sols["lm"][0],
                                   atol=2e-3)

"""Distributed pose-graph GN-CG: matches the dense LM optimizer, and runs
with the factor axis sharded over the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.nlls import factor_graph as fg
from iris_lama_tpu.parallel import distributed_pgo as dpgo

rng = np.random.default_rng(17)


def build_loop_graph(n=24, drift=0.04):
    true = [Pose2D(0, 0, 0)]
    for k in range(n - 1):
        step = Pose2D(1.0, 0.05 * np.sin(k), 0.26)
        true.append(true[-1] + step)
    b = fg.GraphBuilder()
    b.add_prior(0, true[0].se2_array(), (0.01, 0.01, 0.01))
    for i in range(n - 1):
        meas = true[i] - true[i + 1]
        b.add_between(i, i + 1, meas.se2_array(), (0.5, 0.5, 0.1))
    # a couple of loop closures
    for (i, j) in [(0, n - 1), (2, n // 2)]:
        b.add_between(i, j, (true[i] - true[j]).se2_array(), (0.5, 0.5, 0.1))
    graph = b.finalize()

    init = [Pose2D(p.x() + rng.normal(0, drift), p.y() + rng.normal(0, drift),
                   p.rotation() + rng.normal(0, drift)) for p in true]
    n_pad = fg.GraphBuilder._bucket(n)
    nodes = np.tile(np.array([0, 0, 1, 0], np.float32), (n_pad, 1))
    for i, p in enumerate(init):
        nodes[i] = p.se2_array()
    active = np.zeros(n_pad, bool)
    active[:n] = True
    return true, jnp.asarray(nodes), graph, jnp.asarray(active), n


def test_matches_dense_lm():
    true, nodes, graph, active, n = build_loop_graph()
    dense, _ = fg.optimize(nodes, graph, active)
    dist, info = dpgo.optimize_distributed(nodes, graph, active)
    dense, dist = np.asarray(dense), np.asarray(dist)
    for i in range(n):
        p_dense = Pose2D.from_se2_array(dense[i])
        p_dist = Pose2D.from_se2_array(dist[i])
        assert np.linalg.norm(p_dense.xy() - p_dist.xy()) < 2e-2, i
    # and both near the truth
    for i in range(n):
        p = Pose2D.from_se2_array(dist[i])
        assert np.linalg.norm(p.xy() - true[i].xy()) < 5e-2, i


def test_sharded_factors_on_mesh():
    assert len(jax.devices()) == 8
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("f",))
    true, nodes, graph, active, n = build_loop_graph(n=30)
    sharded = dpgo.shard_graph(graph, mesh)
    run = jax.jit(lambda nd, g, a: dpgo.optimize_distributed(nd, g, a)[0])
    out = run(nodes, sharded, active)
    jax.block_until_ready(out)
    out = np.asarray(out)
    for i in range(n):
        p = Pose2D.from_se2_array(out[i])
        assert np.linalg.norm(p.xy() - true[i].xy()) < 5e-2, i

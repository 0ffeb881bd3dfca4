"""Distributed map rebuild (parallel/map_rebuild.py) on the virtual mesh.

Spec: the scan-sharded rasterize + strip-sharded EDT must equal the
single-device rebuild bit-for-bit, and the single-device rebuild must match
the sequential per-scan update_maps end state (counts are order-independent
and the EDT is an exact recompute).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from iris_lama_tpu.algos.slam2d import Slam2DOptions
from iris_lama_tpu.parallel import map_rebuild
from iris_lama_tpu.sdm import mapping, pool as pool_mod
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan


def _scans(n=12, beams=90):
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n, seed=9, laser=simulator.LaserSpec(n_beams=beams,
                                                     max_range=4.0)))
    poses, points, masks, origins = [], [], [], []
    for k in range(n):
        pts, msk, org = pad_scan(data.clouds[k], 128)
        g = data.poses_gt[k]
        poses.append([g[0], g[1], np.cos(g[2]), np.sin(g[2])])
        points.append(pts)
        masks.append(msk)
        origins.append(org)
    return (np.asarray(poses, np.float32), np.asarray(points, np.float32),
            np.asarray(masks), np.asarray(origins, np.float32))


def _cfg():
    return Slam2DOptions(resolution=0.1, patch_size=16, max_range=4.0,
                         l2_max=0.5, capacity=512).mapping_config()


def test_sharded_rebuild_equals_single_device():
    cfg = _cfg()
    poses, points, masks, origins = _scans()
    org, h, w = map_rebuild.grid_bounds(cfg, cfg.geometry, poses)

    single = map_rebuild.rebuild_dense(
        cfg, jnp.asarray(poses), jnp.asarray(points), jnp.asarray(masks),
        jnp.asarray(origins), org, h, w)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("s",))
    sharded = map_rebuild.rebuild_dense(
        cfg, jnp.asarray(poses), jnp.asarray(points), jnp.asarray(masks),
        jnp.asarray(origins), org, h, w, mesh=mesh)

    np.testing.assert_array_equal(np.asarray(sharded.occ),
                                  np.asarray(single.occ))
    np.testing.assert_array_equal(np.asarray(sharded.vis),
                                  np.asarray(single.vis))
    np.testing.assert_array_equal(np.asarray(sharded.dist),
                                  np.asarray(single.dist))


def test_rebuild_matches_sequential_update_maps():
    cfg = _cfg()
    poses, points, masks, origins = _scans()
    org, h, w = map_rebuild.grid_bounds(cfg, cfg.geometry, poses)
    dense = map_rebuild.rebuild_dense(
        cfg, jnp.asarray(poses), jnp.asarray(points), jnp.asarray(masks),
        jnp.asarray(origins), org, h, w)
    state = map_rebuild.dense_to_state(cfg, dense)

    # sequential oracle: one update_maps per scan
    seq = mapping.slam_map_init(cfg)
    step = jax.jit(lambda s, p, pts, m, o: mapping.update_maps(
        s, cfg, p, pts, m, o)[0], donate_argnums=(0,))
    for k in range(len(poses)):
        seq = step(seq, jnp.asarray(poses[k]), jnp.asarray(points[k]),
                   jnp.asarray(masks[k]), jnp.asarray(origins[k]))

    # every sequential patch's counts match the rebuild's cells
    keys, kmask = pool_mod.active_keys(seq.table)
    keys = np.asarray(keys)[np.asarray(kmask)]
    s_seq = np.asarray(pool_mod.table_lookup(seq.table, jnp.asarray(keys)))
    s_new = np.asarray(pool_mod.table_lookup(state.table, jnp.asarray(keys)))
    occ_seq = np.asarray(seq.occupied)
    vis_seq = np.asarray(seq.visited)
    occ_new = np.asarray(state.occupied)
    vis_new = np.asarray(state.visited)
    for a, b, key in zip(s_seq, s_new, keys):
        if (vis_seq[a] > 0).any():
            assert b >= 0, f"rebuild lost patch {key}"
            np.testing.assert_array_equal(occ_new[b], occ_seq[a])
            np.testing.assert_array_equal(vis_new[b], vis_seq[a])

    # distance field: wherever the sequential map stored a below-max
    # distance, the rebuild agrees (the rebuild is exact everywhere; the
    # sequential field is exact inside its update windows)
    d_seq = np.asarray(seq.dist)
    d_new = np.asarray(state.dist)
    for a, b in zip(s_seq, s_new):
        inside = d_seq[a] < cfg.distance.max_dist - 1e-6
        if inside.any():
            np.testing.assert_allclose(d_new[b][inside], d_seq[a][inside],
                                       atol=1e-6)

"""Resident-window PF path vs the legacy per-update pool path.

The resident mode (sdm/mapping.py resident_* + pf_slam2d resident dispatch)
must be *exactly* equivalent: the safe-zone margin guarantees every scan's
obstacle/distance changes land in the EDT interior, interpolation reads are
in-window for both paths, and all arithmetic (one-hot selections, integer
counts, capped integer EDT) is order-insensitive — so trajectories match
bit-for-bit and flushed maps match cell-for-cell.
"""

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.sdm import distance as dist_mod
from iris_lama_tpu.sdm import pool as pool_mod
from iris_lama_tpu.utils import simulator


def _probe_counts(m, geo, cells):
    """(occ, vis) counts at cells; 0 where the patch is unallocated."""
    keys = geo.m2p(cells)
    slots = pool_mod.table_lookup(m.table, keys)
    local = geo.m2local(cells)
    safe = jnp.where(slots >= 0, slots, m.occupied.shape[0] - 1)
    occ = jnp.where(slots >= 0,
                    m.occupied[safe, local[..., 1], local[..., 0]], 0)
    vis = jnp.where(slots >= 0,
                    m.visited[safe, local[..., 1], local[..., 0]], 0)
    return occ, vis


def _sim(n_steps=70, seed=3):
    cfg = simulator.SimConfig(
        n_steps=n_steps, seed=seed,
        laser=simulator.LaserSpec(n_beams=120, max_range=8.0),
        odom_trans_noise=0.02, odom_rot_noise=0.004)
    return simulator.simulate(cfg)


def _opts(**kw):
    base = dict(particles=6, resolution=0.1, patch_size=16, max_range=8.0,
                capacity=1024, trans_thresh=0.3, rot_thresh=0.3,
                max_iter=30, seed=7)
    base.update(kw)
    return pf.PFSlam2DOptions(**base)


def _run(data, opts):
    slam = pf.PFSlam2D(opts)
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    est = []
    reorgs = 0
    for k in range(len(data.clouds)):
        if slam.update(data.clouds[k], data.odometry[k], data.timestamps[k]):
            est.append(np.asarray(slam.pset.pose))
            reorgs += int(slam._last_info.get("reorged", 0))
    return np.asarray(est), reorgs, slam


def test_resident_bitwise_equals_legacy():
    data = _sim()
    est_res, reorgs, slam_res = _run(data, _opts(resident_window=True))
    est_leg, _, slam_leg = _run(data, _opts(resident_window=False))
    # the robot travels far enough that the window must re-center
    # (device-cond re-orgs show in the info flag; host-gated ones in the
    # driver counter)
    assert reorgs + slam_res._n_reorgs >= 1, "re-org path not exercised"
    assert est_res.shape == est_leg.shape and len(est_res) > 10
    # identical PRNG stream + exact window math -> bit-identical particles
    np.testing.assert_array_equal(est_res, est_leg)
    np.testing.assert_array_equal(np.asarray(slam_res.pset.weight_sum),
                                  np.asarray(slam_leg.pset.weight_sum))
    assert slam_res._last_info["escaped"] == 0
    assert slam_res._last_info["overflow"] == 0

    # flushed best-particle map == legacy best-particle map, probed over a
    # dense world raster (allocation-agnostic comparison)
    mr = slam_res.particle_map()
    ml = slam_leg.particle_map()
    cfg = _opts().mapping_config()
    geo = cfg.geometry
    xs = np.linspace(-10.0, 10.0, 101)
    wx, wy = np.meshgrid(xs, xs)
    pts = jnp.asarray(np.stack([wx.ravel(), wy.ravel()], -1), jnp.float32)
    cells = geo.w2m(pts)
    dr = dist_mod.cell_distance(mr.table, mr.dist, geo, cells,
                                cfg.distance.max_dist)
    dl = dist_mod.cell_distance(ml.table, ml.dist, geo, cells,
                                cfg.distance.max_dist)
    np.testing.assert_array_equal(np.asarray(dr), np.asarray(dl))
    occ_r = _probe_counts(mr, geo, cells)
    occ_l = _probe_counts(ml, geo, cells)
    np.testing.assert_array_equal(np.asarray(occ_r[0]), np.asarray(occ_l[0]))
    np.testing.assert_array_equal(np.asarray(occ_r[1]), np.asarray(occ_l[1]))


def test_resident_margin_config():
    cfg = _opts().mapping_config()
    # margin formula: ceil(max_range*scale) + 2R + 2 + ceil(pose_slack*scale)
    assert cfg.resident_margin_cells == 80 + 10 + 2 + 5
    w = cfg.resident_window_cells
    m = cfg.resident_margin_cells
    # the safe zone must fit the anchor alignment + half-patch wander
    assert w - 2 * m >= cfg.geometry.patch_length + 2 * (
        cfg.geometry.patch_length // 2) - 2


def test_resident_safe_predicate():
    cfg = _opts().mapping_config()
    org = jnp.asarray([0, 0], jnp.int32)
    m = cfg.resident_margin_cells
    w = cfg.resident_window_cells
    import iris_lama_tpu.sdm.mapping as mapping
    ok = mapping.resident_safe(cfg, org, jnp.asarray(
        [[m, m], [m - 1, m], [w - m - 1, w - m - 1], [w - m, m]], jnp.int32))
    np.testing.assert_array_equal(np.asarray(ok), [True, False, True, False])

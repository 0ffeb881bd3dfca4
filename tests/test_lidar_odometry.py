"""LidarOdometry2D: odometry-free tracking on the synthetic world, plus
transient-map pruning behavior."""

import numpy as np

from iris_lama_tpu.algos.lidar_odometry_2d import (LidarOdometry2D,
                                                   LidarOdometry2DOptions)
from iris_lama_tpu.utils import simulator


def test_lidar_odometry_tracks_motion():
    # odometry-free tracking needs near-sensor-rate scans (the reference
    # assumes 20-40 Hz): ~6.5 cm between scans, first 300 scans of the loop
    cfg = simulator.SimConfig(
        n_steps=1200, seed=12,
        laser=simulator.LaserSpec(n_beams=180, max_range=8.0))
    data = simulator.simulate(cfg)

    lo = LidarOdometry2D(LidarOdometry2DOptions(resolution=0.05,
                                                max_range=8.0,
                                                capacity=2048))
    n_run = 300
    est = []
    for k in range(n_run):
        lo.update(data.clouds[k], data.timestamps[k])
        est.append(lo.pose().xyr())
    est = np.asarray(est)

    # ground-truth *relative* motion (odometry-free: est starts at identity)
    gt = data.poses_gt
    rel_gt = []
    from iris_lama_tpu.core.pose import Pose2D
    g0 = Pose2D(*gt[0])
    for k in range(n_run):
        rel_gt.append((g0 - Pose2D(*gt[k])).xyr())
    rel_gt = np.asarray(rel_gt)

    # scan-to-local-map without odometry lags the true motion; assert the
    # trajectory tracks the direction and scale of motion qualitatively
    err = np.linalg.norm(est[:, :2] - rel_gt[:, :2], axis=1)
    travel_gt = np.linalg.norm(rel_gt[-1, :2])
    travel_est = np.linalg.norm(est[-1, :2])
    assert err[:60].mean() < 0.5, err[:60].mean()
    assert travel_est > 0.5 * travel_gt, (travel_est, travel_gt)


def test_transient_map_prunes_patches():
    # with a transient map, patch count stays bounded as the robot moves
    cfg = simulator.SimConfig(
        n_steps=200, seed=13,
        laser=simulator.LaserSpec(n_beams=120, max_range=6.0))
    data = simulator.simulate(cfg)
    lo = LidarOdometry2D(LidarOdometry2DOptions(resolution=0.1,
                                                patch_size=16,
                                                max_range=6.0,
                                                capacity=2048))
    counts = []
    for k in range(cfg.n_steps):
        lo.update(data.clouds[k], data.timestamps[k])
        if k % 25 == 0:
            counts.append(int(lo.map.table.num_patches()))
    # patches get recycled: the count stays well under the total visited area
    assert max(counts) < 800, counts
    # and the pool never overflowed
    assert int(lo.map.table.overflow) == 0

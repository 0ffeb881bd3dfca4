"""Probe (r4): WHERE does TPU LidarOdometry2D diverge on the office
world? (CPU: 0.79 m/100m; TPU: 13-19 — pre-existing, survives disabling
every r4 gather/lookup change.) Prints the error curve in 50-step bins
plus the per-step error jump maxima."""

import sys
import time

import numpy as np


def main():
    import os
    import jax
    if os.environ.get("IRIS_PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from iris_lama_tpu.algos.lidar_odometry_2d import (
        LidarOdometry2D, LidarOdometry2DOptions)
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    n_steps = int(__import__("os").environ.get("IRIS_LIDAR_STEPS", "800"))
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=3, smooth=int(__import__("os").environ.get("IRIS_LIDAR_SMOOTH", "3")),
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    nb = beam_bucket(720)
    staged = [pad_scan(c, nb) for c in data.clouds]

    lo = LidarOdometry2D(LidarOdometry2DOptions(resolution=0.05,
                                                max_range=10.0,
                                                capacity=4096))
    for k in range(n_steps):
        lo.update_prepadded(jnp.asarray(staged[k][0]),
                            jnp.asarray(staged[k][1]),
                            jnp.asarray(staged[k][2]), float(k) * 0.1)
    est = lo.trajectory()
    g0 = Pose2D(*data.poses_gt[0])
    rel_gt = np.asarray([(g0 - Pose2D(*data.poses_gt[k])).xyr()
                         for k in range(n_steps)])
    err = np.linalg.norm(est[:, :2] - rel_gt[:len(est), :2], axis=1)
    np.save("/tmp/lidar_est.npy", est)
    print("err curve (50-step bins):",
          " ".join(f"{e:.2f}" for e in err[::50]))
    jump = np.diff(err)
    order = np.argsort(-np.abs(jump))[:8]
    print("biggest per-step err jumps at steps:",
          [(int(i), round(float(jump[i]), 3)) for i in sorted(order)])
    print("final err", float(err[-1]))


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark: Loc2D localization updates/second against a prebuilt map
(BASELINE.json config #2). One JSON line like bench.py."""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from iris_lama_tpu.algos.loc2d import Loc2D, Loc2DOptions, maps_from_slam
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator

    n_steps = 200
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=7,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))

    # build the fixed map with slam2d
    slam = Slam2D(Slam2DOptions(resolution=0.05, max_range=10.0,
                                trans_thresh=0.2, rot_thresh=0.2,
                                capacity=8192))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_steps):
        slam.update(data.clouds[k], data.odometry[k], data.timestamps[k])

    loc = Loc2D(Loc2DOptions(resolution=0.05, l2_max=0.5, max_range=10.0,
                             trans_thresh=0.1, rot_thresh=0.1),
                maps=maps_from_slam(slam.map, slam.cfg))
    loc.set_prior(Pose2D(*data.poses_gt[0]))
    # warm/compile
    loc.update(data.clouds[0], data.odometry[0], 0.0, force_update=True)
    loc.update(data.clouds[1], data.odometry[1], 0.1, force_update=True)

    gt = []
    n_upd = 0
    t0 = time.perf_counter()
    for k in range(2, n_steps):
        if loc.update(data.clouds[k], data.odometry[k], data.timestamps[k]):
            n_upd += 1
            gt.append(data.poses_gt[k])
    import jax as _jax
    _jax.block_until_ready(loc._pose_dev)
    elapsed = time.perf_counter() - t0
    est = loc.trajectory()[-len(gt):]
    errs = np.linalg.norm(est[:, :2] - np.asarray(gt)[:, :2], axis=1)

    ups = n_upd / elapsed
    print(json.dumps({
        "metric": "loc2d_updates_per_sec",
        "value": round(ups, 2),
        "unit": "updates/s",
        "vs_baseline": round(ups / 10.0, 2),
        "extra": {"mean_err_m": round(float(np.mean(errs)), 4),
                  "updates": n_upd,
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    sys.exit(main())

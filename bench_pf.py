"""Secondary benchmark: PFSlam2D updates/second (30 particles, one chip).

Prints one JSON line like bench.py (the driver runs bench.py; this script
covers the particle-filter configuration from BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.evaluation import ate_rmse

    n_steps = 120
    sim_cfg = simulator.SimConfig(
        n_steps=n_steps, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0))
    data = simulator.simulate(sim_cfg)

    opts = PFSlam2DOptions(particles=30, resolution=0.05, max_range=10.0,
                           trans_thresh=0.25, rot_thresh=0.25,
                           capacity=2048, max_iter=50, seed=11)
    pf = PFSlam2D(opts)
    pf.set_prior(Pose2D(*data.poses_gt[0]))

    # warmup/compile
    pf.update(data.clouds[0], data.odometry[0], 0.0)
    k = 1
    while k < n_steps and not pf.update(data.clouds[k], data.odometry[k],
                                        data.timestamps[k]):
        k += 1
    k += 1

    n_updates = 0
    gt = []
    t0 = time.perf_counter()
    for i in range(k, n_steps):
        if pf.update(data.clouds[i], data.odometry[i], data.timestamps[i]):
            n_updates += 1
            gt.append(data.poses_gt[i])
    jax.block_until_ready(pf.pset.pose)
    elapsed = time.perf_counter() - t0

    ups = n_updates / elapsed
    err = float(np.linalg.norm(pf.pose().xy() - gt[-1][:2])) if gt else -1.0

    print(json.dumps({
        "metric": "pf_slam2d_updates_per_sec",
        "value": round(ups, 2),
        "unit": "updates/s",
        "vs_baseline": round(ups / 2.0, 2),   # RPi-class PF ~2 Hz
        "extra": {
            "particles": 30,
            "final_err_m": round(err, 4),
            "updates": n_updates,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())

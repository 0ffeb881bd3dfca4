"""Does the per-scan step pay a pool-size-proportional cost? Office bench
config at capacity 2048 / 8192 / 16384 (map needs ~270 patches)."""
import json, time
import numpy as np

def run(capacity, reps=3):
    import jax, jax.numpy as jnp
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
    data = simulator.simulate(simulator.SimConfig(
        n_steps=220, seed=3,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    nb = beam_bucket(720)
    staged = [tuple(jnp.asarray(a) for a in pad_scan(data.clouds[k], nb))
              for k in range(220)]
    opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.1,
                         rot_thresh=0.1, capacity=capacity, max_iter=50)
    out = []
    for rep in range(reps + 1):
        slam = Slam2D(opts)
        slam.set_prior(Pose2D(data.poses_gt[0][0] + rep*1e-4,
                              data.poses_gt[0][1], data.poses_gt[0][2]))
        slam.update_prepadded(*staged[0], data.odometry[0])
        slam.update_prepadded(*staged[1], data.odometry[1])
        jax.block_until_ready(slam._pose_dev)
        t0 = time.perf_counter()
        acc = slam.update_many_prepadded(staged[2:], list(data.odometry)[2:])
        jax.block_until_ready(slam._pose_dev)
        if rep:
            out.append(len(acc) / (time.perf_counter() - t0))
    print(json.dumps({"capacity": capacity,
                      "scans_per_sec": [round(x, 1) for x in out],
                      "median": round(float(np.median(out)), 1)}),
          flush=True)

for c in (2048, 8192, 16384):
    run(c)

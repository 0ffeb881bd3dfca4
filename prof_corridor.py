"""Why is the corridor world slow? Slam2D probe: capacity / extra-ring /
iteration effects, office vs corridor."""
import json, time
import numpy as np

def run(world, capacity, extra, n_steps=600, beams=720, reps=2, label=""):
    import jax, jax.numpy as jnp
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=1, world=world,
        laser=simulator.LaserSpec(n_beams=beams, max_range=10.0),
        odom_trans_noise=0.01, odom_rot_noise=0.002))
    nb = beam_bucket(beams)
    staged = [tuple(jnp.asarray(a) for a in pad_scan(data.clouds[k], nb))
              for k in range(n_steps)]
    opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.25,
                         rot_thresh=0.25, capacity=capacity,
                         resident_extra_patches=extra)
    best = 0.0
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
        sps = len(acc) / (time.perf_counter() - t0)
        if rep:
            best = max(best, sps)
    info = {k: int(np.asarray(v)) for k, v in slam._last_info_dev.items()
            if k in ("num_patches", "overflow")}
    print(json.dumps({"label": label or world, "cap": capacity,
                      "extra": extra, "scans_per_sec": round(best, 1),
                      **info}), flush=True)

run("office", 8192, 4, label="office cap8k")
run("corridor", 8192, 4, label="corr cap8k")
run("corridor", 32768, 4, label="corr cap32k")
run("corridor", 8192, 8, label="corr cap8k extra8")

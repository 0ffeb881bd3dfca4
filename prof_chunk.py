"""Probe: why is the chunked Slam2D replay slow on TPU?

Times, in ONE process on the ambient device:
  A. per-scan update_prepadded over N scans
  B. chunked update_many_prepadded (chunk=32) over the same scans
  C. like B with IRIS_CHUNK_NO_COND=1 (set in env) the cond removed

Run twice interleaved; ATE printed as the correctness guard.
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    n_steps = 80
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=3,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.1,
                         rot_thresh=0.1, capacity=8192, max_iter=50)
    nb = beam_bucket(720)
    staged = []
    for k in range(n_steps):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))
    jax.block_until_ready(staged[-1][0])

    def run(mode, rep):
        slam = Slam2D(opts)
        slam.set_prior(Pose2D(data.poses_gt[0][0] + rep * 1e-4,
                              data.poses_gt[0][1], data.poses_gt[0][2]))
        slam.update_prepadded(*staged[0], data.odometry[0])
        slam.update_prepadded(*staged[1], data.odometry[1])
        jax.block_until_ready(slam._pose_dev)
        t0 = time.perf_counter()
        if mode == "seq":
            n = 0
            for k in range(2, n_steps):
                n += bool(slam.update_prepadded(*staged[k],
                                                data.odometry[k]))
        else:
            n = len(slam.update_many_prepadded(staged[2:],
                                               list(data.odometry[2:])))
        jax.block_until_ready(slam._pose_dev)
        dt = time.perf_counter() - t0
        return n / dt

    # warm both programs
    run("seq", 9)
    run("chunk", 9)
    out = {"seq": [], "chunk": []}
    for rep in range(3):
        out["seq"].append(round(run("seq", rep), 1))
        out["chunk"].append(round(run("chunk", rep), 1))
    print({"no_cond": os.environ.get("IRIS_CHUNK_NO_COND", "0"),
           "interp_mxu": os.environ.get("IRIS_INTERP_MXU", "1"), **out},
          flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: full GraphSlam2D pipeline (transient-map front end, key-pose
chain, batched loop-closure verification, pose-graph optimization) on the
synthetic noisy office loop — BASELINE.json config #4, the pipeline this
time (bench_pgo.py covers the bare solve). One JSON line like bench.py.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from iris_lama_tpu.algos.graph_slam2d import (GraphSlam2D,
                                                  GraphSlam2DOptions)
    from iris_lama_tpu.algos.slam2d import Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.evaluation import ate_rmse

    n_steps = 300
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=8,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0),
        odom_trans_noise=0.02, odom_rot_noise=0.004))

    def run_trajectory(rep):
        slam_opts = Slam2DOptions(resolution=0.05, max_range=10.0,
                                  trans_thresh=0.25, rot_thresh=0.25,
                                  capacity=4096, transient_map=True)
        gs = GraphSlam2D(GraphSlam2DOptions(
            slam=slam_opts, ignore_n_chain_poses=10, key_pose_head_delay=3,
            loop_closure_scan_rmse=0.12))
        gs.set_prior(Pose2D(data.poses_gt[0][0] + rep * 1e-4,
                            data.poses_gt[0][1], data.poses_gt[0][2]))
        # raw poses stay in the front end's device trajectory ring; the
        # host records only the (rarely changing) correction per update —
        # pulling gs.pose() live would cost a device->host sync per scan
        corrections, gt = [], []
        n_upd = 0
        t0 = time.perf_counter()
        for k in range(n_steps):
            if gs.update(data.clouds[k], data.odometry[k],
                         data.timestamps[k]):
                n_upd += 1
                corrections.append(gs.correction)
                gt.append(data.poses_gt[k])
        jax.block_until_ready(gs.slam._pose_dev)
        elapsed = time.perf_counter() - t0
        raw = gs.slam.trajectory()   # one device pull
        est = np.asarray([(c + Pose2D(*r)).xyr()
                          for c, r in zip(corrections, raw)])
        ate = ate_rmse(est, np.asarray(gt))
        return n_upd / elapsed, ate, n_upd, len(gs.links)

    # median of in-process reps (rep 0 = warmup carrying all compilation)
    run_trajectory(rep=9)
    results = sorted(run_trajectory(rep=r) for r in range(3))
    sps, ate, n_upd, n_links = results[len(results) // 2]

    print(json.dumps({
        "metric": "graph_slam2d_scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 2),   # RPi real-time ~10 scans/s
        "extra": {
            "ate_m": round(ate, 4),
            "updates": n_upd,
            "loop_closures": n_links,
            "beams": 720,
            "reps": [round(r[0], 2) for r in results],
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark: full GraphSlam2D pipeline (resident transient-map front end,
device-gated key-pose chain, batched loop-closure verification, pose-graph
optimization) on the synthetic noisy office loop — BASELINE.json config #4,
the pipeline this time (bench_pgo.py covers the bare solve). One JSON line
like bench.py.

Default path (r3): chunked prepadded replay — the front end rides Slam2D's
straight-line unroll programs, the key gate replays over the device
trajectory ring once per sync window, and all loop-closure candidates of a
window verify in one dispatch + one packed pull. IRIS_GRAPH_BENCH_SEQ=1
measures the per-scan (live/ROS-style) driver instead.

Quality is PINNED: the bench asserts the key-pose ATE bound and a minimum
loop-closure count before printing, so throughput work cannot silently
trade accuracy (VERDICT r2 #6).
"""

import json
import os
import sys
import time

import numpy as np

ATE_BOUND_M = 0.15       # measured ~0.06-0.09; fails on a 2x regression
MIN_LOOPS = 4            # measured 11-16 on this world


def main():
    import jax
    if os.environ.get("IRIS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["IRIS_BENCH_PLATFORM"])

    from iris_lama_tpu.algos.graph_slam2d import (GraphSlam2D,
                                                  GraphSlam2DOptions)
    from iris_lama_tpu.algos.slam2d import Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
    from iris_lama_tpu.utils.evaluation import ate_rmse

    sequential = os.environ.get("IRIS_GRAPH_BENCH_SEQ") == "1"
    n_steps = 300
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=8,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0),
        odom_trans_noise=0.02, odom_rot_noise=0.004))

    # stage padded scans on HOST (the key-pose machinery keeps clouds there;
    # uploads ride each chunk dispatch and are cheap)
    nb = beam_bucket(720)
    staged = [pad_scan(data.clouds[k], nb) for k in range(n_steps)]
    odoms = list(data.odometry)
    times = [float(k) for k in range(n_steps)]

    def run_trajectory(rep):
        slam_opts = Slam2DOptions(resolution=0.05, max_range=10.0,
                                  trans_thresh=0.25, rot_thresh=0.25,
                                  capacity=4096, transient_map=True)
        gs = GraphSlam2D(GraphSlam2DOptions(
            slam=slam_opts, ignore_n_chain_poses=10, key_pose_head_delay=3,
            loop_closure_scan_rmse=0.12))
        gs.set_prior(Pose2D(data.poses_gt[0][0] + rep * 1e-4,
                            data.poses_gt[0][1], data.poses_gt[0][2]))
        t0 = time.perf_counter()
        if sequential:
            for k in range(n_steps):
                gs.update_prepadded(*staged[k], odoms[k], times[k])
            kps = gs.key_poses          # final sync inside the timed region
        else:
            gs.update_many_prepadded(staged, odoms, timestamps=times)
            kps = gs.key_poses
        jax.block_until_ready(gs.slam._pose_dev)
        elapsed = time.perf_counter() - t0
        n_upd = gs.slam._n_updates
        est = np.asarray([kp.pose.xyr() for kp in kps])
        gt = np.asarray([data.poses_gt[int(kp.timestamp)] for kp in kps])
        ate = ate_rmse(est, gt)
        return n_upd / elapsed, ate, n_upd, len(gs.links)

    # median of in-process reps (rep 0 = warmup carrying all compilation)
    run_trajectory(rep=9)
    results = sorted(run_trajectory(rep=r) for r in range(3))
    sps, ate, n_upd, n_links = results[len(results) // 2]

    # pinned quality: fail loudly instead of printing a fast-but-wrong number
    assert ate < ATE_BOUND_M, f"key-pose ATE regression: {ate:.3f} m"
    assert n_links >= MIN_LOOPS, f"loop closures regressed: {n_links}"

    print(json.dumps({
        "metric": "graph_slam2d_scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 2),   # RPi real-time ~10 scans/s
        "extra": {
            "ate_m": round(ate, 4),
            "ate_bound_m": ATE_BOUND_M,
            "updates": n_upd,
            "loop_closures": n_links,
            "beams": 720,
            "path": "sequential" if sequential else "chunked",
            "reps": [round(r[0], 2) for r in results],
            "best": round(max(r[0] for r in results), 2),
            "spread": round(max(r[0] for r in results)
                      / max(min(r[0] for r in results), 1e-9), 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())

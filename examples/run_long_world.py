"""Run every algorithm on the synthetic long-corridor figure-8 world.

The corridor world (utils/simulator.py:corridor_world) is the best
available stand-in for the MIT-Killian/Intel-long-log regime while the
real CARMEN logs are unobtainable in this image: ~550 m of 3 m-wide
corridor in two nested loops, sparse longitudinal texture, large loop
closures. Prints one JSON line per algorithm:
  {"algo", "scans_per_sec", "ate_m"| "final_err_m", ...}

Usage:
  python examples/run_long_world.py [--steps 3000] [--beams 720]
      [--algos slam2d,graph_slam] [--platform cpu]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--beams", type=int, default=720)
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument(
        "--algos", default="slam2d,graph_slam,pf_slam,loc2d,lidar_odom")
    ap.add_argument("--particles", type=int, default=30)
    ap.add_argument("--platform", default="")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
    from iris_lama_tpu.utils.evaluation import ate_rmse

    data = simulator.simulate(simulator.SimConfig(
        n_steps=args.steps, seed=args.seed, world="corridor",
        laser=simulator.LaserSpec(n_beams=args.beams, max_range=10.0),
        odom_trans_noise=0.01, odom_rot_noise=0.002))
    nb = beam_bucket(args.beams)
    staged_np = [pad_scan(data.clouds[k], nb) for k in range(args.steps)]
    staged = [tuple(jnp.asarray(a) for a in t) for t in staged_np]
    jax.block_until_ready(staged[-1][0])
    odoms = list(data.odometry)
    times = [float(k) for k in range(args.steps)]

    def report(algo, sps, err_name, err, extra=None):
        print(json.dumps({"algo": algo, "scans_per_sec": round(sps, 2),
                          err_name: round(err, 4),
                          **(extra or {})}), flush=True)

    algos = args.algos.split(",")

    slam_traj = None
    if "slam2d" in algos or "loc2d" in algos:
        from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
        # capacity right-sized to the world (~900 patches at 5 cm):
        # prof_corridor measured 706 scans/s at 8192 vs 279 at 32768 —
        # the big pool rides through the per-scan re-org cond and its
        # copies scale with capacity
        opts = Slam2DOptions(resolution=args.resolution, max_range=10.0,
                             trans_thresh=0.25, rot_thresh=0.25,
                             capacity=8192)
        slam = Slam2D(opts)
        slam.set_prior(Pose2D(*data.poses_gt[0]))
        # warmup prefix: remote compilation (~30-60 s/program) must not
        # pollute the throughput row; the map/trajectory state carries over
        warm = min(64, args.steps // 4)
        acc0 = slam.update_many_prepadded(staged[:warm], odoms[:warm])
        jax.block_until_ready(slam._pose_dev)
        t0 = time.perf_counter()
        accepted = slam.update_many_prepadded(staged[warm:], odoms[warm:])
        jax.block_until_ready(slam._pose_dev)
        dt = time.perf_counter() - t0
        accepted = acc0 + [warm + a for a in accepted]
        est = slam.trajectory()
        gt = np.asarray([data.poses_gt[k] for k in accepted])
        ate = ate_rmse(est, gt)
        if "slam2d" in algos:
            report("slam2d", (len(accepted) - len(acc0)) / dt, "ate_m", ate,
                   {"updates": len(accepted),
                    "patches": int(np.asarray(
                        slam.map.table.num_patches()))})
        slam_for_loc = slam

    if "graph_slam" in algos:
        from iris_lama_tpu.algos.graph_slam2d import (GraphSlam2D,
                                                      GraphSlam2DOptions)
        from iris_lama_tpu.algos.slam2d import Slam2DOptions
        gopts = GraphSlam2DOptions(
            slam=Slam2DOptions(resolution=args.resolution, max_range=10.0,
                               trans_thresh=0.25, rot_thresh=0.25,
                               capacity=4096, transient_map=True),
            key_pose_head_delay=3, ignore_n_chain_poses=15,
            loop_closure_scan_rmse=0.12)
        # two passes: remote compilation spreads over the whole first
        # pass (pose-graph node/factor buckets grow with the trajectory,
        # so a prefix warmup cannot reach them); pass 2 is the measurement
        for timed in (False, True):
            gs = GraphSlam2D(gopts)
            gs.set_prior(Pose2D(*data.poses_gt[0]))
            t0 = time.perf_counter()
            accepted = gs.update_many_prepadded(staged_np, odoms,
                                                timestamps=times)
            kps = gs.key_poses      # final sync inside the timed region
            jax.block_until_ready(gs.slam._pose_dev)
            dt = time.perf_counter() - t0
        # final-frame ATE: all key poses in the last optimized frame
        kp_est = np.asarray([kp.pose.xyr() for kp in kps])
        kp_gt = np.asarray([data.poses_gt[int(kp.timestamp)] for kp in kps])
        stats = {k: round(v, 2) for k, v in gs.stats.items()
                 if not k.endswith("_n")}
        report("graph_slam", len(accepted) / dt, "ate_m",
               ate_rmse(kp_est, kp_gt),
               {"key_poses": len(kps),
                "loop_closures": len(gs.links),
                "updates": len(accepted),
                "phase_s": stats})

    if "pf_slam" in algos:
        from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
        popts = PFSlam2DOptions(particles=args.particles,
                                resolution=args.resolution, max_range=10.0,
                                trans_thresh=0.25, rot_thresh=0.25,
                                capacity=4096, max_iter=50, seed=11)
        pf = PFSlam2D(popts)
        pf.set_prior(Pose2D(*data.poses_gt[0]))
        # straight-line unroll replay (r3 default; the lax.scan chunk paid
        # carried-state buffer copies — 62.8 vs 89.5 up/s on bench_pf r2)
        warm = min(64, args.steps // 4)
        acc0 = pf.update_many_prepadded(staged[:warm], odoms[:warm])
        jax.block_until_ready(pf.pset.pose)
        t0 = time.perf_counter()
        accepted = pf.update_many_prepadded(staged[warm:], odoms[warm:])
        jax.block_until_ready(pf.pset.pose)
        dt = time.perf_counter() - t0
        accepted = acc0 + [warm + a for a in accepted]
        err = float(np.linalg.norm(
            pf.pose().xy() - data.poses_gt[accepted[-1]][:2]))
        report("pf_slam", (len(accepted) - len(acc0)) / dt,
               "final_err_m", err,
               {"updates": len(accepted), "particles": args.particles})

    if "loc2d" in algos:
        from iris_lama_tpu.algos.loc2d import (Loc2D, Loc2DOptions,
                                               maps_from_slam)
        maps = maps_from_slam(slam_for_loc.map, slam_for_loc.cfg)
        loc = Loc2D(Loc2DOptions(resolution=args.resolution, l2_max=0.5,
                                 max_range=10.0, trans_thresh=0.1,
                                 rot_thresh=0.1), maps=maps)
        loc.set_prior(Pose2D(*data.poses_gt[0]))
        staged_loc = [(p[:, :2], m) for p, m, _ in staged]
        warm = min(64, args.steps // 4)
        acc0 = loc.update_many_prepadded(staged_loc[:warm], odoms[:warm])
        jax.block_until_ready(loc._pose_dev)
        t0 = time.perf_counter()
        accepted = loc.update_many_prepadded(staged_loc[warm:],
                                             odoms[warm:])
        jax.block_until_ready(loc._pose_dev)
        dt = time.perf_counter() - t0
        accepted = acc0 + [warm + a for a in accepted]
        n_timed = len(accepted) - len(acc0)
        est = loc.trajectory()
        gt = np.asarray([data.poses_gt[k] for k in accepted])
        errs = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1)
        report("loc2d", n_timed / dt, "mean_err_m",
               float(np.mean(errs)), {"updates": len(accepted)})

    if "lidar_odom" in algos:
        from iris_lama_tpu.algos.lidar_odometry_2d import (
            LidarOdometry2D, LidarOdometry2DOptions)
        lo = LidarOdometry2D(LidarOdometry2DOptions(
            resolution=args.resolution, max_range=10.0, capacity=4096))
        # odometry-free tracking needs near-sensor-rate scans; run on the
        # densest stretch of the log (every scan, no gate)
        n_run = min(args.steps, 1500)
        warm = min(32, n_run // 4)
        for k in range(warm):
            lo.update_prepadded(*staged[k], times[k])
        jax.block_until_ready(lo._pose_dev)
        t0 = time.perf_counter()
        for k in range(warm, n_run):
            lo.update_prepadded(*staged[k], times[k])
        jax.block_until_ready(lo._pose_dev)
        dt = time.perf_counter() - t0
        est = lo.trajectory()
        g0 = Pose2D(*data.poses_gt[0])
        rel_gt = np.asarray([(g0 - Pose2D(*data.poses_gt[k])).xyr()
                             for k in range(n_run)])
        err = np.linalg.norm(est[:, :2] - rel_gt[:, :2], axis=1)
        report("lidar_odom", (n_run - warm) / dt, "drift_m_per_100m",
               float(err[-1] / max(np.sum(np.linalg.norm(
                   np.diff(rel_gt[:, :2], axis=0), axis=1)), 1e-9) * 100.0),
               {"scans": n_run, "final_err_m": round(float(err[-1]), 3)})


if __name__ == "__main__":
    main()

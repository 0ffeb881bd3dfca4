"""Isolate GraphSlam2D cost: (a) bare transient-resident Slam2D replay,
(b) + key-scan syncs, (c) full pipeline. One TPU invocation."""
import os, time, json
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from iris_lama_tpu.algos.graph_slam2d import GraphSlam2D, GraphSlam2DOptions
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    n_steps = 300
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=8,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0),
        odom_trans_noise=0.02, odom_rot_noise=0.004))
    nb = beam_bucket(720)
    staged = [pad_scan(data.clouds[k], nb) for k in range(n_steps)]
    odoms = list(data.odometry)
    slam_opts = Slam2DOptions(resolution=0.05, max_range=10.0,
                              trans_thresh=0.25, rot_thresh=0.25,
                              capacity=4096, transient_map=True)

    def bare(rep, transient=True):
        so = slam_opts if transient else Slam2DOptions(
            resolution=0.05, max_range=10.0, trans_thresh=0.25,
            rot_thresh=0.25, capacity=4096)
        slam = Slam2D(so)
        slam.set_prior(Pose2D(data.poses_gt[0][0] + rep*1e-4,
                              data.poses_gt[0][1], data.poses_gt[0][2]))
        t0 = time.perf_counter()
        acc = slam.update_many_prepadded(staged, odoms)
        jax.block_until_ready(slam._pose_dev)
        return len(acc) / (time.perf_counter() - t0)

    def pipeline(rep):
        gs = GraphSlam2D(GraphSlam2DOptions(
            slam=slam_opts, ignore_n_chain_poses=10, key_pose_head_delay=3,
            loop_closure_scan_rmse=0.12))
        gs.set_prior(Pose2D(data.poses_gt[0][0] + rep*1e-4,
                            data.poses_gt[0][1], data.poses_gt[0][2]))
        t0 = time.perf_counter()
        gs.update_many_prepadded(staged, odoms)
        kps = gs.key_poses
        jax.block_until_ready(gs.slam._pose_dev)
        el = time.perf_counter() - t0
        return gs.slam._n_updates / el, dict(gs.stats)

    # warmups
    pipeline(9)
    out = {}
    rows = [pipeline(r) for r in range(3)]
    out["pipeline"] = [round(r[0], 1) for r in rows]
    out["stats"] = [{k: (round(v, 3) if isinstance(v, float) else v)
                     for k, v in r[1].items()} for r in rows]
    print(json.dumps(out))

main()

"""Long-corridor figure-8 world (the MIT-Killian/Intel regime): scaled-down
e2e checks that the corridor world exercises what the office loop cannot —
long featureless corridors and large nested loop closures.

The full-scale run (3000 steps, 720 beams, ~550 m) lives in
examples/run_long_world.py; these tests use a reduced configuration that
keeps CPU runtime reasonable while preserving the regime.
"""

import numpy as np

from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.evaluation import ate_rmse


def _sim(n_steps=700, beams=240, seed=1):
    return simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=seed, world="corridor",
        laser=simulator.LaserSpec(n_beams=beams, max_range=10.0),
        odom_trans_noise=0.01, odom_rot_noise=0.002))


def test_corridor_world_geometry():
    segs = simulator.corridor_world(0)
    traj = simulator.corridor_trajectory(500)
    # the route spans both loops and revisits the shared middle corridor
    assert traj[:, 0].max() > 100 and traj[:, 1].max() > 50
    mid_visits = np.where(np.abs(traj[:, 0] - 60.0) < 0.5)[0]
    gaps = np.diff(mid_visits)
    assert (gaps > 50).sum() >= 2, "middle corridor must be revisited"
    # every pose sees walls (corridor width 3 m << max_range)
    r = simulator.cast_scan(segs, traj[250], simulator.LaserSpec(90, 10.0))
    assert np.isfinite(r).mean() > 0.6


def test_slam2d_survives_long_corridor():
    """Scan-to-map SLAM without loop closure: corridors let longitudinal
    drift accumulate; the bound here is intentionally loose (it tracks,
    it must not diverge) — graph SLAM owns the tight bound below."""
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    import jax.numpy as jnp
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    data = _sim()
    opts = Slam2DOptions(resolution=0.1, patch_size=16, max_range=10.0,
                         trans_thresh=0.25, rot_thresh=0.25, capacity=16384)
    slam = Slam2D(opts)
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    nb = beam_bucket(240)
    staged = []
    for k in range(len(data.clouds)):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))
    accepted = slam.update_many_prepadded(staged, list(data.odometry))
    est = slam.trajectory()
    gt = np.asarray([data.poses_gt[k] for k in accepted])
    ate = ate_rmse(est, gt)
    odom = np.asarray([data.odometry[k].xyr() for k in accepted])
    ate_odom = ate_rmse(odom, gt)
    assert ate < 1.0, (ate, ate_odom)
    assert ate < ate_odom * 1.5, (ate, ate_odom)


def test_graph_slam_closes_corridor_loops():
    """Loop closures must fire on the figure-8 revisits and pull the
    key-pose graph near ground truth despite corridor drift."""
    from iris_lama_tpu.algos.graph_slam2d import (GraphSlam2D,
                                                  GraphSlam2DOptions)
    from iris_lama_tpu.algos.slam2d import Slam2DOptions

    data = _sim()
    gopts = GraphSlam2DOptions(
        slam=Slam2DOptions(resolution=0.1, patch_size=16, max_range=10.0,
                           trans_thresh=0.25, rot_thresh=0.25,
                           capacity=8192, transient_map=True),
        key_pose_head_delay=3, ignore_n_chain_poses=15,
        loop_closure_scan_rmse=0.15)
    gs = GraphSlam2D(gopts)
    gs.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(len(data.clouds)):
        gs.update(data.clouds[k], data.odometry[k], data.timestamps[k])
    assert len(gs.links) >= 1, "no loop closures on a figure-8 revisit"
    kp_est = np.asarray([kp.pose.xyr() for kp in gs.key_poses])
    kp_gt = np.asarray([data.poses_gt[int(round(kp.timestamp / 0.1))]
                        for kp in gs.key_poses])
    ate = ate_rmse(kp_est, kp_gt)
    assert ate < 0.6, (ate, len(gs.links))

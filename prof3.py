import time, numpy as np, jax, jax.numpy as jnp
from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan

n_steps = 40
data = simulator.simulate(simulator.SimConfig(n_steps=n_steps, seed=3, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.1, rot_thresh=0.1, capacity=8192, max_iter=50)
slam = Slam2D(opts)
slam.set_prior(Pose2D(*data.poses_gt[0]))
slam.update(data.clouds[0], data.odometry[0], 0.0)
slam.update(data.clouds[1], data.odometry[1], 0.1)

t_pad = t_step = t_sync = 0.0
nupd = 0
for k in range(2, n_steps):
    cloud, odom = data.clouds[k], data.odometry[k]
    t0 = time.perf_counter()
    points, mask, origin = pad_scan(cloud, slam._max_beams)
    points, mask, origin = jnp.asarray(points), jnp.asarray(mask), jnp.asarray(origin)
    odelta = slam.odom_ - odom
    ppose = slam.pose_ + odelta
    if (np.linalg.norm(odelta.xy()) <= 0.1 and abs(odelta.rotation()) <= 0.1):
        continue
    slam.pose_ = ppose; slam.odom_ = odom
    t1 = time.perf_counter()
    slam.map, pose_dev, info = slam._step(slam.map, jnp.asarray(slam.pose_.se2_array()), points, mask, origin)
    jax.block_until_ready(pose_dev)
    t2 = time.perf_counter()
    pose_np = np.asarray(pose_dev)
    slam.pose_ = Pose2D.from_se2_array(pose_np)
    it = int(np.asarray(info["iterations"]))
    t3 = time.perf_counter()
    t_pad += t1-t0; t_step += t2-t1; t_sync += t3-t2; nupd += 1
    if nupd <= 6 or nupd % 10 == 0:
        print(f"upd {nupd}: step {1e3*(t2-t1):.1f} ms iters={it}", flush=True)
print(f"avg over {nupd}: pad {1e3*t_pad/nupd:.2f} step {1e3*t_step/nupd:.2f} sync {1e3*t_sync/nupd:.2f} ms")

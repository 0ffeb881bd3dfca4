"""Upper bound of the re-org cond's cost: whole-run A/B with the cond
compiled out (IRIS_DEBUG_NO_REORG_COND=1 — wrong results once a reorg
would fire; timing only)."""
import json, os, subprocess, sys

def run(flag):
    env = dict(os.environ)
    if flag:
        env["IRIS_DEBUG_NO_REORG_COND"] = "1"
    code = r'''
import json, time
import numpy as np
import jax, jax.numpy as jnp
from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
data = simulator.simulate(simulator.SimConfig(
    n_steps=220, seed=3, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
nb = beam_bucket(720)
staged = [tuple(jnp.asarray(a) for a in pad_scan(data.clouds[k], nb)) for k in range(220)]
opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.1,
                     rot_thresh=0.1, capacity=8192, max_iter=50)
out = []
for rep in range(4):
    slam = Slam2D(opts)
    slam.set_prior(Pose2D(data.poses_gt[0][0] + rep*1e-4, data.poses_gt[0][1], data.poses_gt[0][2]))
    slam.update_prepadded(*staged[0], data.odometry[0]); slam.update_prepadded(*staged[1], data.odometry[1])
    jax.block_until_ready(slam._pose_dev)
    t0 = time.perf_counter()
    acc = slam.update_many_prepadded(staged[2:], list(data.odometry)[2:])
    jax.block_until_ready(slam._pose_dev)
    if rep: out.append(len(acc) / (time.perf_counter() - t0))
print(json.dumps(out))
'''
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    line = [l for l in r.stdout.splitlines() if l.startswith("[")][-1]
    print(json.dumps({"no_cond": flag, "scans_per_sec": json.loads(line)}),
          flush=True)

run(False)
run(True)
run(False)
run(True)

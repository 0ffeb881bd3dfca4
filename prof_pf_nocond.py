"""PF: what does the re-org cond cost? IRIS_DEBUG_NO_REORG=1 compiles it
out (results WRONG once a re-org is needed; timing only). Interleaved
subprocess A/B like prof_nocond."""
import json, os, subprocess, sys

CODE = r'''
import json, time
import numpy as np
import jax, jax.numpy as jnp
from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
data = simulator.simulate(simulator.SimConfig(
    n_steps=120, seed=5, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
nb = beam_bucket(720)
staged = [tuple(jnp.asarray(a) for a in pad_scan(data.clouds[k], nb)) for k in range(120)]
opts = PFSlam2DOptions(particles=30, resolution=0.05, max_range=10.0,
                       trans_thresh=0.25, rot_thresh=0.25, capacity=2048,
                       max_iter=50, seed=11)
out = []
for rep in range(3):
    pf = PFSlam2D(opts)
    pf.set_prior(Pose2D(data.poses_gt[0][0] + rep*1e-4, data.poses_gt[0][1], data.poses_gt[0][2]))
    pf.update_prepadded(*staged[0], data.odometry[0])
    jax.block_until_ready(pf.pset.pose)
    t0 = time.perf_counter()
    n = 0
    for k in range(1, 120):
        n += bool(pf.update_prepadded(*staged[k], data.odometry[k]))
    jax.block_until_ready(pf.pset.pose)
    if rep:
        out.append(n / (time.perf_counter() - t0))
print(json.dumps(out))
'''

def run(flag):
    env = dict(os.environ)
    if flag:
        env["IRIS_DEBUG_NO_REORG"] = "1"
    r = subprocess.run([sys.executable, "-c", CODE], env=env,
                       capture_output=True, text=True, timeout=1800)
    lines = [l for l in r.stdout.splitlines() if l.startswith("[")]
    print(json.dumps({"no_reorg_cond": flag,
                      "ups": lines[-1] if lines else r.stderr[-200:]}),
          flush=True)

run(False); run(True); run(False); run(True)

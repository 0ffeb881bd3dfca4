"""Probe: run the NumPy LaMa oracle alone on a short office log and
report per-stage runtime + tracking error (tuning for the head-to-head
test's budget). CPU only."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from iris_lama_tpu.utils import simulator
from tests.oracle.lama_numpy import SE2, Slam2DOracle

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
beams = int(sys.argv[2]) if len(sys.argv) > 2 else 360
res = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1

data = simulator.simulate(simulator.SimConfig(
    n_steps=n_steps, seed=3,
    laser=simulator.LaserSpec(n_beams=beams, max_range=10.0)))

oracle = Slam2DOracle(resolution=res, l2_max=0.5,
                      trans_thresh=0.05, rot_thresh=0.05, max_iter=50)
g0 = data.poses_gt[0]
oracle.set_prior(g0[0], g0[1], g0[2])

t0 = time.perf_counter()
errs = []
t_update = 0.0
for k in range(n_steps):
    pts = data.clouds[k].base_frame_points()[:, :2]
    od = data.odometry[k]
    odse2 = SE2.from_xyr(od.x(), od.y(), od.rotation())
    tu = time.perf_counter()
    acc = oracle.update(pts, odse2)
    t_update += time.perf_counter() - tu
    if acc:
        gt = data.poses_gt[k]
        errs.append(np.hypot(oracle.pose.tx - gt[0], oracle.pose.ty - gt[1]))

elapsed = time.perf_counter() - t0
errs = np.asarray(errs)
print(f"steps={n_steps} beams={beams} res={res}")
print(f"total {elapsed:.1f}s ({elapsed/n_steps*1000:.0f} ms/scan), "
      f"updates={len(errs)}")
print(f"err mean {errs.mean()*1000:.1f} mm  max {errs.max()*1000:.1f} mm  "
      f"final {errs[-1]*1000:.1f} mm")
print(f"processed cells last update: {oracle.processed_cells}")

"""Probe (r5): wall + device cost of one PF re-org program — full
flush+regather vs the scroll (band) variant — plus the harvest stall.

Runs the filter to steady state on the office world, then times the two
re-org programs back-to-back on chained donated state (each dispatch on
a fresh pset from the previous output; orgs drift so the programs do
real work). Wall = host-side perf_counter around dispatch+block;
device = jax.profiler totals (devprof).

PYTHONPATH=. python prof_r5_reorg.py [particles] [capacity]
"""

import sys
import time

import numpy as np


def main():
    import jax

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import devprof, simulator

    particles = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    capacity = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    n_steps = 60
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    opts = PFSlam2DOptions(particles=particles, resolution=0.05,
                           max_range=10.0, trans_thresh=0.25,
                           rot_thresh=0.25, capacity=capacity,
                           max_iter=50, seed=11)
    pf = PFSlam2D(opts)
    pf.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_steps):
        pf.update(data.clouds[k], data.odometry[k], data.timestamps[k])
    jax.block_until_ready(pf.pset.pose)
    print(f"steady: {pf._n_reorgs} re-orgs, kp={pf.options.scroll_kp}, "
          f"trigger={pf._pf_trigger_m:.1f} m")

    for name, prog in (("full", pf._jit_reorg), ("scroll", pf._jit_scroll)):
        if prog is None:
            continue
        # warm
        pf.pset = prog(pf.pset)
        jax.block_until_ready(pf.pset.pose)
        walls = []
        for _ in range(6):
            t0 = time.perf_counter()
            pf.pset = prog(pf.pset)
            jax.block_until_ready(pf.pset.pose)
            walls.append((time.perf_counter() - t0) * 1e3)
        st = {"pset": pf.pset}

        def fn(k):
            st["pset"] = prog(st["pset"])
            return st["pset"].res_org

        dev = devprof.device_time_ms(fn, lambda k: (k,), n=4)
        pf.pset = st["pset"]
        print(f"{name}: wall median {sorted(walls)[len(walls)//2]:.1f} ms "
              f"(reps {[round(w,1) for w in walls]}), device {dev:.1f} ms")


if __name__ == "__main__":
    sys.exit(main())

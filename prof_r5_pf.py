"""Probe (r5): devprof budget of the PF fused update at a given particle
count — the VERDICT r4 #7 budget table source and the #1/#2 lever gauge.

Runs the filter to steady state, then profiles the fused update program
with jax.profiler (real device times over the tunnel) and prints the
top fusions. PYTHONPATH=. python prof_r5_pf.py [particles] [capacity]
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils import devprof

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
    print(f"steady state reached: {pf._n_reorgs} re-orgs, "
          f"{particles} particles")

    # profile the fused update dispatch: replay the last scan with a
    # perturbed odometry per call (chained state, donated)
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
    nb = beam_bucket(720)
    p, m, o = pad_scan(data.clouds[-1], nb)
    p, m, o = jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)

    state = {"pset": pf.pset, "key": pf.key}

    def step(k):
        od = jnp.asarray(
            np.array([[1e-5 * (k % 97), 0.3, 1.0, 0.0]], np.float32))
        valids = jnp.asarray(np.array([True]))
        new_pset, info, key = pf._jit_update(
            state["pset"], state["key"], od, valids, p, m, o)
        state["pset"], state["key"] = new_pset, key
        return new_pset.pose

    def fn(k):
        return step(int(k))

    rows = devprof.device_breakdown(lambda k: fn(k), lambda k: (k,),
                                    n=2, top=60)
    total = 0.0
    for name, ms in rows:
        print(f"{ms:8.3f} ms  {name[:110]}")
    # jit region totals
    ms = devprof.device_time_ms(lambda k: fn(k), lambda k: (k,), n=4)
    print(f"fused update device total: {ms:.3f} ms")


if __name__ == "__main__":
    sys.exit(main())

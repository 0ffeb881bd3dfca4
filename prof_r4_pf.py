"""Probe (r4): where do PF's ~11.5 ms/update actually go?

max_iter 8 vs 50 measured IDENTICAL (87.5 vs 87.0 up/s) with the batched
whole-solve kernel on — the r3 "IRLS is ~8 of 11 ms" attribution is
stale. This probe times 10-update segments (one block per segment, so
the ~25 ms tunnel pull amortizes to 2.5 ms/update and segment DELTAS
stay meaningful), records host-side re-org events, and pulls all
per-update info flags (resampled, match_iters) in ONE stacked transfer
at the end.

Run on the TPU: PYTHONPATH=. python prof_r4_pf.py [extra_rings]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator

    n_steps = 120
    seg = 10
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))

    opts = PFSlam2DOptions(particles=30, resolution=0.05, max_range=10.0,
                           trans_thresh=0.25, rot_thresh=0.25,
                           capacity=2048, max_iter=50, seed=11)

    def run(tag):
        pf = PFSlam2D(opts)
        pf.set_prior(Pose2D(*data.poses_gt[0]))
        pf.update(data.clouds[0], data.odometry[0], 0.0)
        jax.block_until_ready(pf.pset.pose)
        infos = []
        reorg_at = []
        seg_times = []
        t_seg = time.perf_counter()
        n_upd = 0
        for i in range(1, n_steps):
            n_before = pf._n_reorgs
            did = pf.update(data.clouds[i], data.odometry[i],
                            data.timestamps[i])
            if pf._n_reorgs > n_before:
                reorg_at.append(n_upd)
            if did:
                n_upd += 1
                infos.append(pf._last_info_dev)
                if n_upd % seg == 0:
                    jax.block_until_ready(pf.pset.pose)
                    seg_times.append(time.perf_counter() - t_seg)
                    t_seg = time.perf_counter()
        jax.block_until_ready(pf.pset.pose)
        # one stacked pull for every update's flags
        stacked = jax.jit(lambda *xs: jnp.stack(xs))(
            *[jnp.stack([inf.get("resampled").astype(jnp.float32),
                         inf.get("match_iters_max").astype(jnp.float32),
                         inf.get("match_iters_mean")])
              for inf in infos])
        flags = np.asarray(stacked)
        res = flags[:, 0]
        itmax = flags[:, 1]
        itmean = flags[:, 2]
        print(f"[{tag}] updates {n_upd}  re-orgs {len(reorg_at)} at "
              f"{reorg_at}")
        print(f"[{tag}] resampled {int(res.sum())}/{len(res)}  "
              f"match_iters max mean {itmax.mean():.1f}  "
              f"mean mean {itmean.mean():.1f}")
        ms = [1e3 * t / seg for t in seg_times]
        print(f"[{tag}] per-update ms by segment: "
              + " ".join(f"{m:.1f}" for m in ms))
        return ms

    run("warm")     # compile everything, discard
    a = run("A")
    b = run("B")
    print(f"medians: A {np.median(a):.2f} B {np.median(b):.2f} ms/update")


if __name__ == "__main__":
    sys.exit(main())

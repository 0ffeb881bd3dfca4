"""Probe: PF per-update device time grouped by event type (TPU).

Blocks on the particle poses after every update so each wall time is one
update's device work (plus a constant dispatch overhead); groups by the
(resampled, reorged) flags from the step info to bound what resampling
and the pool re-org actually cost inside an otherwise sane run — the
IRIS_DEBUG_NO_* ablations corrupt the map and confound downstream stages
(a diverged filter runs the matcher to max iterations).
"""

import sys
import time

import numpy as np


def main():
    import jax

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator

    n_steps = 120
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))

    opts = PFSlam2DOptions(particles=30, resolution=0.05, max_range=10.0,
                           trans_thresh=0.25, rot_thresh=0.25,
                           capacity=2048, max_iter=50, seed=11)
    pf = PFSlam2D(opts)
    pf.set_prior(Pose2D(*data.poses_gt[0]))
    pf.update(data.clouds[0], data.odometry[0], 0.0)

    rows = []
    for i in range(1, n_steps):
        t0 = time.perf_counter()
        did = pf.update(data.clouds[i], data.odometry[i],
                        data.timestamps[i])
        jax.block_until_ready(pf.pset.pose)
        dt = (time.perf_counter() - t0) * 1e3
        if not did:
            continue
        # keep DEVICE refs; pulling per update costs ~30 ms each over the
        # tunnel and would poison the wall times of later updates
        inf = dict(pf._last_info_dev)
        rows.append((dt, inf.get("resampled"), inf.get("reorged"),
                     inf.get("match_iters_max")))

    rows = rows[2:]   # settle
    arr = np.array([r[0] for r in rows])
    res = np.array([np.asarray(r[1]).item() if r[1] is not None else -1
                    for r in rows])
    reo = np.array([np.asarray(r[2]).item() if r[2] is not None else -1
                    for r in rows])
    it_max = np.array([np.asarray(r[3]).item() if r[3] is not None else -1
                       for r in rows])
    print(f"updates {len(rows)}  median {np.median(arr):.1f} ms  "
          f"p10 {np.percentile(arr, 10):.1f}  p90 {np.percentile(arr, 90):.1f}")
    for name, m in (("resampled", res == 1), ("no-resample", res == 0),
                    ("reorged", reo == 1), ("no-reorg", reo == 0)):
        if m.any():
            print(f"  {name:12s} n={m.sum():3d}  median {np.median(arr[m]):.1f} ms")
    if (it_max >= 0).any():
        print(f"  match_iters_max: median {np.median(it_max):.0f} "
              f"p90 {np.percentile(it_max, 90):.0f}")
    corr = np.corrcoef(it_max, arr)[0, 1] if (it_max >= 0).all() else None
    if corr is not None:
        print(f"  corr(iters_max, ms) = {corr:.2f}")


if __name__ == "__main__":
    sys.exit(main())

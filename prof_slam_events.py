"""Decompose the Slam2D per-scan device floor (~1.4 ms) — VERDICT r2 #3.

Methodology (the prof_pf_events pattern: event grouping inside SANE runs;
IRIS_DEBUG_NO_* ablations corrupt the map and confound downstream stages):

1. Per-scan sequential replay with a host sync each scan, recording host
   wall time per scan. Per-scan info scalars (iterations, reorged) stay on
   device and are pulled once at the end.
2. Regress time ~ a + b*iterations within the non-reorg scans: b = the
   per-IRLS-iteration match cost, a = fixed cost (dispatch + raycast +
   deposit + EDT + occupancy + window bookkeeping).
3. Repeat at halved beam count (same world; raycast/deposit scale with
   beams, EDT/window costs do not) and halved l2_max (EDT radius scales,
   the rest does not) to attribute the fixed cost.

Run on the TPU (ambient platform). Times include the ~1-3 ms tunnel
dispatch; the regression intercept carries it identically in every
configuration, so the DELTAS between configurations are the signal.
"""

import json
import time

import numpy as np


def run_config(label, n_beams=720, l2_max=0.5, n_steps=220, reps=2):
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=3,
        laser=simulator.LaserSpec(n_beams=n_beams, max_range=10.0)))
    nb = beam_bucket(n_beams)
    staged = [tuple(jnp.asarray(a) for a in pad_scan(data.clouds[k], nb))
              for k in range(n_steps)]
    opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.1,
                         rot_thresh=0.1, capacity=8192, max_iter=50,
                         l2_max=l2_max)

    best = None
    for rep in range(reps + 1):
        slam = Slam2D(opts)
        slam.set_prior(Pose2D(data.poses_gt[0][0] + rep * 1e-4,
                              data.poses_gt[0][1], data.poses_gt[0][2]))
        slam.update_prepadded(*staged[0], data.odometry[0])
        slam.update_prepadded(*staged[1], data.odometry[1])
        jax.block_until_ready(slam._pose_dev)
        times, infos = [], []
        for k in range(2, n_steps):
            t0 = time.perf_counter()
            if slam.update_prepadded(*staged[k], data.odometry[k]):
                jax.block_until_ready(slam._pose_dev)
                times.append(time.perf_counter() - t0)
                infos.append(slam._last_info_dev)
        if rep == 0:
            continue   # warmup (compiles)
        iters = np.array([int(np.asarray(i["iterations"])) for i in infos])
        reorg = np.array([bool(np.asarray(i["reorged"])) for i in infos])
        t = np.array(times) * 1e3
        sane = ~reorg
        # robust fit: median-of-slopes against iteration count
        A = np.stack([np.ones(sane.sum()), iters[sane]], 1)
        coef, *_ = np.linalg.lstsq(A, t[sane], rcond=None)
        row = dict(label=label, n=int(sane.sum()),
                   med_ms=float(np.median(t[sane])),
                   p10_ms=float(np.percentile(t[sane], 10)),
                   iters_med=float(np.median(iters[sane])),
                   fixed_ms=float(coef[0]),
                   per_iter_ms=float(coef[1]),
                   reorg_n=int(reorg.sum()),
                   reorg_extra_ms=float(
                       np.median(t[reorg]) - np.median(t[sane]))
                   if reorg.any() else 0.0)
        if best is None or row["med_ms"] < best["med_ms"]:
            best = row
    return best


def main():
    out = [
        run_config("base 720 beams l2=0.5"),
        run_config("360 beams", n_beams=360),
        run_config("l2=0.25", l2_max=0.25),
        run_config("180 beams", n_beams=180),
    ]
    for r in out:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

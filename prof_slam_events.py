"""Decompose the Slam2D per-scan device floor (~1.4 ms) — VERDICT r2 #3.

Methodology: whole-run A/B on the production chunked replay (8-scan unroll,
one block at the end), medians over reps — the ONLY trustworthy timing on
the tunnel (CLAUDE.md). A first attempt that blocked per scan measured
25-26 ms/scan in EVERY configuration: block_until_ready pays the ~25 ms
device->host round trip, burying the 1.4 ms device floor (recorded here as
a negative result; per-scan medians in the bench are pipelined, not
blocked).

Stage attribution by config deltas (per-scan ms vs the base config):
* beam sweep (720 -> 360 -> 180): raycast + deposit + per-iteration match
  evaluation all scale with beams;
* l2_max sweep (0.5 -> 0.25 / 1.0): EDT radius-dependent cost (window
  sizes kept IDENTICAL by pinning pose_slack so only the EDT cap moves —
  l2 also widens windows otherwise);
* resolution 0.05 -> 0.1: everything cell-count-driven drops ~4x.
"""

import json
import time

import numpy as np


def run_config(label, n_beams=720, l2_max=0.5, resolution=0.05,
               pose_slack=None, n_steps=220, reps=3):
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
    kw = {}
    if pose_slack is not None:
        kw["pose_slack"] = pose_slack
    opts = Slam2DOptions(resolution=resolution, max_range=10.0,
                         trans_thresh=0.1, rot_thresh=0.1, capacity=8192,
                         max_iter=50, l2_max=l2_max, **kw)

    per_scan = []
    for rep in range(reps + 1):
        slam = Slam2D(opts)
        slam.set_prior(Pose2D(data.poses_gt[0][0] + rep * 1e-4,
                              data.poses_gt[0][1], data.poses_gt[0][2]))
        slam.update_prepadded(*staged[0], data.odometry[0])
        slam.update_prepadded(*staged[1], data.odometry[1])
        jax.block_until_ready(slam._pose_dev)
        t0 = time.perf_counter()
        acc = slam.update_many_prepadded(staged[2:], list(data.odometry)[2:])
        jax.block_until_ready(slam._pose_dev)
        dt = time.perf_counter() - t0
        if rep > 0:
            per_scan.append(dt / len(acc) * 1e3)
    return dict(label=label, per_scan_ms=round(float(np.median(per_scan)), 3),
                reps_ms=[round(x, 3) for x in per_scan])


def main():
    rows = [
        run_config("base 720 beams l2=0.5 res=0.05"),
        run_config("360 beams", n_beams=360),
        run_config("180 beams", n_beams=180),
        # pose_slack pinned so window sizes match base; only EDT cap moves
        # pose_slack 2.5 keeps the resident window/margin equal to base
        # (262 cells); match/update sub-windows shift a few % — deltas are
        # approximate
        run_config("l2=0.25 (~same windows)", l2_max=0.25, pose_slack=2.5),
        run_config("res=0.1 (4x fewer cells)", resolution=0.1),
    ]
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

"""Benchmark: LidarOdometry2D scans/second + pinned drift bound
(VERDICT r3 #6 — the one driver that had no quality-gating bench).

World: the feature-rich office loop (odometry-free scan-to-local-map
tracking is well-posed there; the 550 m corridor world is the documented
known-hard case — 13.5 m drift / 100 m, recorded in docs/STATUS.md, not
asserted). Prints one JSON line like bench.py.

reference: src/lidar_odometry_2d.cpp:59-81 (update loop).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    if os.environ.get("IRIS_BENCH_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["IRIS_BENCH_PLATFORM"])
    import jax.numpy as jnp

    from iris_lama_tpu.algos.lidar_odometry_2d import (
        LidarOdometry2D, LidarOdometry2DOptions)
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    # 1600 steps / smoothed corners: ~0.05 m stride (a 10 Hz lidar at
    # 0.5 m/s) with bounded heading rate. The raw polyline turns 90
    # degrees in one step at waypoint corners — no odometry-free tracker
    # can follow that (measured 76 m/100m = lost lock at the first
    # corner); smoothing is what a real robot's trajectory looks like.
    # Backend note (r4, prof_r4_lidar2): per-step results agree across
    # TPU/CPU to ~1 ulp from a common state; observed drift DIFFERENCES
    # between backends/runs are chaotic corner sensitivity of the
    # prior-less tracker, not a numeric defect — hence the median-drift
    # gate below.
    n_steps = 1600
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=3, smooth=4,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))

    nb = beam_bucket(720)
    staged = []
    for k in range(n_steps):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))
    jax.block_until_ready(staged[-1][0])

    # IRIS_LIDAR_PRED=1: opt-in constant-velocity match seeding A/B
    # (VERDICT r4 #9 stabilizer candidate; default OFF = reference parity).
    # A/B RECORDED (r5): prediction is a NEGATIVE — it speeds matching
    # (1087 vs 873 scans/s: better seeds, fewer IRLS trips) but WORSENS
    # drift on this marginally-stable prior-less tracker (median 23.5 vs
    # 4.6 m/100 m with the extrapolation clamp; unclamped it NaN'd 3/5
    # reps via empty-window singular solves). The corner-lottery chaos
    # (prof_r4_lidar2) flips against any seed perturbation; OFF stays
    # the default and the right choice, not just the parity choice.
    opts = LidarOdometry2DOptions(
        resolution=0.05, max_range=10.0, capacity=4096,
        motion_prediction=os.environ.get("IRIS_LIDAR_PRED") == "1")

    # ground truth relative to the start pose (odometry-free estimate
    # lives in the first scan's frame)
    g0 = Pose2D(*data.poses_gt[0])
    rel_gt = np.asarray([(g0 - Pose2D(*data.poses_gt[k])).xyr()
                         for k in range(n_steps)])
    path_len = float(np.sum(np.linalg.norm(
        np.diff(rel_gt[:, :2], axis=0), axis=1)))

    def run_once(rep=0):
        lo = LidarOdometry2D(opts)
        # rep-perturbed first scan origin: no two reps replay
        # value-identical dispatch sequences (tunnel dispatch cache)
        p0, m0, o0 = staged[0]
        lo.update_prepadded(p0 + rep * 1e-4, m0, o0, 0.0)
        jax.block_until_ready(lo._pose_dev)
        t0 = time.perf_counter()
        for k in range(1, n_steps):
            lo.update_prepadded(*staged[k], data.timestamps[k])
        jax.block_until_ready(lo._pose_dev)
        elapsed = time.perf_counter() - t0
        est = lo.trajectory()
        err = np.linalg.norm(est[:, :2] - rel_gt[:len(est), :2], axis=1)
        drift = float(err[-1]) / max(path_len, 1e-9) * 100.0
        return (n_steps - 1) / elapsed, drift, float(err[-1])

    reps = 1 if jax.default_backend() == "cpu" else 5
    run_once(rep=9)   # warmup: compiles every program, discarded
    results = [run_once(rep=r) for r in range(reps)]
    results.sort()
    sps, _, final_err = results[len(results) // 2]
    # gate on the MEDIAN drift across reps: the tracker is marginally
    # stable at corners (no motion prior — reference parity,
    # lidar_odometry_2d.cpp:59-81) and single-rep drift varies
    # chaotically with ulp-level prior perturbations (measured
    # [4.6, 28.4, 4.6, 4.6, 4.6] in one invocation; cross-backend
    # single-step results agree to 1 ulp — prof_r4_lidar2)
    drifts = sorted(r[1] for r in results)
    drift = drifts[len(drifts) // 2]
    bound = 2.0 if jax.default_backend() == "cpu" else 8.0
    assert drift < bound, \
        f"LidarOdometry2D drift regression: {drift:.3f} m/100m"
    # flag (don't fail on) diverged reps: any rep whose drift exceeds 3x
    # the median is a corner-lottery divergence of the prior-less tracker
    # (VERDICT r4 #9 — surfaced explicitly instead of hidden by the median)
    diverged = [round(d, 3) for d in drifts if d > 3.0 * max(drift, 1e-9)]
    if diverged:
        print(f"# WARNING: {len(diverged)}/{len(drifts)} rep(s) diverged "
              f"(drift > 3x median {drift:.2f}): {diverged}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "lidar_odometry_scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 2),
        "extra": {"drift_m_per_100m": round(drift, 4),
                  "final_err_m": round(final_err, 4),
                  "path_len_m": round(path_len, 1),
                  "scans": n_steps,
                  "reps": [round(r[0], 2) for r in results],
                  "best": round(max(r[0] for r in results), 2),
                  "spread": round(max(r[0] for r in results)
                            / max(min(r[0] for r in results), 1e-9), 2),
                  # per-rep drifts: the tracker is marginally stable at
                  # corners (reference algorithm property — no motion
                  # prior, lidar_odometry_2d.cpp:59-81), so the realized
                  # drift varies chaotically with ulp-level perturbations
                  "drifts": [round(r[1], 3) for r in results],
                  "diverged_reps": diverged,
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    sys.exit(main())

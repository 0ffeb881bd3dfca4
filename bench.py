"""Benchmark: Slam2D scans/second on the synthetic office world.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline point (BASELINE.md): the reference runs real-time on a Raspberry Pi
3B+ — i.e. ~10 scans/s at typical lidar rate. Target is >= 10x that per
chip, so vs_baseline = scans_per_sec / 10.0.

Robustness: the measurement runs in a child process with a hard timeout —
a wedged TPU tunnel (see CLAUDE.md) otherwise hangs unkillably inside the
axon client. On timeout the parent re-measures on CPU and says so in the
output rather than printing nothing.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

CHILD_ENV = "IRIS_LAMA_BENCH_CHILD"
CHILD_TIMEOUT_S = 1800   # cold remote compiles legitimately take ~15 min


def run_measurement():
    import jax
    if os.environ.get(CHILD_ENV) == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.evaluation import ate_rmse

    # 440 steps (r3, was 220): with the host-gated step at ~1 ms/scan a
    # 218-update rep lasted ~0.3 s — short enough that a single tunnel
    # hiccup dragged the rep 2-3x. Twice the updates halves the noise
    # exposure; the world/gate/quality are unchanged (the loop route is
    # just sampled twice as densely, still ~0.2 m strides at the gate).
    n_steps = 440
    sim_cfg = simulator.SimConfig(
        n_steps=n_steps, seed=3,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0))
    data = simulator.simulate(sim_cfg)

    import jax
    import jax.numpy as jnp
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    # gate halved with the stride (440-step sampling): ~437 accepted
    # updates instead of 218 — double the timed region per rep
    opts = Slam2DOptions(resolution=0.05, max_range=10.0,
                         trans_thresh=0.05, rot_thresh=0.05,
                         capacity=8192, max_iter=50)

    # stage all scans on device up-front (offline-log preprocessing)
    nb = beam_bucket(720)
    staged = []
    for k in range(n_steps):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))
    jax.block_until_ready(staged[-1][0])

    # Default: chunked replay with straight-line 8-scan unroll programs.
    # Same-day 5-rep A/B (r2): unroll median 552 scans/s (min 434) vs
    # sequential median 402-520 (min 276) — best reps tie at ~711-781
    # (the per-scan device floor, ~1.4 ms), but 8x fewer dispatches cuts
    # the exposure to tunnel per-dispatch latency noise that drags the
    # median. IRIS_SLAM_BENCH_CHUNK=0 measures the per-scan driver.
    chunked = os.environ.get("IRIS_SLAM_BENCH_CHUNK", "1") == "1"

    def run_trajectory(rep=0, passes=1):
        """One rep = ``passes`` fresh-map full-log replays, ONE summed
        timed region (VERDICT r4 #3 weather-proofing: a single 437-update
        pass lasts ~0.5 s, short enough that one ~100 ms tunnel hiccup
        drags the rep 25%; three fresh-map passes per rep triple the
        timed region, the same fix that stabilized bench_loc in r4 —
        each pass rebuilds the map from scratch so the workload stays
        honest SLAM, not localization on a built map). Default path:
        chunked replay with straight-line 8-scan unroll programs (8x
        fewer dispatches at per-scan buffer-aliasing structure — r2
        medians 552 vs 515 sequential, min 434 vs 276). The lax.scan+cond
        chunk body is the one that loses (~405 vs 520 — conservative
        buffer copies of the carried map state; IRIS_SLAM_CHUNK_MODE=scan
        to A/B), and IRIS_SLAM_BENCH_CHUNK=0 measures the per-scan
        driver. Device programs are lru-cached across reps, the state is
        chained + donated (prof13 methodology), and the prior is
        perturbed per pass (0.1 mm — invisible in ATE) so no two passes
        replay value-identical dispatch sequences."""
        total_elapsed, total_updates = 0.0, 0
        for p in range(passes):
            slam = Slam2D(opts)
            slam.set_prior(Pose2D(
                data.poses_gt[0][0] + (rep * 7 + p) * 1e-4,
                data.poses_gt[0][1], data.poses_gt[0][2]))
            # first two updates: compile (warmup) / cache-hit; also warms
            # the first resident-window re-org before the timed region
            slam.update_prepadded(*staged[0], data.odometry[0],
                                  data.timestamps[0])
            slam.update_prepadded(*staged[1], data.odometry[1],
                                  data.timestamps[1])
            jax.block_until_ready(slam._pose_dev)

            gt = []
            t0 = time.perf_counter()
            if chunked:
                accepted = slam.update_many_prepadded(
                    staged[2:], list(data.odometry)[2:])
                n_updates = len(accepted)
                gt = [data.poses_gt[2 + k] for k in accepted]
            else:
                n_updates = 0
                for k in range(2, n_steps):
                    if slam.update_prepadded(*staged[k], data.odometry[k],
                                             data.timestamps[k]):
                        n_updates += 1
                        gt.append(data.poses_gt[k])
            jax.block_until_ready(slam._pose_dev)
            total_elapsed += time.perf_counter() - t0
            total_updates += n_updates
        est = slam.trajectory()[-len(gt):]
        ate = ate_rmse(np.asarray(est), np.asarray(gt))
        return total_updates / total_elapsed, ate, total_updates

    # median of in-process repetitions: a single-shot capture is exposed to
    # tunnel drift / one slow dispatch (BENCH_r01 measured 497 while
    # interleaved medians gave ~725-775); rep 0 carries all remote
    # compilation and is discarded as warmup. Expected in-invocation rep
    # spread with 3-pass reps: < 1.5x (was up to 2.5x with single-pass
    # reps — BENCH_r04's 330-819); cross-invocation "tunnel weather" can
    # still move the median day-to-day (documented ~1.5x, CLAUDE.md).
    on_cpu = os.environ.get(CHILD_ENV) == "cpu"
    reps = 1 if on_cpu else int(os.environ.get("IRIS_BENCH_REPS", "5"))
    passes = 1 if on_cpu else int(os.environ.get("IRIS_BENCH_PASSES", "3"))
    run_trajectory(rep=9)  # warmup (compiles every program shape)
    results = [run_trajectory(rep=r, passes=passes) for r in range(reps)]
    results.sort()
    scans_per_sec, ate, n_updates = results[len(results) // 2]
    rep_vals = [r[0] for r in results]

    # pinned quality (VERDICT r2 #6): measured 3.7 mm; fails on 3x drift
    assert ate < 0.012, f"Slam2D ATE regression: {ate:.4f} m"

    print(json.dumps({
        "metric": "slam2d_scans_per_sec",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 10.0, 2),
        "extra": {
            "ate_m": round(ate, 4),
            "updates": n_updates,
            "beams": 720,
            "resolution": 0.05,
            "reps": [round(v, 2) for v in rep_vals],
            "best": round(max(rep_vals), 2),
            "spread": round(max(rep_vals) / max(min(rep_vals), 1e-9), 2),
            "passes_per_rep": passes,
            "device": str(jax.devices()[0]),
        },
    }), flush=True)


def main():
    if os.environ.get(CHILD_ENV):
        return run_measurement()

    # parent: child with a hard timeout, CPU fallback on hang/failure.
    # A wedged tunnel attempt leaves the axon pool lease claimed for
    # ~10-20 min after the kill (CLAUDE.md) — one cooled-down ambient
    # retry recovers the TPU capture instead of dooming it to CPU.
    attempts = (("ambient", CHILD_TIMEOUT_S, 0),
                ("ambient", 1200,
                 int(os.environ.get("IRIS_BENCH_COOLDOWN_S", "600"))),
                ("cpu", CHILD_TIMEOUT_S, 0))
    for platform, timeout_s, cooldown_s in attempts:
        if cooldown_s:
            time.sleep(cooldown_s)
        env = dict(os.environ)
        env[CHILD_ENV] = platform
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout_s)
            lines = [l for l in out.stdout.splitlines()
                     if l.startswith("{")]
            if lines:
                print(lines[-1], flush=True)
                return 0
        except subprocess.TimeoutExpired:
            pass
        print(f"# bench on {platform} platform failed/hung; "
              f"falling back", file=sys.stderr, flush=True)
    print(json.dumps({"metric": "slam2d_scans_per_sec", "value": 0.0,
                      "unit": "scans/s", "vs_baseline": 0.0,
                      "extra": {"error": "all platforms failed"}}),
          flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())

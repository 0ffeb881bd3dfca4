"""Probe (r4): bit-level bisect of the lidar TPU-vs-CPU quality gap.

Runs the TPU driver to just before the first corner (step 140 of the
0.1 m-stride office log), then from that COMMON state executes the next
steps' pieces on BOTH backends and diffs:
  1. the gathered match window (pool -> dense grid)
  2. the scan-match solve (state, iterations, chi2)
  3. one map update (occupancy counts / distance field)

Needs both platforms in one process: jax_platforms is widened to
"axon,cpu" before the first backend use.
"""

import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "axon,cpu")
    import jax.numpy as jnp

    from iris_lama_tpu.algos.lidar_odometry_2d import (
        LidarOdometry2D, LidarOdometry2DOptions)
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.match import match_surface_2d as match
    from iris_lama_tpu.nlls.solver import SolverOptions
    from iris_lama_tpu.nlls.robust import CAUCHY_SCAN
    from iris_lama_tpu.sdm import mapping, window as win_mod
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print("devices:", tpu, cpu)

    n_pre = 140
    data = simulator.simulate(simulator.SimConfig(
        n_steps=200, seed=3, smooth=3,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    nb = beam_bucket(720)
    staged = [pad_scan(c, nb) for c in data.clouds]

    opts = LidarOdometry2DOptions(resolution=0.05, max_range=10.0,
                                  capacity=4096)
    lo = LidarOdometry2D(opts)
    for k in range(n_pre):
        lo.update_prepadded(jnp.asarray(staged[k][0]),
                            jnp.asarray(staged[k][1]),
                            jnp.asarray(staged[k][2]), float(k) * 0.1)
    jax.block_until_ready(lo._pose_dev)

    # pull the COMMON state to host
    state_h = jax.tree.map(np.asarray, lo.map)
    pose_h = np.asarray(lo._pose_dev)
    cfg = lo.cfg
    geo = cfg.geometry
    sopts = SolverOptions(max_iterations=opts.max_iter, strategy="gn",
                          robust=CAUCHY_SCAN)
    wp = cfg.window_patches
    max_dist = cfg.distance.max_dist

    def run_on(dev, k_scan):
        # the s8/pallas path selectors consult jax.default_backend() at
        # TRACE time (it answers "tpu" under axon even for ops placed on
        # the cpu device) — pin it to the leg's platform so the CPU leg
        # traces the jnp paths it would use in a real CPU process
        real_backend = jax.default_backend
        jax.default_backend = lambda: dev.platform
        state = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), dev),
                             state_h)
        pose_prev = jax.device_put(jnp.asarray(pose_h), dev)
        pts = jax.device_put(jnp.asarray(staged[k_scan][0]), dev)
        msk = jax.device_put(jnp.asarray(staged[k_scan][1]), dev)
        org3 = jax.device_put(jnp.asarray(staged[k_scan][2]), dev)

        @jax.jit
        def piece(state, pose_prev, pts, msk, org3):
            org = win_mod.window_org(geo, geo.w2m(pose_prev[:2]), wp)
            keys = win_mod.window_patch_keys(geo, org, wp)
            grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                            max_dist)
            res = match.solve_window(grid, org, geo, max_dist,
                                     pts[:, :2], msk, pose_prev, sopts)
            new_state, _ = mapping.update_maps(state, cfg, res.state, pts,
                                               msk, org3)
            return (grid, res.state, res.iterations, res.chi2,
                    new_state.dist, new_state.occupied)

        try:
            out = piece(state, pose_prev, pts, msk, org3)
            out = jax.tree.map(np.asarray, out)
        finally:
            jax.default_backend = real_backend
        return out

    for k_scan in (n_pre, n_pre + 5, n_pre + 10):
        t = run_on(tpu, k_scan)
        c = run_on(cpu, k_scan)
        gdiff = np.abs(t[0] - c[0])
        sdiff = np.abs(t[1] - c[1])
        ddiff = np.abs(t[4].astype(np.float64) - c[4].astype(np.float64))
        odiff = np.abs(t[5].astype(np.int64) - c[5].astype(np.int64))
        print(f"scan {k_scan}: window max|d| {gdiff.max():.3e} "
              f"state diff {sdiff} iters {int(t[2])}/{int(c[2])} "
              f"chi2 {float(t[3]):.6f}/{float(c[3]):.6f}")
        print(f"          dist-field max|d| {ddiff.max():.3e} "
              f"(n>1e-6: {(ddiff > 1e-6).sum()})  occ max|d| "
              f"{odiff.max()} (n!=0: {(odiff != 0).sum()})")


if __name__ == "__main__":
    sys.exit(main())

"""Probe: Loc2D IRLS iteration counts over the bench_loc workload.

Iteration counts are deterministic given the data — a noise-free A/B
signal across commits (unlike tunnel wall-clock). Runs on CPU.
"""

import os
import sys

import numpy as np


def main():
    import jax
    # env vars are too late — sitecustomize already imported jax (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from iris_lama_tpu.algos.loc2d import Loc2D, Loc2DOptions, maps_from_slam
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.core import lie
    from iris_lama_tpu.match import match_surface_2d as match
    from iris_lama_tpu.nlls import solver as nlls_solver
    from iris_lama_tpu.sdm import window as win_mod
    from iris_lama_tpu.utils import simulator

    n_steps = 60
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=7,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))

    slam = Slam2D(Slam2DOptions(resolution=0.05, max_range=10.0,
                                trans_thresh=0.2, rot_thresh=0.2,
                                capacity=8192))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_steps):
        slam.update(data.clouds[k], data.odometry[k], data.timestamps[k])

    loc = Loc2D(Loc2DOptions(resolution=0.05, l2_max=0.5, max_range=10.0,
                             trans_thresh=0.1, rot_thresh=0.1),
                maps=maps_from_slam(slam.map, slam.cfg))
    loc.set_prior(Pose2D(*data.poses_gt[0]))
    loc._build()

    opts = loc.options
    geo, maps, dcfg = loc.geo, loc.maps, loc.dcfg
    max_dist = dcfg.max_dist
    sopts = opts.solver_options()
    import math as _math
    half_cells = ((opts.max_range + 2.0) * geo.scale + dcfg.radius_cells)
    wp = 2 * (int(_math.ceil(half_cells / geo.patch_length)) + 1)

    def solve_iters(pose0, pts, msk):
        org = win_mod.window_org(geo, geo.w2m(pose0[:2]), wp)
        keys = win_mod.window_patch_keys(geo, org, wp)
        grid, _ = win_mod.gather_window(maps.distance.table,
                                        maps.distance.dist, keys, max_dist)
        to_sq = getattr(dcfg, "dist_to_sq", None)
        if to_sq is not None and os.environ.get("PROBE_F32") != "1":
            grid = to_sq(grid)
        eval_fn = match.make_window_eval(grid, org, geo, max_dist, pts, msk)
        res = nlls_solver.solve(eval_fn, match.update_state, pose0, sopts)
        return res.state, res.iterations, res.chi2

    solve_iters = jax.jit(solve_iters)

    from iris_lama_tpu.utils.cloud import pad_scan
    pose = jnp.asarray(Pose2D(*data.poses_gt[0]).se2_array())
    odom = Pose2D(*data.odometry[0].xyr()) if hasattr(
        data.odometry[0], "xyr") else data.odometry[0]
    prev_odom = data.odometry[0]
    iters_all = []
    for k in range(1, n_steps):
        odelta = prev_odom - data.odometry[k]
        prev_odom = data.odometry[k]
        pose0 = lie.se2_compose(pose, jnp.asarray(odelta.se2_array()))
        points, mask, _ = pad_scan(data.clouds[k], 768)
        pts = jnp.asarray(points[:, :2])
        msk = jnp.asarray(mask)
        pose, it, chi2 = solve_iters(pose0, pts, msk)
        iters_all.append(int(it))

    a = np.asarray(iters_all)
    print({"mean_iters": round(float(a.mean()), 2),
           "max": int(a.max()), "min": int(a.min()),
           "n_at_cap": int((a >= sopts.max_iterations).sum()),
           "hist": np.bincount(np.clip(a, 0, 100)).tolist()})


if __name__ == "__main__":
    sys.exit(main())

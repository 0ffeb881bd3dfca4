"""VERDICT r4 #7: per-driver device-time budget table via utils/devprof.

For each driver's hot program: steady-state on-device ms (median of 4
varied invocations) + the top fusions. Output feeds docs/STATUS.md's
budget/roofline table. Run on the TPU: python prof_r5_budget.py
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator, devprof
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    n_steps = 60
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    nb = beam_bucket(720)
    p, m, o = (jnp.asarray(a) for a in pad_scan(data.clouds[-1], nb))

    def show(tag, ms, rows):
        print(f"\n== {tag}: {ms:.3f} ms device ==")
        for name, t in rows[:8]:
            if not name.startswith("jit_"):
                print(f"  {t:8.3f} ms  {name[:90]}")
        sys.stdout.flush()

    # ---- Slam2D fused step -------------------------------------------------
    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    slam = Slam2D(Slam2DOptions(resolution=0.05, max_range=10.0,
                                trans_thresh=0.05, rot_thresh=0.05,
                                capacity=8192, max_iter=50))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_steps):
        slam.update(data.clouds[k], data.odometry[k], data.timestamps[k])
    jax.block_until_ready(slam._pose_dev)

    def slam_step(k):
        od = jnp.asarray(np.array([1e-5 * (k % 89), 0.08, 1.0, 0.0],
                                  np.float32))
        slam._do_step_od(od, p, m, o)
        return slam._pose_dev

    ms = devprof.device_time_ms(lambda k: slam_step(int(k)),
                                lambda k: (k,), n=4)
    rows = devprof.device_breakdown(lambda k: slam_step(int(k)),
                                    lambda k: (k,), n=2, top=10)
    show("Slam2D step (720 beams, 5 cm)", ms, rows)

    # ---- PF 30p fused update ----------------------------------------------
    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    pf = PFSlam2D(PFSlam2DOptions(particles=30, resolution=0.05,
                                  max_range=10.0, trans_thresh=0.25,
                                  rot_thresh=0.25, capacity=2048,
                                  max_iter=50, seed=11))
    pf.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_steps):
        pf.update(data.clouds[k], data.odometry[k], data.timestamps[k])
    jax.block_until_ready(pf.pset.pose)
    state = {"pset": pf.pset, "key": pf.key}

    def pf_step(k):
        od = jnp.asarray(np.array([[1e-5 * (k % 97), 0.3, 1.0, 0.0]],
                                  np.float32))
        valids = jnp.asarray(np.array([True]))
        new_pset, info, key = pf._jit_update(state["pset"], state["key"],
                                             od, valids, p, m, o)
        state["pset"], state["key"] = new_pset, key
        return new_pset.pose

    ms = devprof.device_time_ms(lambda k: pf_step(int(k)),
                                lambda k: (k,), n=4)
    rows = devprof.device_breakdown(lambda k: pf_step(int(k)),
                                    lambda k: (k,), n=2, top=10)
    show("PFSlam2D update (30 particles)", ms, rows)

    # ---- Loc2D fused update ------------------------------------------------
    from iris_lama_tpu.algos.loc2d import Loc2D, Loc2DOptions, maps_from_slam
    loc = Loc2D(Loc2DOptions(resolution=0.05, max_range=10.0,
                             trans_thresh=0.05, rot_thresh=0.05))
    loc.set_maps(maps_from_slam(slam.map, slam.cfg))
    loc.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_steps):
        loc.update(data.clouds[k], data.odometry[k], data.timestamps[k])
    jax.block_until_ready(loc._pose_dev)

    def loc_step(k):
        loc.odom_ = Pose2D()   # keep the gate open with a fixed odelta
        loc.update(data.clouds[-1],
                   Pose2D(-0.08 - 1e-5 * (k % 83), 0.0, 0.0))
        return loc._pose_dev

    ms = devprof.device_time_ms(lambda k: loc_step(int(k)),
                                lambda k: (k,), n=4)
    rows = devprof.device_breakdown(lambda k: loc_step(int(k)),
                                    lambda k: (k,), n=2, top=10)
    show("Loc2D step", ms, rows)

    # ---- LidarOdometry2D fused step ---------------------------------------
    from iris_lama_tpu.algos.lidar_odometry_2d import (LidarOdometry2D,
                                                       LidarOdometry2DOptions)
    lo = LidarOdometry2D(LidarOdometry2DOptions(resolution=0.05,
                                                max_range=10.0,
                                                capacity=4096))
    for k in range(n_steps):
        lo.update(data.clouds[k], data.timestamps[k])
    jax.block_until_ready(lo._pose_dev)

    def lo_step(k):
        lo.update_prepadded(p + jnp.float32(k % 71) * 1e-5, m, o, 0.0)
        return lo._pose_dev

    ms = devprof.device_time_ms(lambda k: lo_step(int(k)),
                                lambda k: (k,), n=4)
    rows = devprof.device_breakdown(lambda k: lo_step(int(k)),
                                    lambda k: (k,), n=2, top=10)
    show("LidarOdometry2D step", ms, rows)


if __name__ == "__main__":
    sys.exit(main())

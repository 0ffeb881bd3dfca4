"""Probe: compiled-HLO op histograms for the per-scan step vs the chunked
scan program (axon remote compile). Greps the optimized module for the op
kinds that could explain the chunk slowdown (copies, conditionals,
loop-invariant hoisting failures, Pallas custom-calls)."""

import collections
import re


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    n_steps = 4
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=3,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    opts = Slam2DOptions(resolution=0.05, max_range=10.0, trans_thresh=0.1,
                         rot_thresh=0.1, capacity=8192, max_iter=50)
    nb = beam_bucket(720)
    staged = []
    for k in range(n_steps):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))

    slam = Slam2D(opts)
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    slam.update_prepadded(*staged[0], data.odometry[0])
    slam.update_prepadded(*staged[1], data.odometry[1])

    # lower both programs with the live state
    od = jnp.asarray((data.odometry[1] - data.odometry[2])
                     .se2_array().astype('float32'))
    step_l = slam._step.lower(slam._map, slam._res_org, slam._res_occ,
                              slam._res_vis, slam._res_dist, slam._pose_dev,
                              od, *staged[2], slam._traj, jnp.int32(2))
    C = 32
    odc = jnp.broadcast_to(od, (C, 4))
    ptsc = jnp.broadcast_to(staged[2][0], (C,) + staged[2][0].shape)
    mskc = jnp.broadcast_to(staged[2][1], (C,) + staged[2][1].shape)
    orgc = jnp.broadcast_to(staged[2][2], (C, 3))
    dos = jnp.ones((C,), bool)
    chunk_l = slam._chunk.lower(slam._map, slam._res_org, slam._res_occ,
                                slam._res_vis, slam._res_dist,
                                slam._pose_dev, slam._traj, jnp.int32(2),
                                odc, ptsc, mskc, orgc, dos)

    for name, low in (("step", step_l), ("chunk", chunk_l)):
        try:
            txt = low.compile().as_text()
        except Exception as e:  # noqa: BLE001
            print(name, "compile/as_text failed:", repr(e)[:200])
            continue
        ops = collections.Counter()
        big_copies = 0
        for m in re.finditer(r"= (\S+?)\[?\(", txt):
            pass
        for line in txt.splitlines():
            m = re.search(r"= *(?:\([^)]*\) )?([a-z0-9\[\]x_\-]+) "
                          r"([a-z\-]+)\(", line)
            if m:
                ops[m.group(2)] += 1
                if m.group(2) == "copy":
                    sm = re.search(r"= *([a-z0-9]+)\[([0-9,]+)\]", line)
                    if sm:
                        n = 1
                        for d in sm.group(2).split(","):
                            n *= int(d)
                        if n > 1 << 20:
                            big_copies += 1
        top = ops.most_common(25)
        print(name, "total_lines", len(txt.splitlines()),
              "big_copies(>1M elems)", big_copies, flush=True)
        print(name, dict(top), flush=True)


if __name__ == "__main__":
    main()

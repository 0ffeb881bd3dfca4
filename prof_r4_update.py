"""Probe (r4): ON-DEVICE breakdown of the PF fused update program (the
flat ~10.7 ms/update the segment probe measured) and the re-org program,
via jax.profiler (works over the tunnel — real per-fusion device times).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.devprof import _jit_events
    import glob
    import gzip
    import json
    import tempfile
    import os as _os

    data = simulator.simulate(simulator.SimConfig(
        n_steps=60, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    opts = PFSlam2DOptions(particles=30, resolution=0.05, max_range=10.0,
                           trans_thresh=0.25, rot_thresh=0.25,
                           capacity=2048, max_iter=50, seed=11)
    pf = PFSlam2D(opts)
    pf.set_prior(Pose2D(*data.poses_gt[0]))
    for i in range(40):
        pf.update(data.clouds[i], data.odometry[i], data.timestamps[i])
    jax.block_until_ready(pf.pset.pose)

    rows = []
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(40, 50):
                pf.update(data.clouds[i], data.odometry[i],
                          data.timestamps[i])
            jax.block_until_ready(pf.pset.pose)
        for path in glob.glob(_os.path.join(td, "**", "*.trace.json.gz"),
                              recursive=True):
            with gzip.open(path) as f:
                d = json.load(f)
            for e in d.get("traceEvents", []):
                n = str(e.get("name", ""))
                if e.get("dur") and not n.startswith("$"):
                    rows.append((n, e["dur"] / 1e3))

    # aggregate by name
    agg = {}
    cnt = {}
    for n, ms in rows:
        agg[n] = agg.get(n, 0.0) + ms
        cnt[n] = cnt.get(n, 0) + 1
    total = sorted(agg.items(), key=lambda kv: -kv[1])
    print("== total device ms over 10 updates (count x mean) ==")
    for n, ms in total[:28]:
        print(f"{ms:9.2f} ms  x{cnt[n]:3d}  {n[:80]}")


if __name__ == "__main__":
    sys.exit(main())

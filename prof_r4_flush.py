"""Probe (r4): AGGREGATED device breakdown of the PF re-org flush
(10.6 ms device, long tail — is it the insert claim rounds or the
window scatters?)."""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.sdm import mapping
    from iris_lama_tpu.utils import simulator
    import glob
    import gzip
    import json
    import tempfile
    import os as _os

    data = simulator.simulate(simulator.SimConfig(
        n_steps=40, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    opts = PFSlam2DOptions(particles=30, resolution=0.05, max_range=10.0,
                           trans_thresh=0.25, rot_thresh=0.25,
                           capacity=2048, max_iter=50, seed=11)
    pf = PFSlam2D(opts)
    pf.set_prior(Pose2D(*data.poses_gt[0]))
    for i in range(40):
        pf.update(data.clouds[i], data.odometry[i], data.timestamps[i])
    pf._flush_motion()
    pset = pf.pset
    jax.block_until_ready(pset.pose)
    cfg = opts.mapping_config()

    @jax.jit
    def flush(pset, bump):
        maps = jax.tree.map(lambda a: a[pset.lineage], pset.maps)
        maps = jax.vmap(
            lambda m, o, v, d: mapping.resident_flush(
                m, cfg, pset.res_org, o, v, d)
        )(maps, pset.res_occ, pset.res_vis + bump, pset.res_dist)
        return maps.table.overflow

    out = flush(pset, jnp.uint16(9))
    jax.block_until_ready(out)
    rows = []
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            outs = [flush(pset, jnp.uint16(k)) for k in range(2)]
            jax.block_until_ready(outs)
        for path in glob.glob(_os.path.join(td, "**", "*.trace.json.gz"),
                              recursive=True):
            with gzip.open(path) as f:
                d = json.load(f)
            for e in d.get("traceEvents", []):
                n = str(e.get("name", ""))
                if e.get("dur") and not n.startswith("$"):
                    rows.append((n, e["dur"] / 1e3))
    agg, cnt = {}, {}
    for n, ms in rows:
        # bucket by op family
        fam = n.split(".")[0].split("(")[0]
        agg[fam] = agg.get(fam, 0.0) + ms
        cnt[fam] = cnt.get(fam, 0) + 1
    for n, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:16]:
        print(f"{ms:9.2f} ms  x{cnt[n]:4d}  {n[:70]}")


if __name__ == "__main__":
    sys.exit(main())

"""Probe (r4): why do the SAME-shape pool row gathers cost 0.13 ms on
synthetic arrays (prof_r4_gather) but ~35 ms inside resident_gather
(prof_r4_reorg g_rows)?

Variants, all on the REAL post-run particle state:
  fed      — gather with slots fed as a jit input (no lookup inside)
  comp     — gather with slots computed by table_lookup inside (the real
             structure)
  fedsyn   — synthetic arrays, fed slots (sanity repeat of prof_r4_gather)
  occonly  — real occ array only, fed slots
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.sdm import pool as pool_mod, window as win_mod
    from iris_lama_tpu.utils import simulator

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
    geo = cfg.geometry
    wp = cfg.resident_window_patches
    keys0 = win_mod.window_patch_keys(geo, np.asarray(pset.res_org), wp)

    slots0 = jax.jit(jax.vmap(
        lambda m: pool_mod.table_lookup(m.table, keys0)))(pset.maps)
    jax.block_until_ready(slots0)

    P = 30
    CAP = pset.maps.occupied.shape[0 + 1] if pset.maps.occupied.ndim == 4 \
        else pset.maps.occupied.shape[0]
    occ, vis, dist = pset.maps.occupied, pset.maps.visited, pset.maps.dist
    print("pool array shapes/dtypes:", occ.shape, occ.dtype, vis.dtype,
          dist.shape, dist.dtype, "slots", slots0.shape)

    def summed(o, v, d):
        return (jnp.sum(o.astype(jnp.int32)) + jnp.sum(v.astype(jnp.int32))
                + jnp.sum(d))

    def fed(occ, vis, dist, slots, bump):
        slots = jnp.where(slots >= 0, slots, occ.shape[1] - 1)
        slots = (slots + bump * 0)   # value dependency only

        def one(o, v, d, s):
            sf = s.reshape(-1)
            return o[sf], v[sf], d[sf]

        os_, vs_, ds_ = jax.vmap(one)(occ, vis, dist, slots)
        return summed(os_, vs_, ds_) + bump

    def comp(occ, vis, dist, tables, bump):
        keys = keys0 + bump * 0

        def one(o, v, d, t):
            slots = pool_mod.table_lookup(t, keys)
            sf = jnp.where(slots >= 0, slots, o.shape[0] - 1).reshape(-1)
            return o[sf], v[sf], d[sf]

        os_, vs_, ds_ = jax.vmap(one)(occ, vis, dist, tables)
        return summed(os_, vs_, ds_) + bump

    def occonly(occ, vis, dist, slots, bump):
        slots = jnp.where(slots >= 0, slots, occ.shape[1] - 1)

        def one(o, s):
            return o[s.reshape(-1)]

        os_ = jax.vmap(one)(occ, slots)
        return jnp.sum(os_.astype(jnp.int32)) + bump

    rng = np.random.default_rng(0)
    socc = jnp.asarray(rng.integers(0, 60000, occ.shape), occ.dtype)
    svis = jnp.asarray(rng.integers(0, 60000, vis.shape), vis.dtype)
    sdist = jnp.asarray(rng.uniform(0, 0.5, dist.shape), dist.dtype)
    # identical PROGRAM as "fed", random index content: isolates whether
    # gather wall time depends on the runtime index distribution
    rslots = jnp.asarray(rng.integers(0, 2048, slots0.shape), jnp.int32)
    # real missing-mask but missing spread over DISTINCT rows
    spread = jnp.arange(slots0.shape[-1] * slots0.shape[-2],
                        dtype=jnp.int32).reshape(slots0.shape[-2:]) % 2048
    sspread = jnp.where(slots0 >= 0, slots0, spread[None])

    K = 4
    runs = [
        ("fed", fed, (occ, vis, dist, slots0)),
        ("fedrand", fed, (occ, vis, dist, rslots)),
        ("fedspread", fed, (occ, vis, dist, sspread)),
        ("comp", comp, (occ, vis, dist, pset.maps.table)),
        ("fedsyn", fed, (socc, svis, sdist, slots0)),
        ("occonly", occonly, (occ, vis, dist, slots0)),
    ]
    for name, fn, args in runs:
        j = jax.jit(fn)
        out = j(*args, jnp.int32(99))
        jax.block_until_ready(out)
        meds = []
        for rep in range(3):
            t0 = time.perf_counter()
            outs = [j(*args, jnp.int32(rep * K + k)) for k in range(K)]
            jax.block_until_ready(outs[-1])
            meds.append((time.perf_counter() - t0) / K * 1e3)
        print(f"{name:8s} {sorted(meds)[1]:8.2f} ms/call "
              f"(reps {' '.join(f'{m:.1f}' for m in meds)})")


if __name__ == "__main__":
    sys.exit(main())

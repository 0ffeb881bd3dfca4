"""Probe (r4): decompose the PF re-org program (~100 ms per call by the
segment probe — 4 calls are ~30% of the office bench; the corridor fires
one every few meters).

Pieces, each timed as K chained invocations + one block (the ~25 ms
tunnel sync amortizes across the chain):
  settle   — pool lineage gather: tree.map(a[lineage])
  flush    — settle + vmapped resident_flush (window -> pool writeback)
  gather   — vmapped resident_gather at a shifted origin
  full     — the production reorg program (settle+flush+recenter+gather)

Inputs are value-perturbed per rep (the runtime serves value-identical
dispatches from a cache).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.algos import pf_slam2d as pfm
    from iris_lama_tpu.algos.pf_slam2d import PFSlam2D, PFSlam2DOptions
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.sdm import mapping
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

    def settle(pset, bump):
        maps = jax.tree.map(lambda a: a[pset.lineage], pset.maps)
        return maps.table.overflow + bump

    def flush(pset, bump):
        maps = jax.tree.map(lambda a: a[pset.lineage], pset.maps)
        maps = jax.vmap(
            lambda m, o, v, d: mapping.resident_flush(
                m, cfg, pset.res_org, o, v, d)
        )(maps, pset.res_occ, pset.res_vis + bump, pset.res_dist)
        return maps.table.overflow

    def gather(pset, bump):
        new_org = pset.res_org + 32 * (1 + bump % 2)
        occ, vis, dist = jax.vmap(
            lambda m: mapping.resident_gather(m, cfg, new_org))(pset.maps)
        # full sums: a single-element output lets XLA slice-propagate and
        # DCE the gather (CLAUDE.md micro-profiling warning (b))
        return (jnp.sum(occ.astype(jnp.int32)) + jnp.sum(vis) +
                jnp.sum(dist.astype(jnp.int32)))

    def full(pset, bump):
        maps = jax.tree.map(lambda a: a[pset.lineage], pset.maps)
        maps = jax.vmap(
            lambda m, o, v, d: mapping.resident_flush(
                m, cfg, pset.res_org, o, v, d)
        )(maps, pset.res_occ, pset.res_vis + bump, pset.res_dist)
        p0cell = geo.w2m(pset.pose[:, :2])
        anchor = jnp.mean(p0cell.astype(jnp.float32), axis=0).astype(
            jnp.int32)
        new_org = mapping.resident_org(cfg, anchor)
        occ, vis, dist = jax.vmap(
            lambda m: mapping.resident_gather(m, cfg, new_org))(maps)
        return (maps.table.overflow + jnp.sum(occ.astype(jnp.int32)) +
                jnp.sum(vis) + jnp.sum(dist.astype(jnp.int32)))

    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket
    pts_np, msk_np, org_np = pad_scan(data.clouds[39], beam_bucket(720))
    pts_d = jnp.asarray(pts_np)
    msk_d = jnp.asarray(msk_np)
    org_d = jnp.asarray(org_np)

    def map_phase(pset, bump):
        occ, vis, dist = pfm._pf_map_phase(
            opts, pset.res_org, pset.res_occ, pset.res_vis + bump,
            pset.res_dist, pset.pose, pts_d, msk_d, org_d)
        return (jnp.sum(occ.astype(jnp.int32)) + jnp.sum(vis) +
                jnp.sum(dist.astype(jnp.int32)))

    def match_phase(pset, bump):
        jitter = bump.astype(jnp.float32) * 1e-6
        mid, states, liks, match_iters, safe = pfm._pf_match_phase(
            opts, pset._replace(pose=pset.pose + jitter), pts_d, msk_d,
            use_cond=False)
        return (jnp.sum(states) + jnp.sum(liks) +
                jnp.sum(match_iters).astype(jnp.float32))

    from iris_lama_tpu.sdm import pool as pool_mod, window as win_mod

    wp = cfg.resident_window_patches

    def g_lookup(pset, bump):
        new_org = pset.res_org + 32 * (1 + bump % 2)
        keys = win_mod.window_patch_keys(geo, new_org, wp)
        slots = jax.vmap(
            lambda m: pool_mod.table_lookup(m.table, keys))(pset.maps)
        return jnp.sum(slots)

    def g_rows(pset, bump):
        new_org = pset.res_org + 32 * (1 + bump % 2)
        keys = win_mod.window_patch_keys(geo, new_org, wp)

        def one(m):
            slots = pool_mod.table_lookup(m.table, keys)
            safe = jnp.where(slots >= 0, slots,
                             m.occupied.shape[0] - 1).reshape(-1)
            return (jnp.sum(m.occupied[safe].astype(jnp.int32)) +
                    jnp.sum(m.visited[safe].astype(jnp.int32)) +
                    jnp.sum(m.dist[safe]))

        return jnp.sum(jax.vmap(one)(pset.maps))

    def g_dense(pset, bump):
        new_org = pset.res_org + 32 * (1 + bump % 2)
        keys = win_mod.window_patch_keys(geo, new_org, wp)

        def one(m):
            slots = pool_mod.table_lookup(m.table, keys)
            occ, _ = win_mod.gather_window(m.table, m.occupied, keys, 0,
                                           slots=slots)
            vis, _ = win_mod.gather_window(m.table, m.visited, keys, 0,
                                           slots=slots)
            dist, _ = win_mod.gather_window(m.table, m.dist, keys,
                                            cfg.distance.max_dist,
                                            slots=slots)
            return (jnp.sum(occ.astype(jnp.int32)) +
                    jnp.sum(vis.astype(jnp.int32)) + jnp.sum(dist))

        return jnp.sum(jax.vmap(one)(pset.maps))

    K = 4
    for name, fn in (("settle", settle), ("flush", flush),
                     ("gather", gather), ("g_lookup", g_lookup),
                     ("g_rows", g_rows), ("g_dense", g_dense),
                     ("full", full),
                     ("map", map_phase), ("match", match_phase)):
        j = jax.jit(fn)
        out = j(pset, jnp.uint16(9))        # compile
        jax.block_until_ready(out)
        meds = []
        for rep in range(3):
            t0 = time.perf_counter()
            outs = [j(pset, jnp.uint16(rep * K + k)) for k in range(K)]
            jax.block_until_ready(outs[-1])
            meds.append((time.perf_counter() - t0) / K * 1e3)
        print(f"{name:8s} {sorted(meds)[1]:8.2f} ms/call "
              f"(reps {' '.join(f'{m:.1f}' for m in meds)})")

    from iris_lama_tpu.utils.devprof import device_breakdown
    print("== flush device breakdown ==")
    jf = jax.jit(flush)
    for n, ms in device_breakdown(
            jf, lambda k: (pset, jnp.uint16(k)), n=2, top=14):
        print(f"{ms:9.2f} ms  {n[:80]}")


if __name__ == "__main__":
    sys.exit(main())

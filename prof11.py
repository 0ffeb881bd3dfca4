"""PF map-update stage decomposition (30 particles, bench_pf config).

Cumulative stages of mapping.update_maps, each chained on donated map state
(the axon runtime caches identical dispatches, so every rep must depend on
the previous output and inputs must change).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.ops import scatter_matmul
from iris_lama_tpu.sdm import mapping, pool as pool_mod, window as win_mod
from iris_lama_tpu.sdm.distance import edt2d
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan

P = 30

opts = pf.PFSlam2DOptions(particles=P, resolution=0.05, max_range=10.0,
                          capacity=2048, max_iter=50, seed=11)
cfg = opts.mapping_config()
geo = cfg.geometry
wp = cfg.window_patches
w = cfg.window_cells
dcfg = cfg.distance
radius = dcfg.radius_cells

data = simulator.simulate(simulator.SimConfig(
    n_steps=4, seed=5, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
pts, mask, origin = pad_scan(data.clouds[0], 768)
pts, mask, origin = jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin)

pset = pf.particles_init(opts, jnp.asarray(Pose2D(*data.poses_gt[0]).se2_array()))
pset = jax.jit(lambda ps: pf.pf_first_step(opts, ps, pts, mask, origin))(pset)
jax.block_until_ready(pset.maps.dist)
maps0, poses = pset.maps, pset.pose


def stage_fn(depth):
    """depth: 1=probe, 2=+gathers, 3=+rays, 4=+scatter, 5=+occ/EDT, 6=full."""

    def one(state, pose, bump):
        org_cell = win_mod.window_org(geo, geo.w2m(pose[:2]), wp)
        keys = win_mod.window_patch_keys(geo, org_cell, wp)
        slots = pool_mod.table_lookup(state.table, keys)
        dep = jnp.sum(slots)
        if depth >= 2:
            occ_w, _ = win_mod.gather_window(state.table, state.occupied,
                                             keys, 0, slots=slots)
            vis_w, _ = win_mod.gather_window(state.table, state.visited,
                                             keys, 0, slots=slots)
            dist_old, _ = win_mod.gather_window(state.table, state.dist, keys,
                                                dcfg.max_dist, slots=slots)
            dep = dep + occ_w[0, 0].astype(jnp.int32) \
                + vis_w[0, 0].astype(jnp.int32) + dist_old[0, 0].astype(jnp.int32)
        if depth >= 3:
            g = mapping.beam_geometry(cfg, pose, pts, mask, origin)
            mhit = geo.w2m(g.hit_xy)
            mstart = geo.w2m(g.start_xy)
            free_cells, free_mask = mapping.ray_cells(mstart, mhit,
                                                      cfg.ray_steps)
            free_mask = jnp.logical_and(free_mask, g.valid[:, None])
            hit_loc = mhit - org_cell
            free_loc = free_cells - org_cell

            def in_win(loc):
                return ((loc[..., 0] >= 0) & (loc[..., 0] < w) &
                        (loc[..., 1] >= 0) & (loc[..., 1] < w))

            hit_ok = jnp.logical_and(jnp.logical_and(g.valid, g.mark_hit),
                                     in_win(hit_loc))
            free_ok = jnp.logical_and(free_mask, in_win(free_loc))
            dep = dep + jnp.sum(free_loc[0, 0]) + jnp.sum(hit_loc[0])
        if depth >= 4:
            def scat(loc, ok, impl=None):
                ly = jnp.where(ok, loc[..., 1], w).reshape(-1)
                lx = jnp.where(ok, loc[..., 0], w).reshape(-1)
                return scatter_matmul.scatter_counts_2d(ly, lx, w, w,
                                                        impl=impl)
            occ_add = scat(hit_loc, hit_ok, impl="xla")
            vis_add = occ_add + scat(free_loc, free_ok)
            dep = dep + vis_add[0, 0]
        if depth >= 5:
            vis_new = jnp.minimum(vis_w.astype(jnp.int32) + vis_add, 65535)
            occ_new = jnp.minimum(occ_w.astype(jnp.int32) + occ_add, 65535)
            obst_new = (4 * occ_new) > vis_new
            d2 = edt2d(obst_new, dcfg.max_sqdist, radius)
            dep = dep + d2[0, 0] + occ_new[0, 0] + vis_new[0, 0]
        # dep lands in the trash patch: a REAL dependency (an `x*0` gets
        # constant-folded and the whole stage DCE'd), semantically inert
        new_occ = state.occupied.at[-1, 0, 0].add(
            (bump + dep).astype(state.occupied.dtype))
        return state._replace(occupied=new_occ)

    def step(ms, i):
        if depth >= 6:
            new, _ = jax.vmap(lambda m, p: mapping.update_maps(
                m, cfg, p, pts, mask, origin))(ms, poses)
            return new
        return jax.vmap(lambda m, p: one(m, p, i))(ms, poses)

    return jax.jit(step, donate_argnums=(0,))


names = {1: "probe", 2: "+gathers(3)", 3: "+raycast", 4: "+scatter",
         5: "+occ+EDT", 6: "full update_maps"}
for depth in (1, 2, 3, 4, 5, 6):
    f = stage_fn(depth)
    ms = jax.tree.map(jnp.array, maps0)
    ms = f(ms, jnp.int32(0))
    jax.block_until_ready(ms.dist)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        ms = f(ms, jnp.int32(i + 1))
    jax.block_until_ready(ms.dist)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{names[depth]:22s} {dt:7.2f} ms", flush=True)

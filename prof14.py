"""Bisect the PF map update: full program vs no-writeback variant.

Same instrument as prof13 (interleaved, chained donated state, one dispatch
per rep). The no-writeback variant computes everything through the merged
distance grid but returns dense grids instead of scattering into the pool
(and skips the alloc insert + final lookup). The delta is the true
writeback+alloc cost with nothing DCE'd.
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


def no_writeback(state, pose):
    """update_maps through dist_merged; returns dense grids (no pool writes,
    no alloc). Mirrors sdm/mapping.update_maps stages 1-5 + merge."""
    org_cell = win_mod.window_org(geo, geo.w2m(pose[:2]), wp)
    keys = win_mod.window_patch_keys(geo, org_cell, wp)
    slots = pool_mod.table_lookup(state.table, keys)

    g = mapping.beam_geometry(cfg, pose, pts, mask, origin)
    mhit = geo.w2m(g.hit_xy)
    mstart = geo.w2m(g.start_xy)
    free_cells, free_mask = mapping.ray_cells(mstart, mhit, cfg.ray_steps)
    free_mask = jnp.logical_and(free_mask, g.valid[:, None])
    hit_loc = mhit - org_cell
    free_loc = free_cells - org_cell

    def in_win(loc):
        return ((loc[..., 0] >= 0) & (loc[..., 0] < w) &
                (loc[..., 1] >= 0) & (loc[..., 1] < w))

    hit_ok = jnp.logical_and(jnp.logical_and(g.valid, g.mark_hit),
                             in_win(hit_loc))
    free_ok = jnp.logical_and(free_mask, in_win(free_loc))

    def scat(loc, ok, impl=None):
        ly = jnp.where(ok, loc[..., 1], w).reshape(-1)
        lx = jnp.where(ok, loc[..., 0], w).reshape(-1)
        return scatter_matmul.scatter_counts_2d(ly, lx, w, w, impl=impl)

    occ_add = scat(hit_loc, hit_ok, impl="xla")
    vis_add = occ_add + scat(free_loc, free_ok)

    occ_w, _ = win_mod.gather_window(state.table, state.occupied, keys, 0,
                                     slots=slots)
    vis_w, _ = win_mod.gather_window(state.table, state.visited, keys, 0,
                                     slots=slots)
    vis_new = jnp.minimum(vis_w.astype(jnp.int32) + vis_add, 65535)
    occ_new = jnp.minimum(occ_w.astype(jnp.int32) + occ_add, 65535)
    obst_new = (4 * occ_new) > vis_new
    d2 = edt2d(obst_new, dcfg.max_sqdist, radius)
    dist_new = jnp.sqrt(d2.astype(jnp.float32)) * jnp.float32(geo.resolution)

    dist_old, _ = win_mod.gather_window(state.table, state.dist, keys,
                                        dcfg.max_dist, slots=slots)
    yy = jnp.arange(w)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = ((yy >= radius) & (yy < w - radius) &
                (xx >= radius) & (xx < w - radius))
    dist_merged = jnp.where(interior, dist_new, dist_old)
    return occ_new, vis_new, dist_merged


def make_full():
    def step(ms):
        new, _ = jax.vmap(lambda m, p: mapping.update_maps(
            m, cfg, p, pts, mask, origin))(ms, poses)
        return new
    return jax.jit(step, donate_argnums=(0,))


def make_nowb():
    def step(ms):
        occ_new, vis_new, dist_merged = jax.vmap(
            lambda m, p: no_writeback(m, p))(ms, poses)
        # consume everything: fold the grids back into the trash patch so
        # the state keeps its shape and the next rep depends on this one
        # full-grid reductions (slices would propagate back through the
        # EDT's shift chain and shrink the measured work) added into the
        # never-read trash cell
        tot = (jnp.sum(dist_merged, axis=(1, 2))
               + jnp.sum(occ_new, axis=(1, 2)).astype(jnp.float32)
               + jnp.sum(vis_new, axis=(1, 2)).astype(jnp.float32))
        dist = ms.dist.at[:, -1, 0, 0].add(tot)
        return ms._replace(dist=dist)
    return jax.jit(step, donate_argnums=(0,))


steps = {"full": make_full(), "no_writeback": make_nowb()}
state = {k: jax.tree.map(jnp.array, maps0) for k in steps}
for k, f in steps.items():
    state[k] = f(state[k])
    jax.block_until_ready(state[k].dist)

times = {k: [] for k in steps}
for round_ in range(6):
    for k, f in steps.items():
        t0 = time.perf_counter()
        for _ in range(5):
            state[k] = f(state[k])
        jax.block_until_ready(state[k].dist)
        times[k].append((time.perf_counter() - t0) / 5 * 1e3)
for k in steps:
    v = sorted(times[k])
    print(f"map_update {k:13s} median {v[len(v)//2]:7.2f} ms  "
          f"runs={np.round(times[k], 1)}", flush=True)

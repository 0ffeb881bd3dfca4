"""In-situ A/B: window gather via XLA row gather vs one-hot matmul,
measured on the REAL vmapped PF map update, interleaved to cancel tunnel
drift. One dispatch per rep; the donated map state evolves every rep so no
two dispatches are identical (the axon cache) and nothing folds away
(XLA rewrites x*0 to 0 — never use that as a fake dependency).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.sdm import mapping, pool as pool_mod, window as win_mod
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan

P = 30
opts = pf.PFSlam2DOptions(particles=P, resolution=0.05, max_range=10.0,
                          capacity=2048, max_iter=50, seed=11)
cfg = opts.mapping_config()

data = simulator.simulate(simulator.SimConfig(
    n_steps=4, seed=5, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
pts, mask, origin = pad_scan(data.clouds[0], 768)
pts, mask, origin = jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin)
pset = pf.particles_init(opts, jnp.asarray(Pose2D(*data.poses_gt[0]).se2_array()))
pset = jax.jit(lambda ps: pf.pf_first_step(opts, ps, pts, mask, origin))(pset)
jax.block_until_ready(pset.maps.dist)
maps0, poses = pset.maps, pset.pose

gather_row = win_mod.gather_window


def gather_onehot(table, arr, keys, default, slots=None):
    wp = keys.shape[0]
    length = arr.shape[-1]
    if slots is None:
        slots = pool_mod.table_lookup(table, keys)
    safe = jnp.where(slots >= 0, slots, arr.shape[0] - 1).reshape(-1)
    arr2d = arr.reshape(arr.shape[0], -1)
    oh = (safe[:, None] == jnp.arange(arr2d.shape[0],
                                      dtype=jnp.int32)).astype(jnp.float32)
    flat = jax.lax.dot_general(oh, arr2d.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    blocks = flat.reshape(wp, wp, length, length)
    blocks = jnp.where((slots >= 0)[:, :, None, None], blocks,
                       jnp.float32(default))
    grid = blocks.transpose(0, 2, 1, 3).reshape(wp * length, wp * length)
    return grid.astype(arr.dtype), slots


def make_step(gather_impl):
    win_mod.gather_window = gather_impl

    def step(ms):
        new, _ = jax.vmap(lambda m, p: mapping.update_maps(
            m, cfg, p, pts, mask, origin))(ms, poses)
        return new

    f = jax.jit(step, donate_argnums=(0,))
    win_mod.gather_window = gather_row
    return f


steps = {"row": make_step(gather_row), "onehot": make_step(gather_onehot)}
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
    print(f"map_update gather={k:7s} median {v[len(v)//2]:7.2f} ms  "
          f"runs={np.round(times[k], 1)}", flush=True)

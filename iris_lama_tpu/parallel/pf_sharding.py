"""Multi-chip particle sharding for PFSlam2D.

reference parallelism: a ThreadPool fans one task per particle across CPU
threads with barrier waits (src/pf_slam2d.cpp:254-266, 292-302;
src/thread_pool.cpp:52-114). The TPU-native equivalent shards the particle
axis of every ParticleSet array over a device mesh and lets XLA's GSPMD
partitioner place the work:

* motion sampling / scan match / map update are `vmap`s over particles —
  embarrassingly parallel, zero communication;
* weight normalization and Neff are tiny cross-particle reductions — XLA
  inserts `all-reduce` (psum) over the mesh axis;
* systematic resampling indexes particles globally — XLA turns the gather of
  surviving lineages into collective permutes / all-gathers over ICI at the
  resample boundary only (exactly where the reference pays its COW clones,
  pf_slam2d.cpp:568-569).

No NCCL/MPI analogue is written by hand; `jax.sharding` + jit is the whole
communication layer (SURVEY §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algos import pf_slam2d as pf


def particle_mesh(devices=None, axis: str = "p") -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), axis_names=(axis,))


def shard_particles(pset: pf.ParticleSet, mesh: Mesh,
                    axis: str = "p") -> pf.ParticleSet:
    """Place every particle-axis array on the mesh (leading dim sharded).

    Arrays whose leading dim is not the particle axis (the shared resident
    window origin) are replicated.
    """
    def put(path, a):
        replicated = a.ndim < 1 or "res_org" in jax.tree_util.keystr(path)
        spec = P() if replicated else P(axis)
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, pset)


def make_sharded_update(opts: pf.PFSlam2DOptions, mesh: Mesh,
                        axis: str = "p"):
    """jit-compiled PF update with particle-axis shardings pinned.

    Scalars (key) and per-scan data (points/mask/origin) are replicated;
    particle state stays sharded in and out (GSPMD propagates through the
    vmaps; only normalize/Neff/resample induce collectives).
    """
    pspec = NamedSharding(mesh, P(axis))
    rspec = NamedSharding(mesh, P())

    def shardings_like(pset):
        def spec(path, a):
            if a.ndim < 1 or "res_org" in jax.tree_util.keystr(path):
                return rspec
            return pspec
        return jax.tree_util.tree_map_with_path(spec, pset)

    def step(pset, key, points, mask, origin):
        return pf.pf_update_step(opts, pset, key, points, mask, origin)

    # abstract shapes only — don't materialize a particle set to read its
    # tree structure
    dummy = jax.eval_shape(
        lambda: pf.particles_init(opts, jnp.zeros(4, jnp.float32)))
    in_sh = (shardings_like(dummy), rspec, rspec, rspec, rspec)
    # pin OUTPUT shardings too: without them GSPMD may emit a replicated
    # pose/weight, which both breaks chained sharded calls (the next
    # update's pinned in_shardings reject the replicated arg) and hides
    # all-gathers of the particle maps in every step
    return jax.jit(step, in_shardings=in_sh,
                   out_shardings=(shardings_like(dummy), rspec),
                   donate_argnums=(0,))


def make_sharded_motion(opts: pf.PFSlam2DOptions, mesh: Mesh,
                        axis: str = "p"):
    pspec = NamedSharding(mesh, P(axis))
    rspec = NamedSharding(mesh, P())

    def motion(pose, key, odelta):
        return pf.draw_from_motion(opts, key, odelta, pose)

    return jax.jit(motion, in_shardings=(pspec, rspec, rspec),
                   out_shardings=pspec)

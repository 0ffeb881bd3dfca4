import time, numpy as np, jax, jax.numpy as jnp
from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan

for n_part in (8, 30):
    opts = pf.PFSlam2DOptions(particles=n_part, resolution=0.05, max_range=10.0, capacity=2048, max_iter=50, seed=3)
    data = simulator.simulate(simulator.SimConfig(n_steps=4, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    pts, mask, origin = pad_scan(data.clouds[0], 768)
    pts, mask, origin = jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin)
    pset = pf.particles_init(opts, jnp.asarray(Pose2D(*data.poses_gt[0]).se2_array()))
    first = jax.jit(lambda ps: pf.pf_first_step(opts, ps, pts, mask, origin))
    pset = first(pset); jax.block_until_ready(pset.maps.dist)

    upd = jax.jit(lambda ps, k: pf.pf_update_step(opts, ps, k, pts, mask, origin)[0], donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    pset = upd(pset, key); jax.block_until_ready(pset.pose)
    t0=time.time(); n=10
    for i in range(n): pset = upd(pset, jax.random.fold_in(key, i))
    jax.block_until_ready(pset.pose)
    print(f"particles={n_part}: pf_update {(time.time()-t0)/n*1e3:.1f} ms", flush=True)

    # map update only (vmapped)
    cfg = opts.mapping_config()
    import iris_lama_tpu.sdm.mapping as mapping
    mupd = jax.jit(lambda ms, poses: jax.vmap(lambda m, p: mapping.update_maps(m, cfg, p, pts, mask, origin)[0])(ms, poses), donate_argnums=(0,))
    maps = mupd(pset.maps, pset.pose); jax.block_until_ready(maps.dist)
    t0=time.time()
    for i in range(n): maps = mupd(maps, pset.pose)
    jax.block_until_ready(maps.dist)
    print(f"particles={n_part}: map_update only {(time.time()-t0)/n*1e3:.1f} ms", flush=True)

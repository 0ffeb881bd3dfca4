import time, numpy as np, jax, jax.numpy as jnp
from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions, _make_step
from iris_lama_tpu.core import lie
from iris_lama_tpu.sdm import mapping
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan

for max_iter in (10, 50):
    opts = Slam2DOptions(resolution=0.05, max_range=10.0, capacity=8192, max_iter=max_iter)
    cfg = opts.mapping_config(); sopts = opts.solver_options()
    step, first = _make_step(cfg, sopts)
    data = simulator.simulate(simulator.SimConfig(n_steps=3, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    pts, mask, origin = pad_scan(data.clouds[0], 768)
    pts, mask, origin = jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin)
    g = data.poses_gt[0]
    pose = jnp.asarray(np.array([g[0], g[1], np.cos(g[2]), np.sin(g[2])], np.float32))
    state = mapping.slam_map_init(cfg)
    state, _ = jax.jit(lambda s: mapping.update_maps(s, cfg, pose, pts, mask, origin))(state)
    # warm
    s2, p2, info = step(state, lie.se2_compose(pose, lie.se2(0.05,-0.03,0.02)), pts, mask, origin)
    jax.block_until_ready(p2)
    t0=time.time(); n=20
    st = s2
    for i in range(n):
        st, p2, info = step(st, lie.se2_compose(p2, lie.se2(0.02,0.01,0.005)), pts, mask, origin)
    jax.block_until_ready(p2)
    print(f"max_iter={max_iter}: fused step {(time.time()-t0)/n*1e3:.2f} ms, iters={int(info['iterations'])}", flush=True)

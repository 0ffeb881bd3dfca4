import time, numpy as np, jax, jax.numpy as jnp
from iris_lama_tpu.algos.slam2d import Slam2DOptions
from iris_lama_tpu.core import lie
from iris_lama_tpu.sdm import mapping, window as win_mod, distance as dist_mod
from iris_lama_tpu.match import match_surface_2d as match
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan

opts = Slam2DOptions(resolution=0.05, max_range=10.0, capacity=8192, max_iter=50)
cfg = opts.mapping_config(); sopts = opts.solver_options()
geo = cfg.geometry; wp = cfg.window_patches
W = cfg.window_cells
data = simulator.simulate(simulator.SimConfig(n_steps=3, laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
pts, mask, origin = pad_scan(data.clouds[0], 768)
pts, mask, origin = jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin)
g = data.poses_gt[0]
pose = jnp.asarray(np.array([g[0], g[1], np.cos(g[2]), np.sin(g[2])], np.float32))
state = mapping.slam_map_init(cfg)
state, _ = jax.jit(lambda s: mapping.update_maps(s, cfg, pose, pts, mask, origin))(state)
jax.block_until_ready(state.dist)

def bench_pipelined(name, fn, arg, n=30):
    a = fn(arg); jax.block_until_ready(jax.tree.leaves(a)[0])
    t0 = time.time()
    for _ in range(n): a = fn(a)
    jax.block_until_ready(jax.tree.leaves(a)[0])
    print(f"{name}: {(time.time()-t0)/n*1e3:.2f} ms", flush=True)

# 1. full fused step chained on state
step = jax.jit(lambda st: mapping.update_maps(st, cfg, pose, pts, mask, origin)[0])
bench_pipelined("update_maps (pipelined)", step, state)

# 2. solve chained on pose
org = win_mod.window_org(geo, geo.w2m(pose[:2]), wp)
keys = win_mod.window_patch_keys(geo, org, wp)
grid, _ = jax.jit(lambda s: win_mod.gather_window(s.table, s.dist, keys, cfg.distance.max_dist))(state)
solve = jax.jit(lambda p0: match.solve_window(grid, org, geo, cfg.distance.max_dist, pts[:, :2], mask, lie.se2_compose(p0, lie.se2(0.01, -0.01, 0.003)), sopts).state)
bench_pipelined("solve (pipelined)", solve, pose)

# 3. EDT alone
obst = jnp.zeros((W, W), bool).at[100::37, 200::41].set(True)
edt = jax.jit(lambda o: dist_mod.edt2d(o, cfg.distance.max_sqdist, cfg.distance.radius_cells) > 0)
bench_pipelined("edt 576x576", edt, obst)

# 4. gather_window chained
gw = jax.jit(lambda gprev: win_mod.gather_window(state.table, state.dist, keys, cfg.distance.max_dist)[0] + 0*gprev[0,0])
bench_pipelined("gather_window", gw, grid)

# 5. one GN eval (residual+jacobian)
ev = match.make_window_eval(grid, org, geo, cfg.distance.max_dist, pts[:, :2], mask)
one = jax.jit(lambda p0: lie.se2_compose(p0, lie.se2(*((jnp.sum(ev(p0)[1])*1e-9)[None].repeat(3)))))
def one_eval(p0):
    r, J = ev(p0)
    h = (J.T @ r) * 1e-6
    return lie.se2_compose(p0, lie.se2_exp(h))
one = jax.jit(one_eval)
bench_pipelined("single eval+reduce", one, pose)

# 6. scatter counts alone
hit_loc = jnp.clip(geo.w2m(lie.se2_apply(pose, pts[:, :2])) - org, 0, W-1)
from iris_lama_tpu.sdm.raycast import ray_cells
def scat(c):
    grid0 = jnp.zeros((W, W), jnp.int32)
    cells, m = ray_cells(geo.w2m(jnp.broadcast_to(lie.se2_apply(pose, origin[:2]), (768,2))), geo.w2m(lie.se2_apply(pose, pts[:, :2])), cfg.ray_steps)
    loc = jnp.clip(cells - org, 0, W - 1)
    g2 = grid0.at[loc[...,1].reshape(-1), loc[...,0].reshape(-1)].add(m.reshape(-1).astype(jnp.int32))
    return c.at[0,0].add(g2[0,0])
bench_pipelined("raycast+scatter", jax.jit(scat), jnp.zeros((W,W), jnp.int32))

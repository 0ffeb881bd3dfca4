"""Fused SLAM-map update vs a dense numpy oracle.

The oracle applies the same end-state semantics on a plain dense grid:
counts from the (already reference-verified) ray walk, obstacle mask
4*occ > vis (frequency_occupancy_map.cpp:40-44), distance = brute-force
nearest obstacle capped at max_sqdist (the Lau DT exactness contract).
"""

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.core import lie
from iris_lama_tpu.sdm import mapping, pool as pool_mod
from iris_lama_tpu.sdm.geometry import MapGeometry
from iris_lama_tpu.sdm import window as win_mod

from test_raycast import reference_ray
from test_distance import brute_force_sqdist

rng = np.random.default_rng(11)


def make_cfg(**kw):
    geo = MapGeometry(resolution=0.1, log2dim=4)
    return mapping.MappingConfig(geometry=geo, l2_max=0.5, max_range=4.0,
                                 capacity=512, **kw)


def simulate_scan(n=60, r=3.0):
    """A ring of points around the origin (robot at origin)."""
    ang = np.linspace(-np.pi, np.pi, n, endpoint=False)
    radii = r * (0.6 + 0.4 * rng.random(n))
    pts = np.stack([radii * np.cos(ang), radii * np.sin(ang),
                    np.zeros(n)], -1).astype(np.float32)
    return pts


class DenseOracle:
    """Dense dict-free oracle over a fixed region around the origin."""

    def __init__(self, cfg, half_m=8.0):
        self.cfg = cfg
        geo = cfg.geometry
        self.n = int(2 * half_m * geo.scale)
        self.org = geo.np_w2m(np.array([-half_m, -half_m]))  # cell coords
        self.occ = np.zeros((self.n, self.n), np.int64)   # [y, x]
        self.vis = np.zeros((self.n, self.n), np.int64)

    def _loc(self, cell):
        return cell[0] - self.org[0], cell[1] - self.org[1]

    def apply_scan(self, pose_xyr, points, origin=np.zeros(3)):
        cfg, geo = self.cfg, self.cfg.geometry
        c, s = np.cos(pose_xyr[2]), np.sin(pose_xyr[2])
        R = np.array([[c, -s], [s, c]])
        start_w = pose_xyr[:2] + R @ origin[:2]
        start_cell = geo.np_w2m(start_w)
        for p in points:
            hit_w = pose_xyr[:2] + R @ p[:2]
            ray_len = np.linalg.norm(np.r_[hit_w - start_w, p[2] - origin[2]])
            mark_hit = True
            if cfg.truncated_range > 0 and ray_len > cfg.truncated_range:
                hit_w = start_w + (hit_w - start_w) * cfg.truncated_range / ray_len
                mark_hit = False
            hit_cell = geo.np_w2m(hit_w)
            if mark_hit:
                lx, ly = self._loc(hit_cell)
                self.occ[ly, lx] += 1
                self.vis[ly, lx] += 1
            for cell in reference_ray(start_cell, hit_cell):
                lx, ly = self._loc(cell)
                self.vis[ly, lx] += 1

    def obstacle(self):
        return 4 * self.occ > self.vis

    def dist(self):
        cap = self.cfg.distance.max_sqdist
        d2 = brute_force_sqdist(self.obstacle(), cap)
        return np.sqrt(d2) * self.cfg.geometry.resolution


def read_state_grid(state, cfg, oracle):
    """Read the pool state over the oracle's region as dense grids."""
    geo = cfg.geometry
    n, org = oracle.n, oracle.org
    xs = org[0] + np.arange(n)
    ys = org[1] + np.arange(n)
    cells = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).astype(np.int32)
    # cells[y, x] = (cx, cy)
    keys = geo.m2p(jnp.asarray(cells))
    slots = pool_mod.table_lookup(state.table, keys)
    local = geo.m2local(jnp.asarray(cells))
    safe = jnp.where(slots >= 0, slots, state.dist.shape[0] - 1)
    idx = (safe, local[..., 1], local[..., 0])
    found = np.asarray(slots) >= 0
    occ = np.where(found, np.asarray(state.occupied[idx]), 0)
    vis = np.where(found, np.asarray(state.visited[idx]), 0)
    dist = np.where(found, np.asarray(state.dist[idx]), cfg.distance.max_dist)
    obst = np.where(found, np.asarray(state.obstacle[idx]), False)
    return occ, vis, dist, obst


def run_updates(cfg, scans_poses, origin=np.zeros(3, np.float32)):
    state = mapping.slam_map_init(cfg)
    step = jax.jit(lambda st, pose, pts, msk: mapping.update_maps(
        st, cfg, pose, pts, msk, jnp.asarray(origin)))
    for pose_xyr, pts in scans_poses:
        pose = lie.se2(*pose_xyr)
        mask = jnp.ones(len(pts), bool)
        state, info = step(state, pose, jnp.asarray(pts), mask)
    return state, info


def test_single_scan_matches_oracle():
    cfg = make_cfg()
    pts = simulate_scan()
    pose = np.array([0.3, -0.2, 0.4])
    state, info = run_updates(cfg, [(pose, pts)])
    oracle = DenseOracle(cfg)
    oracle.apply_scan(pose, pts)

    occ, vis, dist, obst = read_state_grid(state, cfg, oracle)
    np.testing.assert_array_equal(occ, oracle.occ)
    np.testing.assert_array_equal(vis, oracle.vis)
    np.testing.assert_array_equal(obst, oracle.obstacle())
    np.testing.assert_allclose(dist, oracle.dist(), atol=1e-5)
    assert int(info["overflow"]) == 0


def test_multi_scan_with_motion_matches_oracle():
    cfg = make_cfg()
    oracle = DenseOracle(cfg)
    scans = []
    for k in range(5):
        pose = np.array([0.4 * k, 0.1 * k, 0.2 * k])
        pts = simulate_scan(50)
        scans.append((pose, pts))
        oracle.apply_scan(pose, pts)
    state, info = run_updates(cfg, scans)

    occ, vis, dist, obst = read_state_grid(state, cfg, oracle)
    np.testing.assert_array_equal(occ, oracle.occ)
    np.testing.assert_array_equal(vis, oracle.vis)
    np.testing.assert_array_equal(obst, oracle.obstacle())
    np.testing.assert_allclose(dist, oracle.dist(), atol=1e-5)


def test_obstacle_removal_updates_distance():
    # Repeatedly seeing through a previously-hit cell flips it free and the
    # distance field recovers (the reference raise-wavefront behavior).
    cfg = make_cfg()
    geo = cfg.geometry
    # scan 1: single hit at (1, 0)
    hit = np.array([[1.0, 0.0, 0.0]], np.float32)
    pose = np.array([0.0, 0.0, 0.0])
    oracle = DenseOracle(cfg)
    scans = [(pose, hit)]
    oracle.apply_scan(pose, hit)
    # scans 2-5: rays through that cell to (2.5, 0) — cell becomes free
    far = np.array([[2.5, 0.0, 0.0]], np.float32)
    for _ in range(4):
        scans.append((pose, far))
        oracle.apply_scan(pose, far)
    state, _ = run_updates(cfg, scans)

    occ, vis, dist, obst = read_state_grid(state, cfg, oracle)
    np.testing.assert_array_equal(obst, oracle.obstacle())
    np.testing.assert_allclose(dist, oracle.dist(), atol=1e-5)
    # the (1, 0) cell is no longer an obstacle
    c = geo.np_w2m(np.array([1.0, 0.0]))
    lx, ly = c[0] - oracle.org[0], c[1] - oracle.org[1]
    assert not obst[ly, lx]


def test_truncated_range():
    cfg = make_cfg(truncated_range=2.0)
    pts = simulate_scan(40)
    pose = np.array([0.0, 0.0, 0.0])
    state, _ = run_updates(cfg, [(pose, pts)])
    oracle = DenseOracle(cfg)
    oracle.apply_scan(pose, pts)
    occ, vis, dist, obst = read_state_grid(state, cfg, oracle)
    np.testing.assert_array_equal(occ, oracle.occ)
    np.testing.assert_array_equal(vis, oracle.vis)
    np.testing.assert_allclose(dist, oracle.dist(), atol=1e-5)


def test_window_gather_scatter_roundtrip():
    geo = MapGeometry(resolution=0.1, log2dim=4)
    table = pool_mod.table_init(64)
    L = geo.patch_length
    arr = jnp.zeros((65, L, L), jnp.float32)
    center = jnp.asarray([geo.cell_offset, geo.cell_offset], jnp.int32)
    org = win_mod.window_org(geo, center, 4)
    keys = win_mod.window_patch_keys(geo, org, 4)
    table, _ = pool_mod.table_insert(table, keys.reshape(-1))
    grid = jnp.asarray(rng.random((4 * L, 4 * L)), jnp.float32)
    _, slots = win_mod.gather_window(table, arr, keys, 0.0)
    arr = win_mod.scatter_window(arr, slots, grid)
    back, _ = win_mod.gather_window(table, arr, keys, 0.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(grid))


def test_beam_truncation_matches_reference_math():
    """beam_geometry vs a literal numpy port of slam2d.cpp:267-300
    (truncated_range and truncated_ray, 3D norms)."""
    from iris_lama_tpu.core import lie
    cfg = make_cfg(truncated_range=2.5, truncated_ray=1.5)
    n = 40
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                    rng.uniform(-0.2, 0.2, n)], -1).astype(np.float32)
    origin = np.array([0.1, -0.05, 0.3], np.float32)
    pose_xyr = (0.4, -0.2, 0.7)
    pose = lie.se2(*pose_xyr)
    g = mapping.beam_geometry(cfg, pose, jnp.asarray(pts),
                              jnp.ones(n, bool), jnp.asarray(origin))
    start_got = np.asarray(g.start_xy)
    hit_got = np.asarray(g.hit_xy)
    mark_got = np.asarray(g.mark_hit)

    c, s = np.cos(pose_xyr[2]), np.sin(pose_xyr[2])
    R = np.array([[c, -s], [s, c]])
    t = np.array(pose_xyr[:2])
    for i in range(n):
        hit = np.r_[R @ pts[i, :2] + t, pts[i, 2]]
        start = np.r_[R @ origin[:2] + t, origin[2]]
        AB = hit - start
        ray_len = np.linalg.norm(AB)
        mark = True
        if cfg.truncated_range < ray_len:
            hit = start + AB / ray_len * cfg.truncated_range
            mark = False
        if mark and cfg.truncated_ray < ray_len:
            start = hit - AB / ray_len * cfg.truncated_ray
        assert mark_got[i] == mark, i
        np.testing.assert_allclose(hit_got[i], hit[:2], atol=2e-5)
        np.testing.assert_allclose(start_got[i], start[:2], atol=2e-5)

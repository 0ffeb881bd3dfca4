"""TSDF + marching cubes tests.

Oracles: sequential numpy port of the reference integrate loop
(truncated_signed_distance_map.cpp:160-208); geometric checks for meshing
(a sphere's isosurface vertices lie near the sphere).
"""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.sdm import tsdf as tsdf_mod
from iris_lama_tpu.sdm import marching_cubes as mc
from iris_lama_tpu.sdm.raycast import ray_cells

rng = np.random.default_rng(21)


def reference_integrate(cfg, clouds):
    """Sequential numpy oracle of insertPointCloud/integrate."""
    cells = {}

    def get(c):
        return cells.setdefault(tuple(c), [cfg.truncate_size, 0.0])

    for origin, pts in clouds:
        seen = set()
        for hit in pts:
            hc = tuple(np.floor(hit * cfg.scale + 0.5).astype(int)
                       + cfg.cell_offset)
            if hc in seen:
                continue
            seen.add(hc)
            dvec = hit - origin
            sqn = float(dvec @ dvec)
            dirn = dvec / np.sqrt(sqn)
            trunc = min(sqn, cfg.truncate_size)
            start = np.floor((hit - dirn * trunc) * cfg.scale + 0.5
                             ).astype(int) + cfg.cell_offset
            end = np.floor((hit + dirn * cfg.truncate_size) * cfg.scale + 0.5
                           ).astype(int) + cfg.cell_offset
            ray, msk = ray_cells(np.asarray([start], np.int32),
                                 np.asarray([end], np.int32), cfg.ray_steps)
            ray = np.asarray(ray)[0][np.asarray(msk)[0]]
            inv_sqn = 1.0 / sqn
            inv_dle = 1.0 / (cfg.delta - cfg.epsilon)
            for c in ray:
                center = (c - cfg.cell_offset) * cfg.resolution
                vch = hit - center
                d = np.linalg.norm(vch) * np.sign(vch @ dvec)
                if d < -cfg.delta:
                    continue
                if d <= -cfg.epsilon:
                    w = (d + cfg.delta) * inv_sqn * inv_dle
                else:
                    w = inv_sqn
                cell = get(c)
                cell[0] = (cell[1] * cell[0] + w * d) / (cell[1] + w)
                cell[1] = min(cell[1] + w, cfg.maximum_weight)
    return cells


def make_cloud(n=40):
    """Random points on a wall at x = 2."""
    ys = rng.uniform(-1, 1, n)
    zs = rng.uniform(-0.3, 0.3, n)
    return np.stack([np.full(n, 2.0), ys, zs], -1).astype(np.float32)


def test_integration_matches_sequential_oracle():
    cfg = tsdf_mod.TSDFConfig(resolution=0.05, capacity=2048, max_beams=64)
    state = tsdf_mod.tsdf_init(cfg)
    origin = np.zeros(3, np.float32)
    pts = make_cloud(40)
    mask = jnp.ones(len(pts), bool)
    state, n_int = tsdf_mod.insert_point_cloud(state, cfg, jnp.asarray(pts),
                                               mask, jnp.asarray(origin))
    oracle = reference_integrate(cfg, [(origin, pts)])

    # compare every oracle cell
    ocells = np.asarray(sorted(oracle), np.int32)
    slots, idx = tsdf_mod._locate(cfg, state.table, jnp.asarray(ocells),
                                  state.dist.shape[0] - 1)
    got_d = np.asarray(state.dist[idx])
    got_w = np.asarray(state.weight[idx])
    exp = np.array([oracle[tuple(c)] for c in ocells])
    assert np.all(np.asarray(slots) >= 0)
    np.testing.assert_allclose(got_d, exp[:, 0], atol=2e-3)
    np.testing.assert_allclose(got_w, exp[:, 1], rtol=1e-3, atol=1e-6)


def test_multiple_scans_accumulate():
    cfg = tsdf_mod.TSDFConfig(resolution=0.05, capacity=2048, max_beams=64)
    state = tsdf_mod.tsdf_init(cfg)
    origin = np.zeros(3, np.float32)
    clouds = [make_cloud(30) for _ in range(3)]
    for pts in clouds:
        state, _ = tsdf_mod.insert_point_cloud(
            state, cfg, jnp.asarray(pts), jnp.ones(len(pts), bool),
            jnp.asarray(origin))
    oracle = reference_integrate(cfg, [(origin, p) for p in clouds])
    ocells = np.asarray(sorted(oracle), np.int32)
    slots, idx = tsdf_mod._locate(cfg, state.table, jnp.asarray(ocells),
                                  state.dist.shape[0] - 1)
    got_d = np.asarray(state.dist[idx])
    exp = np.array([oracle[tuple(c)] for c in ocells])
    np.testing.assert_allclose(got_d, exp[:, 0], atol=5e-3)


def test_interp_surface_zero_crossing():
    cfg = tsdf_mod.TSDFConfig(resolution=0.05, capacity=4096, max_beams=256)
    state = tsdf_mod.tsdf_init(cfg)
    origin = np.zeros(3, np.float32)
    # one wall point per cell (exact-resolution grid): the kept point of
    # each hit cell rays straight through the queried stencil cells
    ys, zs = np.meshgrid(np.arange(-0.5, 0.525, 0.05),
                         np.arange(-0.2, 0.225, 0.05))
    pts = np.stack([np.full(ys.size, 2.0), ys.ravel(), zs.ravel()],
                   -1).astype(np.float32)
    state, _ = tsdf_mod.insert_point_cloud(state, cfg, jnp.asarray(pts),
                                           jnp.ones(len(pts), bool),
                                           jnp.asarray(origin))
    q_front = np.array([[1.93, 0.0, 0.0]], np.float32)   # before the wall
    q_back = np.array([[2.07, 0.0, 0.0]], np.float32)    # behind the wall
    df, gf = tsdf_mod.distance_interp(state, cfg, jnp.asarray(q_front))
    db, _ = tsdf_mod.distance_interp(state, cfg, jnp.asarray(q_back))
    assert float(df[0]) > 0.02        # positive in front
    assert float(db[0]) < -0.02       # negative behind


def test_marching_cubes_sphere():
    # SDF of a sphere of radius 1 on a dense grid; mesh vertices lie on it
    n = 24
    res = 0.1
    coords = (np.arange(n) - n / 2) * res
    zz, yy, xx = np.meshgrid(coords, coords, coords, indexing="ij")
    sdf = np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - 1.0
    mask = np.ones_like(sdf, bool)
    origin = np.array([coords[0], coords[0], coords[0]])
    verts, tris = mc.marching_cubes_dense(sdf, mask, origin, res)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=res)
    assert tris.max() < len(verts)


def test_tri_table_sanity():
    # config 0 / 255: no triangles; single-corner configs: one triangle
    assert (mc.TRI_TABLE[0] == -1).all()
    assert (mc.TRI_TABLE[255] == -1).all()
    for c in range(8):
        cfg_bits = 1 << c
        row = mc.TRI_TABLE[cfg_bits]
        n = (row >= 0).sum()
        assert n == 3, (c, row)


def test_tsdf_mesh_from_wall():
    cfg = tsdf_mod.TSDFConfig(resolution=0.05, capacity=4096, max_beams=256)
    state = tsdf_mod.tsdf_init(cfg)
    ys, zs = np.meshgrid(np.linspace(-0.5, 0.5, 41),
                         np.linspace(-0.3, 0.3, 25))
    pts = np.stack([np.full(ys.size, 2.0), ys.ravel(), zs.ravel()],
                   -1).astype(np.float32)
    state, _ = tsdf_mod.insert_point_cloud(state, cfg, jnp.asarray(pts),
                                           jnp.ones(len(pts), bool),
                                           jnp.zeros(3))
    verts, tris = tsdf_mod.to_mesh(state, cfg)
    assert len(verts) > 20
    # mesh sits near the wall plane x = 2
    assert abs(np.median(verts[:, 0]) - 2.0) < 0.1

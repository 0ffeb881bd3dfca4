"""3D occupancy + 3D EDT tests.

Oracles: sequential dict-based rasterization with the (already verified)
ray walk; brute-force 3D nearest obstacle.
"""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.sdm import occupancy3d as o3
from iris_lama_tpu.sdm.raycast import ray_cells

rng = np.random.default_rng(66)
GEO = o3.MapGeometry3(resolution=0.1, log2dim=4)


def test_frequency3_scan_matches_dict_oracle():
    n = 30
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang),
                    rng.uniform(-0.3, 0.3, n)], -1).astype(np.float32)
    origin = np.zeros(3, np.float32)
    state = o3.frequency3_init(GEO, 512)
    state = o3.frequency3_insert_scan(state, GEO, jnp.asarray(pts),
                                      jnp.ones(n, bool), jnp.asarray(origin),
                                      max_steps=40)

    # oracle
    occ, vis = {}, {}
    start = np.asarray(GEO.w2m(jnp.asarray(origin)))
    for p in pts:
        hit = np.asarray(GEO.w2m(jnp.asarray(p)))
        occ[tuple(hit)] = occ.get(tuple(hit), 0) + 1
        vis[tuple(hit)] = vis.get(tuple(hit), 0) + 1
        cells, m = ray_cells(start[None], hit[None], 40)
        for c in np.asarray(cells)[0][np.asarray(m)[0]]:
            vis[tuple(c)] = vis.get(tuple(c), 0) + 1

    all_cells = np.asarray(sorted(vis), np.int32)
    slots, idx = o3._locate(state.table, GEO, jnp.asarray(all_cells),
                            state.occupied.shape[0] - 1)
    got_occ = np.asarray(state.occupied[idx])
    got_vis = np.asarray(state.visited[idx])
    assert (np.asarray(slots) >= 0).all()
    np.testing.assert_array_equal(got_vis,
                                  [vis[tuple(c)] for c in all_cells])
    np.testing.assert_array_equal(got_occ,
                                  [occ.get(tuple(c), 0) for c in all_cells])

    # occupied at hits, free along rays
    hit_cells = np.asarray(GEO.w2m(jnp.asarray(pts)))
    assert np.asarray(o3.frequency3_is_occupied(
        state, GEO, jnp.asarray(hit_cells))).all()


def test_simple3_and_probabilistic3():
    s = o3.simple3_init(GEO, 64)
    cells = np.asarray(GEO.w2m(jnp.asarray(
        np.array([[1.0, 2.0, 0.5]], np.float32))))
    s = o3.simple3_set(s, GEO, jnp.asarray(cells), 1)
    assert int(o3.simple3_query(s, GEO, jnp.asarray(cells))[0]) == 1

    p = o3.probabilistic3_init(GEO, 64)
    p = o3.probabilistic3_apply(p, GEO, jnp.asarray(cells),
                                jnp.asarray([1]), jnp.asarray([0]))
    slots, idx = o3._locate(p.table, GEO, jnp.asarray(cells),
                            p.logodds.shape[0] - 1)
    lo = float(p.logodds[idx][0])
    np.testing.assert_allclose(lo, np.log(0.7 / 0.3), atol=1e-5)


def brute3(obst, cap):
    zz, yy, xx = np.nonzero(obst)
    out = np.full(obst.shape, cap, np.int64)
    gz, gy, gx = np.mgrid[0:obst.shape[0], 0:obst.shape[1], 0:obst.shape[2]]
    for z, y, x in zip(zz, yy, xx):
        d2 = (gz - z) ** 2 + (gy - y) ** 2 + (gx - x) ** 2
        out = np.minimum(out, d2)
    return np.minimum(out, cap)


def test_edt3d_exact():
    obst = rng.random((24, 20, 28)) < 0.02
    cap, r = 36, 6
    got = np.asarray(o3.edt3d(jnp.asarray(obst), cap, r))
    np.testing.assert_array_equal(got, brute3(obst, cap))


def test_edt3d_empty():
    obst = np.zeros((8, 8, 8), bool)
    got = np.asarray(o3.edt3d(jnp.asarray(obst), 25, 5))
    np.testing.assert_array_equal(got, 25)

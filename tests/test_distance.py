"""Distance-field tests.

Oracles:
* brute-force nearest-obstacle squared distance (the exactness contract of
  the reference's Lau DT, src/sdm/dynamic_distance_map.cpp);
* a float64 numpy port of the reference bilinear interpolation + gradient
  (dynamic_distance_map.cpp:66-93).
"""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.sdm import distance as dmod
from iris_lama_tpu.sdm import pool as pool_mod
from iris_lama_tpu.sdm.geometry import MapGeometry

rng = np.random.default_rng(3)


def brute_force_sqdist(obst, cap):
    h, w = obst.shape
    ys, xs = np.nonzero(obst)
    out = np.full((h, w), cap, np.int64)
    if len(ys) == 0:
        return out
    yy, xx = np.mgrid[0:h, 0:w]
    for oy, ox in zip(ys, xs):
        d2 = (yy - oy) ** 2 + (xx - ox) ** 2
        out = np.minimum(out, d2)
    return np.minimum(out, cap)


def test_edt_exact_random():
    for density in (0.002, 0.02, 0.2):
        obst = rng.random((96, 96)) < density
        cap, r = 100, 10
        got = np.asarray(dmod.edt2d(jnp.asarray(obst), cap, r))
        expect = brute_force_sqdist(obst, cap)
        np.testing.assert_array_equal(got, expect)


def test_edt_empty_and_full():
    cap, r = 64, 8
    empty = np.zeros((40, 40), bool)
    np.testing.assert_array_equal(np.asarray(dmod.edt2d(jnp.asarray(empty), cap, r)), cap)
    full = np.ones((40, 40), bool)
    np.testing.assert_array_equal(np.asarray(dmod.edt2d(jnp.asarray(full), cap, r)), 0)


def test_edt_single_obstacle():
    obst = np.zeros((33, 33), bool)
    obst[16, 16] = True
    cap, r = 400, 20
    got = np.asarray(dmod.edt2d(jnp.asarray(obst), cap, r))
    expect = brute_force_sqdist(obst, cap)
    np.testing.assert_array_equal(got, expect)


def test_edt_removal_equivalence():
    # recompute-from-mask handles obstacle removal exactly: computing on the
    # reduced mask equals brute force on the reduced mask
    obst = rng.random((64, 64)) < 0.05
    keep = obst.copy()
    ys, xs = np.nonzero(obst)
    for i in range(0, len(ys), 2):
        keep[ys[i], xs[i]] = False
    cap, r = 100, 10
    got = np.asarray(dmod.edt2d(jnp.asarray(keep), cap, r))
    np.testing.assert_array_equal(got, brute_force_sqdist(keep, cap))


# ---------------------------------------------------------------------------
# Interpolation vs numpy port of the reference formulas
# ---------------------------------------------------------------------------

def ref_interp(dist_lookup, scale, map_coords):
    """Port of DynamicDistanceMap::distance(world, grad) 2D branch."""
    disc = np.floor(map_coords).astype(np.int64)
    mu = map_coords - disc
    v = np.array([
        dist_lookup(disc[0], disc[1]),
        dist_lookup(disc[0] + 1, disc[1]),
        dist_lookup(disc[0], disc[1] + 1),
        dist_lookup(disc[0] + 1, disc[1] + 1),
    ])
    muinv = 1.0 - mu
    d = (v[0] * muinv[0] * muinv[1] + v[1] * muinv[1] * mu[0] +
         v[2] * muinv[0] * mu[1] + v[3] * mu[0] * mu[1])
    gx = -((v[0] - v[1]) * muinv[1] + (v[2] - v[3]) * mu[1]) * scale
    gy = -((v[0] - v[2]) * muinv[0] + (v[1] - v[3]) * mu[0]) * scale
    return d, np.array([gx, gy])


def test_interp_window_matches_reference_formula():
    geo = MapGeometry(resolution=0.1, log2dim=4)
    h = w = 64
    grid = rng.random((h, w)).astype(np.float32)  # [y, x]
    org = np.array([geo.cell_offset - 10, geo.cell_offset - 20], np.int32)
    max_dist = 2.0

    world = rng.uniform(-0.8, 2.5, (128, 2)).astype(np.float32)
    d, g = dmod.interp_window(jnp.asarray(grid), jnp.asarray(org), geo,
                              jnp.asarray(world), max_dist)
    d, g = np.asarray(d), np.asarray(g)

    def lookup(cx, cy):
        lx, ly = cx - org[0], cy - org[1]
        if 0 <= lx < w and 0 <= ly < h:
            return float(grid[ly, lx])
        return max_dist

    for i in range(len(world)):
        mc = world[i].astype(np.float64) * geo.scale + geo.cell_offset
        de, ge = ref_interp(lookup, geo.scale, mc)
        np.testing.assert_allclose(d[i], de, atol=2e-4)
        np.testing.assert_allclose(g[i], ge, atol=4e-3)


def test_interp_pool_matches_window():
    geo = MapGeometry(resolution=0.05, log2dim=4)
    cfg = dmod.DistanceConfig(geo, l2_max=0.5)
    state = dmod.distance_map_init(cfg, capacity=64)
    L = geo.patch_length

    # fill two adjacent patches with a gradient field via direct writes
    keys = []
    base_cell = np.array([geo.cell_offset, geo.cell_offset], np.int32)
    for dpx in (0, 1):
        cell = base_cell + np.array([dpx * L, 0], np.int32)
        keys.append(int(np.asarray(geo.m2p(jnp.asarray(cell)))))
    table, slots = pool_mod.table_insert(state.table, jnp.asarray(keys, jnp.int32))
    vals = rng.random((2, L, L)).astype(np.float32)
    dist = state.dist
    for i, s in enumerate(np.asarray(slots)):
        dist = dist.at[int(s)].set(vals[i])
    state = state._replace(table=table, dist=dist)

    world = (rng.uniform(0.1, 1.4, (64, 2)) * np.array([1.0, 0.5])).astype(np.float32)
    dp, gp = dmod.interp_pool(state.table, state.dist, geo,
                              jnp.asarray(world), cfg.max_dist)

    grid = np.full((L, 2 * L), cfg.max_dist, np.float32)
    grid[:, :L] = vals[0]
    grid[:, L:] = vals[1]
    dw, gw = dmod.interp_window(jnp.asarray(grid), jnp.asarray(base_cell),
                                geo, jnp.asarray(world), cfg.max_dist)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dw), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gw), atol=1e-5)


def test_pallas_edt_matches_xla_interpret():
    """The Pallas EDT kernels are bit-exact vs edt2d (interpreter mode on
    CPU; compiled-path equality is checked on TPU by ops/edt_pallas.py
    benchmarks)."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from iris_lama_tpu.ops import edt_pallas as ep

    obst = jnp.asarray(rng.random((128, 128)) < 0.03)
    cap, r = 100, 10
    vert = pl.pallas_call(
        functools.partial(ep._vertical_kernel, radius=r),
        out_shape=jax.ShapeDtypeStruct(obst.shape, jnp.int32),
        interpret=True)
    horiz = pl.pallas_call(
        functools.partial(ep._horizontal_kernel, max_sqdist=cap, radius=r),
        out_shape=jax.ShapeDtypeStruct(obst.shape, jnp.int32),
        interpret=True)
    got = np.asarray(horiz(vert(obst)))
    expect = np.asarray(dmod.edt2d(obst, cap, r))
    np.testing.assert_array_equal(got, expect)


def test_pallas_scatter_matches_xla_interpret():
    """Pallas scatter-add kernel (interpret mode) equals XLA's .at[].add."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from iris_lama_tpu.ops import scatter_pallas as sp

    n, w = sp.CHUNK * 2, 256
    ly = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    lx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    v = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))

    idx_spec = pl.BlockSpec((sp.CHUNK,), lambda i: (i,),
                            memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        sp._scatter_kernel,
        grid=(n // sp.CHUNK,),
        in_specs=[idx_spec, idx_spec, idx_spec],
        out_specs=pl.BlockSpec((w, w), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, w), jnp.int32),
        interpret=True)
    got = np.asarray(call(ly, lx, v))
    expect = np.asarray(jnp.zeros((w, w), jnp.int32).at[ly, lx].add(v))
    np.testing.assert_array_equal(got, expect)


def test_sorted_scatter_matches_xla_interpret():
    """Sorted per-tile scatter kernel (interpret mode) equals .at[].add."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from iris_lama_tpu.ops import scatter_sorted as ss

    n, w = ss.CHUNK * 2 + 100, 256
    ly = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    lx = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    v = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    packed = jnp.sort(ss.pack_updates(ly, lx, v))
    pad = (-n) % ss.CHUNK
    last_code = ((w // 8 - 1) << 9) | (w // 128 - 1)
    packed = jnp.concatenate([packed,
                              jnp.full(pad, last_code << 11, jnp.int32)])
    n_chunks = packed.shape[0] // ss.CHUNK
    kernel = functools.partial(ss._kernel, n_tx=w // 128, n_chunks=n_chunks)
    call = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((ss.CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((w, w), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=True)
    got = np.asarray(call(packed))
    expect = np.asarray(jnp.zeros((w, w), jnp.int32).at[ly, lx].add(v))
    np.testing.assert_array_equal(got, expect)

"""3D dynamic distance map oracles: windowed incremental updates must match
brute force; trilinear interpolation + gradient must match numpy."""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.sdm import pool as pool_mod
from iris_lama_tpu.sdm.distance3d import (Distance3Config, Distance3State,
                                          add_obstacles3, distance3,
                                          distance3_init, remove_obstacles3,
                                          update3)
from iris_lama_tpu.sdm.occupancy3d import MapGeometry3

CFG = Distance3Config(MapGeometry3(resolution=0.1, log2dim=3), l2_max=0.4)


def _obstacle_cells(state):
    keys = np.asarray(pool_mod.active_keys(state.table)[0])
    mask = np.asarray(pool_mod.active_slot_mask(state.table))
    obst = np.asarray(state.obstacle)
    out = []
    L = CFG.geometry.patch_length
    m = (1 << 10) - 1
    for slot in np.nonzero(mask)[0]:
        k = int(keys[slot])
        pxyz = np.array([k >> 20, (k >> 10) & m, k & m]) * L
        for z, y, x in zip(*np.nonzero(obst[slot])):
            out.append(pxyz + np.array([x, y, z]))
    return np.asarray(out) if out else np.zeros((0, 3), np.int64)


def _check_exact(state):
    """Every allocated cell's sqdist equals the brute-force capped value."""
    obs = _obstacle_cells(state)
    keys = np.asarray(pool_mod.active_keys(state.table)[0])
    mask = np.asarray(pool_mod.active_slot_mask(state.table))
    sq = np.asarray(state.sqdist)
    L = CFG.geometry.patch_length
    m = (1 << 10) - 1
    for slot in np.nonzero(mask)[0]:
        k = int(keys[slot])
        anchor = np.array([k >> 20, (k >> 10) & m, k & m]) * L
        zz, yy, xx = np.mgrid[0:L, 0:L, 0:L]
        cells = anchor + np.stack([xx, yy, zz], -1)      # [L,L,L,3] (x,y,z)
        if len(obs):
            d2 = ((cells[..., None, :] - obs[None, None, None]) ** 2
                  ).sum(-1).min(-1)
        else:
            d2 = np.full((L, L, L), CFG.max_sqdist)
        d2 = np.minimum(d2, CFG.max_sqdist)
        np.testing.assert_array_equal(sq[slot], d2, err_msg=str(slot))


def _cells(pts):
    return CFG.geometry.w2m(jnp.asarray(pts, jnp.float32))


def test_add_obstacles_matches_brute_force():
    state = distance3_init(CFG, capacity=256)
    pts = np.array([[0.15, 0.22, 0.31], [0.55, 0.18, 0.40],
                    [-0.42, -0.13, 0.08]])
    state = add_obstacles3(state, CFG, _cells(pts))
    state = update3(state, CFG)
    _check_exact(state)


def test_incremental_equals_batch():
    a = np.array([[0.1, 0.1, 0.1], [0.4, 0.2, 0.3]])
    b = np.array([[-0.3, 0.15, -0.2], [0.12, 0.42, 0.11]])

    inc = distance3_init(CFG, capacity=256)
    inc = update3(add_obstacles3(inc, CFG, _cells(a)), CFG)
    inc = update3(add_obstacles3(inc, CFG, _cells(b)), CFG)

    bat = distance3_init(CFG, capacity=256)
    bat = update3(add_obstacles3(bat, CFG, _cells(np.vstack([a, b]))), CFG)

    # same values at every patch both allocated (the incremental path may
    # allocate extra halo patches in the first round; values still exact)
    _check_exact(inc)
    _check_exact(bat)


def test_remove_obstacles_raise_equivalent():
    """Removing obstacles must RAISE distances exactly (the hard case the
    reference needs its raise-wavefront for, dynamic_distance_map.cpp:
    244-279)."""
    a = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1]])
    b = np.array([[0.1, 0.35, 0.1]])
    state = distance3_init(CFG, capacity=256)
    state = update3(add_obstacles3(state, CFG,
                                   _cells(np.vstack([a, b]))), CFG)
    state = update3(remove_obstacles3(state, CFG, _cells(b)), CFG)
    _check_exact(state)
    assert len(_obstacle_cells(state)) == len(a)


def test_capped_max_dirty_with_overflow_carry():
    """O(dirty) path: a small max_dirty recomputes only that many patches
    per call, keeps the overflow dirty, and repeated calls drain to the
    exact full-recompute result."""
    state = distance3_init(CFG, capacity=256)
    pts = np.array([[0.15, 0.22, 0.31], [0.55, 0.18, 0.40],
                    [-0.42, -0.13, 0.08], [0.8, -0.6, 0.2]])
    state = add_obstacles3(state, CFG, _cells(pts))
    n_dirty = int(np.asarray(
        (state.dirty[:-1]
         & pool_mod.active_slot_mask(state.table)).sum()))
    assert n_dirty > 3
    # drain 3 patches at a time; the overflow must carry its dirty bit
    state = update3(state, CFG, max_dirty=3)
    rem = int(np.asarray(
        (state.dirty[:-1]
         & pool_mod.active_slot_mask(state.table)).sum()))
    assert rem == n_dirty - 3
    while rem > 0:
        state = update3(state, CFG, max_dirty=3)
        rem = int(np.asarray(
            (state.dirty[:-1]
             & pool_mod.active_slot_mask(state.table)).sum()))
    _check_exact(state)


def test_capped_max_dirty_incremental_remove():
    """Capped drain is exact across an add-then-remove sequence too."""
    a = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1]])
    b = np.array([[0.1, 0.35, 0.1]])
    state = distance3_init(CFG, capacity=256)
    state = add_obstacles3(state, CFG, _cells(np.vstack([a, b])))
    for _ in range(64):
        state = update3(state, CFG, max_dirty=4)
        if not bool(np.asarray(state.dirty.any())):
            break
    state = remove_obstacles3(state, CFG, _cells(b))
    for _ in range(64):
        state = update3(state, CFG, max_dirty=4)
        if not bool(np.asarray(state.dirty.any())):
            break
    _check_exact(state)


def test_trilinear_interp_and_gradient():
    state = distance3_init(CFG, capacity=256)
    pts = np.array([[0.2, 0.2, 0.2]])
    state = update3(add_obstacles3(state, CFG, _cells(pts)), CFG)

    # off-cell-boundary queries: the field is piecewise trilinear, so the
    # central finite difference only equals the analytic gradient strictly
    # inside a cell
    q = jnp.asarray(np.array([[0.333, 0.217, 0.243], [0.183, 0.274, 0.157]]),
                    jnp.float32)
    d, g = distance3(state, CFG, q)
    d, g = np.asarray(d), np.asarray(g)
    # distance roughly euclidean to the obstacle point (coarse: capped,
    # cell-quantized field)
    ref = np.linalg.norm(np.asarray(q) - pts[0], axis=1)
    assert np.all(np.abs(d - ref) < 2.5 * CFG.geometry.resolution), (d, ref)

    # gradient matches central finite differences of the interpolated field
    eps = 1e-3
    for ax in range(3):
        dq = np.zeros(3, np.float32)
        dq[ax] = eps
        dp, _ = distance3(state, CFG, q + dq)
        dm, _ = distance3(state, CFG, q - dq)
        fd = (np.asarray(dp) - np.asarray(dm)) / (2 * eps)
        np.testing.assert_allclose(g[:, ax], fd, atol=2e-2)

    # far from any obstacle: capped at max_dist, zero gradient
    far = jnp.asarray([[3.0, 3.0, 3.0]], jnp.float32)
    dfar, gfar = distance3(state, CFG, far)
    assert abs(float(dfar[0]) - CFG.max_dist) < 1e-6
    np.testing.assert_allclose(np.asarray(gfar), 0.0, atol=1e-6)

"""Host spill tier (sdm/spill.py): unbounded maps on a bounded device pool.

reference semantics being reproduced: the LRU compress-on-evict machinery
(src/sdm/map.cpp:375-398, 593-623) — here as device-pool working set +
LZ4-compressed host store with refill-before-use.
"""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.sdm import mapping, pool as pool_mod, spill
from iris_lama_tpu.utils import simulator


def _small_cfg():
    from iris_lama_tpu.sdm.geometry import MapGeometry
    return mapping.MappingConfig(geometry=MapGeometry(0.1, 3, False),
                                 max_range=3.0, pose_slack=0.5,
                                 capacity=64)


def _state_with_patches(cfg, keys_vals):
    state = mapping.slam_map_init(cfg)
    keys = jnp.asarray([k for k, _ in keys_vals], jnp.int32)
    table, slots = pool_mod.table_insert(state.table, keys)
    length = cfg.geometry.patch_length
    occ = state.occupied
    vis = state.visited
    dist = state.dist
    for (k, v), s in zip(keys_vals, np.asarray(slots)):
        occ = occ.at[s].set(jnp.full((length, length), v, occ.dtype))
        vis = vis.at[s].set(jnp.full((length, length), 2 * v, vis.dtype))
        dist = dist.at[s].set(jnp.full((length, length), 0.1 * v, jnp.float32))
    return state._replace(table=table, occupied=occ, visited=vis, dist=dist)


def test_extract_inject_roundtrip():
    cfg = _small_cfg()
    state = _state_with_patches(cfg, [(100, 3), (200, 5), (300, 7)])
    n0 = int(state.table.num_patches())

    keys = jnp.asarray([200, 300, 999, -1], jnp.int32)
    state, occ, vis, dist, present = spill.extract_patches(state, cfg, keys)
    np.testing.assert_array_equal(np.asarray(present), [True, True, False,
                                                        False])
    assert int(state.table.num_patches()) == n0 - 2
    assert np.all(np.asarray(occ[0]) == 5) and np.all(np.asarray(occ[1]) == 7)
    assert np.allclose(np.asarray(dist[1]), 0.7, atol=1e-6)
    # extracted cells were cleared: a fresh lookup misses, and the freed
    # slot's arrays hold init values
    assert int(pool_mod.table_lookup(state.table, jnp.int32(200))) == -1

    # inject back into a different map that already holds key 200
    other = _state_with_patches(cfg, [(200, 9)])
    # key 999 was absent at extract time; injecting it creates a patch with
    # the default blocks (harmless — refill only ever passes stored keys)
    other, droppable = spill.inject_patches(other, cfg, keys, occ, vis, dist)
    np.testing.assert_array_equal(np.asarray(droppable), [True, True, True,
                                                          False])
    s200 = int(pool_mod.table_lookup(other.table, jnp.int32(200)))
    s300 = int(pool_mod.table_lookup(other.table, jnp.int32(300)))
    assert s200 >= 0 and s300 >= 0
    # device copy of 200 was newer: untouched
    assert np.all(np.asarray(other.occupied[s200]) == 9)
    # 300 was injected from the spilled blocks
    assert np.all(np.asarray(other.occupied[s300]) == 7)
    # trash slot invariants preserved (stray writes cleaned)
    assert np.all(np.asarray(other.occupied[-1]) == 0)
    assert np.all(np.asarray(other.visited[-1]) == 0)
    assert np.allclose(np.asarray(other.dist[-1]), cfg.distance.max_dist)


def test_store_codec_roundtrip():
    cfg = _small_cfg()
    geo = cfg.geometry
    sp = spill.HostSpillStore(cfg, geo)
    length = geo.patch_length
    occ = (np.arange(length * length) % 7).astype(np.uint16).reshape(
        length, length)
    vis = (2 * occ).astype(np.uint16)
    dist = (0.25 * occ).astype(np.float32)
    blob = sp._pack(occ.tobytes(), vis.tobytes(), dist.tobytes())
    o2, v2, d2 = sp._unpack(blob)
    np.testing.assert_array_equal(o2, occ)
    np.testing.assert_array_equal(v2, vis)
    np.testing.assert_array_equal(d2, dist)


def _run_slam(use_compression, capacity, n_steps=240):
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=4,
        laser=simulator.LaserSpec(n_beams=120, max_range=3.0)))
    # sized so the full tour allocates ~400 patches but the keep zone around
    # any one pose holds ~130: a 160-slot pool alone must overflow, the
    # spill tier must not
    slam = Slam2D(Slam2DOptions(resolution=0.1, patch_size=8, max_range=3.0,
                                l2_max=0.3, trans_thresh=0.15,
                                rot_thresh=0.15, capacity=capacity,
                                pose_slack=0.5, max_iter=30,
                                use_compression=use_compression))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    gt = []
    for k in range(n_steps):
        if slam.update(data.clouds[k], data.odometry[k], data.timestamps[k]):
            gt.append(data.poses_gt[k])
    traj = slam.trajectory()
    return slam, traj[-len(gt):], np.asarray(gt)


def test_slam_with_spill_is_unbounded():
    # without the spill tier the pool overflows...
    slam_plain, _, _ = _run_slam(False, capacity=160)
    assert slam_plain._last_info["overflow"] > 0

    # ...with it, the run stays clean and spills AND refills actually happen
    slam_spill, est_s, gt = _run_slam(True, capacity=160)
    assert slam_spill._last_info["overflow"] == 0
    sp = slam_spill._spill
    assert sp.spills > 0
    assert sp.refills > 0 and sp.cache_hit > 0
    assert sp.memory_usage() > 0 or len(sp.store) == 0

    # the strongest spec: spill/refill is EXACT, so the bounded-pool run
    # must reproduce the unbounded-pool run bit-for-bit (the update windows
    # see identical cell content; slot permutations are invisible). SLAM
    # dynamics are chaotic, so any spill-induced perturbation would explode
    # into a visible trajectory difference.
    slam_big, est_b, _ = _run_slam(False, capacity=2048)
    assert slam_big._last_info["overflow"] == 0
    np.testing.assert_array_equal(est_s, est_b)

    # full_map() re-merges the host store: cell-exact vs the unbounded map
    merged = slam_spill.full_map()
    big = slam_big.map
    keys_b, mask_b = pool_mod.active_keys(big.table)
    keys_b = np.asarray(keys_b)[np.asarray(mask_b)]
    slots_m = np.asarray(pool_mod.table_lookup(merged.table,
                                               jnp.asarray(keys_b)))
    slots_b = np.asarray(pool_mod.table_lookup(big.table,
                                               jnp.asarray(keys_b)))
    assert np.all(slots_m >= 0), "merged map is missing patches"
    np.testing.assert_array_equal(np.asarray(merged.occupied)[slots_m],
                                  np.asarray(big.occupied)[slots_b])
    np.testing.assert_array_equal(np.asarray(merged.visited)[slots_m],
                                  np.asarray(big.visited)[slots_b])
    np.testing.assert_array_equal(np.asarray(merged.dist)[slots_m],
                                  np.asarray(big.dist)[slots_b])

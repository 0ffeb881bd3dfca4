"""Tests for the patch-pool hash table and coordinate algebra.

Oracle: a plain Python dict and float64 numpy formulas mirroring
reference map.h:125-198 semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.sdm import pool
from iris_lama_tpu.sdm.geometry import MapGeometry

rng = np.random.default_rng(42)


def test_w2m_round_half_up():
    geo = MapGeometry(resolution=0.05, log2dim=5)
    world = np.array([[0.0, 0.0], [0.024, 0.026], [-0.024, -0.026],
                      [1.0, -1.0]], np.float32)
    cells = np.asarray(geo.w2m(world))
    off = geo.cell_offset
    expect = np.array([[0, 0], [0, 1], [0, -1], [20, -20]]) + off
    np.testing.assert_array_equal(cells, expect)


def test_m2w_inverse():
    geo = MapGeometry(resolution=0.05, log2dim=5)
    world = rng.uniform(-50, 50, (256, 2)).astype(np.float32)
    cells = geo.w2m(world)
    back = np.asarray(geo.m2w(cells))
    # cell centers within half a resolution of the input
    np.testing.assert_allclose(back, world, atol=0.5 * geo.resolution + 1e-4)


def test_w2m_frac_consistency():
    geo = MapGeometry(resolution=0.05, log2dim=5)
    world = rng.uniform(-30, 30, (128, 2)).astype(np.float32)
    mi, frac = geo.w2m_frac(world)
    mi, frac = np.asarray(mi), np.asarray(frac)
    assert np.all(frac >= 0) and np.all(frac < 1)
    # floor + frac reproduces world * scale + offset
    recon = (mi - geo.cell_offset + frac) * geo.resolution
    np.testing.assert_allclose(recon, world, atol=1e-3)


def test_patch_key_roundtrip():
    geo = MapGeometry(resolution=0.05, log2dim=5)
    world = rng.uniform(-100, 100, (512, 2)).astype(np.float32)
    cells = geo.w2m(world)
    keys = geo.m2p(cells)
    anchors = np.asarray(geo.p2anchor(keys))
    cells_np = np.asarray(cells)
    # anchor is the patch-aligned floor of the cell coords
    np.testing.assert_array_equal(anchors, (cells_np >> 5) << 5)
    local = np.asarray(geo.m2local(cells))
    np.testing.assert_array_equal(anchors + local, cells_np)


def test_table_insert_lookup_roundtrip():
    table = pool.table_init(capacity=64)
    keys = np.unique(rng.integers(0, 1 << 30, 40).astype(np.int32))
    k = jnp.asarray(keys)
    table, slots = jax.jit(pool.table_insert)(table, k)
    slots = np.asarray(slots)
    assert np.all(slots >= 0)
    assert len(np.unique(slots)) == len(keys)
    assert int(table.overflow) == 0

    found = np.asarray(pool.table_lookup(table, k))
    np.testing.assert_array_equal(found, slots)

    # absent keys return -1
    absent = jnp.asarray(np.array([7, 9, 11], np.int32) + (1 << 30))
    np.testing.assert_array_equal(np.asarray(pool.table_lookup(table, absent)),
                                  -1)


def test_table_insert_idempotent():
    table = pool.table_init(capacity=32)
    k = jnp.asarray(np.array([5, 10, 15], np.int32))
    table, s1 = pool.table_insert(table, k)
    table, s2 = pool.table_insert(table, k)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert int(table.num_patches()) == 3


def test_table_insert_skips_padding():
    table = pool.table_init(capacity=8)
    k = jnp.asarray(np.array([3, -1, 4, -1], np.int32))
    table, slots = pool.table_insert(table, k)
    slots = np.asarray(slots)
    assert slots[0] >= 0 and slots[2] >= 0
    assert slots[1] == -1 and slots[3] == -1
    assert int(table.num_patches()) == 2


def test_table_pool_full_overflow():
    table = pool.table_init(capacity=4)
    k = jnp.asarray(np.arange(6, dtype=np.int32) * 97 + 1)
    table, slots = pool.table_insert(table, k)
    slots = np.asarray(slots)
    assert np.sum(slots >= 0) == 4
    assert int(table.overflow) == 2


def test_table_remove_and_reinsert():
    table = pool.table_init(capacity=16)
    k = jnp.asarray(np.array([100, 200, 300], np.int32))
    table, slots0 = pool.table_insert(table, k)
    table, freed = pool.table_remove(table, jnp.asarray([200], dtype=jnp.int32))
    assert int(freed[0]) == int(np.asarray(slots0)[1])
    assert int(pool.table_lookup(table, jnp.asarray([200], dtype=jnp.int32))[0]) == -1
    # 100 and 300 still found
    s = np.asarray(pool.table_lookup(table, jnp.asarray([100, 300], dtype=jnp.int32)))
    assert np.all(s >= 0)
    # reinsert gets the freed slot back
    table, s200 = pool.table_insert(table, jnp.asarray([200], dtype=jnp.int32))
    assert int(s200[0]) == int(freed[0])
    assert int(table.num_patches()) == 3


def test_active_slot_mask_and_keys():
    table = pool.table_init(capacity=8)
    k = jnp.asarray(np.array([11, 22, 33], np.int32))
    table, slots = pool.table_insert(table, k)
    mask = np.asarray(pool.active_slot_mask(table))
    assert mask.sum() == 3
    keys, kmask = pool.active_keys(table)
    keys, kmask = np.asarray(keys), np.asarray(kmask)
    assert set(keys[kmask]) == {11, 22, 33}


def test_randomized_against_dict_oracle():
    cap = 256
    table = pool.table_init(capacity=cap)
    oracle = {}
    insert = jax.jit(pool.table_insert)
    for _ in range(10):
        batch = np.unique(rng.integers(0, 200, 24)).astype(np.int32)
        table, slots = insert(table, jnp.asarray(batch))
        slots = np.asarray(slots)
        for key, slot in zip(batch, slots):
            if key in oracle:
                assert oracle[key] == slot
            else:
                assert slot >= 0
                oracle[key] = slot
    assert int(table.num_patches()) == len(oracle)
    # final lookup of every key matches
    all_keys = np.array(sorted(oracle), np.int32)
    got = np.asarray(pool.table_lookup(table, jnp.asarray(all_keys)))
    expect = np.array([oracle[k] for k in sorted(oracle)])
    np.testing.assert_array_equal(got, expect)


# ---------------------------------------------------------------------------
# table_insert_unique: the parallel 8-round claim insert
# ---------------------------------------------------------------------------

def _lookup_all(table, keys):
    return np.asarray(pool.table_lookup(table, jnp.asarray(keys, jnp.int32)))


def test_insert_unique_matches_sequential_simple():
    rng = np.random.default_rng(0)
    keys = rng.choice(100000, size=40, replace=False).astype(np.int32)
    keys[5] = -1
    keys[17] = -1   # padding entries are skipped

    t_seq = pool.table_init(capacity=64)
    t_par = pool.table_init(capacity=64)
    t_seq, s_seq = pool.table_insert(t_seq, jnp.asarray(keys))
    t_par, s_par = pool.table_insert_unique(t_par, jnp.asarray(keys))
    # identical slot assignment (same free-stack pop order) and counts
    np.testing.assert_array_equal(np.asarray(s_par), np.asarray(s_seq))
    assert int(t_par.num_patches()) == int(t_seq.num_patches())
    # all lookups agree
    np.testing.assert_array_equal(_lookup_all(t_par, keys),
                                  _lookup_all(t_seq, keys))


def test_insert_unique_existing_keys_and_second_batch():
    rng = np.random.default_rng(1)
    a = rng.choice(100000, size=30, replace=False).astype(np.int32)
    b = np.concatenate([a[:10], rng.choice(100000, size=20,
                                           replace=False) + 200000])
    b = b.astype(np.int32)
    table = pool.table_init(capacity=128)
    table, _ = pool.table_insert_unique(table, jnp.asarray(a))
    table, slots_b = pool.table_insert_unique(table, jnp.asarray(b))
    # existing keys return their existing slots
    np.testing.assert_array_equal(np.asarray(slots_b[:10]),
                                  _lookup_all(table, a[:10]))
    assert np.all(_lookup_all(table, b) >= 0)
    assert int(table.num_patches()) == 50


def test_insert_unique_pool_full_overflow():
    table = pool.table_init(capacity=4)
    keys = jnp.asarray(np.arange(10, 17, dtype=np.int32) * 977)
    table, slots = pool.table_insert_unique(table, keys)
    s = np.asarray(slots)
    assert (s >= 0).sum() == 4
    assert int(table.overflow) == 3
    assert int(table.num_patches()) == 4
    # placed keys all findable; failed ones absent
    found = _lookup_all(table, np.asarray(keys))
    np.testing.assert_array_equal(found, s)


def test_insert_unique_after_removals_uses_tombstones():
    table = pool.table_init(capacity=32)
    first = jnp.asarray(np.arange(1, 13, dtype=np.int32) * 4099)
    table, _ = pool.table_insert_unique(table, first)
    table, _ = pool.table_remove(table, first[:6])
    second = jnp.asarray(np.arange(20, 30, dtype=np.int32) * 6151)
    table, slots = pool.table_insert_unique(table, second)
    assert np.all(np.asarray(slots) >= 0)
    keep = np.asarray(first[6:])
    assert np.all(_lookup_all(table, keep) >= 0)
    np.testing.assert_array_equal(_lookup_all(table, np.asarray(second)),
                                  np.asarray(slots))
    assert int(table.num_patches()) == 16


def test_insert_unique_randomized_vs_dict_oracle():
    rng = np.random.default_rng(7)
    table = pool.table_init(capacity=1024)
    oracle = {}
    for _ in range(12):
        batch = rng.choice(5000, size=48, replace=False).astype(np.int32)
        batch[rng.uniform(size=48) < 0.3] = -1
        table, slots = pool.table_insert_unique(table, jnp.asarray(batch))
        s = np.asarray(slots)
        for k, sl in zip(batch, s):
            if k < 0:
                continue
            assert sl >= 0
            if k in oracle:
                assert oracle[k] == sl
            else:
                oracle[k] = sl
        # remove a random known subset
        if oracle and rng.uniform() < 0.5:
            rm = rng.choice(list(oracle), size=min(9, len(oracle)),
                            replace=False).astype(np.int32)
            table, _ = pool.table_remove(table, jnp.asarray(rm))
            for k in rm:
                del oracle[int(k)]
    ks = np.asarray(list(oracle), np.int32)
    np.testing.assert_array_equal(_lookup_all(table, ks),
                                  np.asarray([oracle[int(k)] for k in ks]))
    assert int(table.num_patches()) == len(oracle)


def test_table_remove_vec_equals_loop():
    """table_remove_vec is bit-identical to table_remove for unique keys
    (including absent keys, -1 padding, and free-list push order)."""
    import numpy as np
    import jax.numpy as jnp
    from iris_lama_tpu.sdm import pool

    rng = np.random.default_rng(3)
    t = pool.table_init(64)
    keys = rng.choice(20000, size=40, replace=False).astype(np.int32)
    t, slots = pool.table_insert(t, jnp.asarray(keys))
    # remove a mix: present keys, absent keys, -1 padding
    rm = np.concatenate([keys[5:20],
                         np.asarray([99991, 99992], np.int32),
                         np.full(7, -1, np.int32)])
    a, freed_a = pool.table_remove(t, jnp.asarray(rm))
    b, freed_b = pool.table_remove_vec(t, jnp.asarray(rm))
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    np.testing.assert_array_equal(np.asarray(freed_a), np.asarray(freed_b))
    # removed keys are gone; survivors still resolve
    looked = np.asarray(pool.table_lookup(b, jnp.asarray(keys)))
    assert (looked[5:20] == -1).all()
    assert (looked[:5] >= 0).all() and (looked[20:] >= 0).all()

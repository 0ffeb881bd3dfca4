"""sdm/window byte-plane MXU gather: bit-exact vs the row-gather path
for every pool dtype (s8, u8, u16, f32), including missing slots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.sdm import window as win_mod

CAP, K, N = 257, 64, 100


@pytest.mark.parametrize("dtype,default", [
    (np.int8, -5), (np.uint8, 7), (np.uint16, 9), (np.float32, 0.75),
])
def test_gather_rows_mxu_exact(dtype, default):
    rng = np.random.default_rng(3)
    if dtype == np.float32:
        arr = rng.uniform(-2.0, 2.0, (CAP, K)).astype(dtype)
        # include denormals / negative zero / exact bit patterns
        arr[0, 0] = -0.0
        arr[1, 1] = np.float32(1e-42)
    elif dtype == np.int8:
        arr = rng.integers(-128, 128, (CAP, K)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(0, int(info.max) + 1, (CAP, K)).astype(dtype)
    slots = rng.integers(0, CAP, N).astype(np.int32)
    slots[::7] = -1                     # missing patches

    got = np.asarray(win_mod._gather_rows_mxu(
        jnp.asarray(arr), jnp.asarray(slots), default))

    want = arr[np.clip(slots, 0, CAP - 1)]
    want[slots < 0] = default
    if dtype == np.float32:
        np.testing.assert_array_equal(got.view(np.uint32),
                                      want.view(np.uint32))
    else:
        np.testing.assert_array_equal(got, want)


def test_gather_window_paths_agree(monkeypatch):
    """gather_window row path vs forced MXU path on the same table."""
    from iris_lama_tpu.sdm import pool as pool_mod
    from iris_lama_tpu.sdm.geometry import MapGeometry

    geo = MapGeometry(0.05, 3, False)   # patch length 8
    wp = 4
    table = pool_mod.table_init(16)
    org = jnp.asarray([0, 0], jnp.int32)
    keys = win_mod.window_patch_keys(geo, org, wp)
    table, _ = pool_mod.table_insert(table, keys.reshape(-1)[::2])
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.integers(0, 100, (17, 8, 8)), jnp.uint16)

    slots = pool_mod.table_lookup(table, keys)

    monkeypatch.setattr(win_mod, "_GATHER_MXU", False)
    row, _ = win_mod.gather_window(table, arr, keys, 3, slots=slots)

    # force the MXU branch (runs fine on CPU, just slower)
    monkeypatch.setattr(win_mod, "_GATHER_MXU", True)
    monkeypatch.setattr(win_mod.jax, "default_backend", lambda: "tpu")
    mxu, _ = win_mod.gather_window(table, arr, keys, 3, slots=slots)

    np.testing.assert_array_equal(np.asarray(row), np.asarray(mxu))


def test_slice_mxu_matches_dynamic_slice():
    """ops/slice_mxu: batched one-hot MXU sub-window extraction is exactly
    the vmapped dynamic_slice (r5 — built because the vmapped slice lowers
    to the serialized row gather: 40 ms at 512 particles, prof_r5_gnb)."""
    from iris_lama_tpu.ops import slice_mxu

    rng = np.random.default_rng(3)
    n, H, W, ws = 7, 96, 80, 33
    grids = jnp.asarray(rng.integers(-100, 100, (n, H, W)), jnp.int8)
    starts = jnp.asarray(
        np.stack([rng.integers(0, W - ws, n),
                  rng.integers(0, H - ws, n)], -1), jnp.int32)
    want = jax.vmap(lambda g, s: jax.lax.dynamic_slice(
        g, (s[1], s[0]), (ws, ws)))(grids, starts)
    got = slice_mxu.slice_windows(grids, starts, ws)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_slice_mxu_chunked_path():
    """The particle-chunked lax.map path (n > _CHUNK) equals the direct
    path; exercised with a tiny forced chunk."""
    from iris_lama_tpu.ops import slice_mxu

    rng = np.random.default_rng(5)
    n, H, W, ws = 9, 64, 64, 17
    grids = jnp.asarray(rng.integers(0, 101, (n, H, W)), jnp.int8)
    starts = jnp.asarray(
        np.stack([rng.integers(0, W - ws, n),
                  rng.integers(0, H - ws, n)], -1), jnp.int32)
    direct = slice_mxu.slice_windows(grids, starts, ws)
    old = slice_mxu._CHUNK
    try:
        slice_mxu._CHUNK = 4
        chunked = slice_mxu.slice_windows(grids, starts, ws)
    finally:
        slice_mxu._CHUNK = old
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(chunked))

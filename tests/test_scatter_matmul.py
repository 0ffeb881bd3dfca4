"""ops/scatter_matmul: the MXU one-hot deposit vs XLA scatter-add.

The TPU kernel itself runs here in Pallas interpret mode (tests are CPU);
exactness on hardware is additionally covered by the end-to-end benches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.ops import scatter_matmul as sm

H, W = 64, 128


def _data(rng, n, batch=None):
    shape = (n,) if batch is None else (batch, n)
    ly = rng.integers(0, H, shape).astype(np.int32)
    lx = rng.integers(0, W, shape).astype(np.int32)
    # ~30% invalid: sentinel row (ly == H)
    inv = rng.uniform(size=shape) < 0.3
    ly = np.where(inv, H, ly)
    return jnp.asarray(ly), jnp.asarray(lx)


@pytest.mark.parametrize("impl", ["interpret", "interpret_i8"])
def test_interpret_matches_xla_single(impl):
    rng = np.random.default_rng(0)
    ly, lx = _data(rng, 5000)
    ref = sm.scatter_counts_2d(ly, lx, H, W, impl="xla")
    out = sm.scatter_counts_2d(ly, lx, H, W, impl=impl)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert out.dtype == jnp.int32


@pytest.mark.parametrize("kimpl", ["interpret", "interpret_i8"])
def test_interpret_matches_xla_vmapped(kimpl):
    rng = np.random.default_rng(1)
    ly, lx = _data(rng, 3000, batch=5)

    def one(impl):
        return jax.vmap(
            lambda a, b: sm.scatter_counts_2d(a, b, H, W, impl=impl))(ly, lx)

    np.testing.assert_array_equal(np.asarray(one(kimpl)),
                                  np.asarray(one("xla")))


def test_pad_to_macro_chunk_is_neutral():
    rng = np.random.default_rng(2)
    # n smaller than one macro chunk: all padding
    ly, lx = _data(rng, 17)
    ref = sm.scatter_counts_2d(ly, lx, H, W, impl="xla")
    out = sm.scatter_counts_2d(ly, lx, H, W, impl="interpret")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("impl", ["interpret", "interpret_i8"])
def test_counts_accumulate_duplicates(impl):
    ly = jnp.asarray(np.full(4100, 3, np.int32))
    lx = jnp.asarray(np.full(4100, 7, np.int32))
    out = sm.scatter_counts_2d(ly, lx, H, W, impl=impl)
    assert int(out[3, 7]) == 4100
    assert int(jnp.sum(out)) == 4100


def test_non_tile_shapes_fall_back_to_xla():
    rng = np.random.default_rng(3)
    ly = jnp.asarray(rng.integers(0, 10, 50).astype(np.int32))
    lx = jnp.asarray(rng.integers(0, 30, 50).astype(np.int32))
    out = sm.scatter_counts_2d(ly, lx, 10, 30, impl="mxu")  # falls back
    ref = sm.scatter_counts_2d(ly, lx, 10, 30, impl="xla")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_default_impl_on_cpu_is_xla():
    # tests force the CPU backend; the auto path must not build TPU kernels
    ly = jnp.zeros(10, jnp.int32)
    lx = jnp.zeros(10, jnp.int32)
    out = sm.scatter_counts_2d(ly, lx, H, W)
    assert int(out[0, 0]) == 10

@pytest.mark.parametrize("impl", ["interpret", "interpret_i8"])
def test_banded_matches_xla_sector_ordered(impl):
    # beam-major layout with angular locality: per-chunk row extent small
    rng = np.random.default_rng(4)
    b, t = 40, 128  # 5120 elements -> 2 macro chunks
    ang = np.linspace(0, np.pi / 3, b)
    rad = rng.uniform(0, 50, (b, t))
    ly = (32 + rad * np.sin(ang)[:, None]).astype(np.int32).reshape(-1)
    lx = (rad * np.cos(ang)[:, None]).astype(np.int32).reshape(-1)
    inv = rng.uniform(size=ly.shape) < 0.2
    ly = np.where(inv, H, ly)
    ly, lx = jnp.asarray(ly), jnp.asarray(lx)
    ref = sm.scatter_counts_2d(ly, lx, H, W, impl="xla")
    out = sm.scatter_counts_2d(ly, lx, H, W, impl=impl, band=56)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("impl", ["interpret", "interpret_i8"])
def test_banded_out_of_band_fallback_exact(impl):
    # adversarial: rows span the full grid inside one chunk -> the banded
    # kernel must route out-of-band elements through the XLA fix-up
    rng = np.random.default_rng(5)
    ly, lx = _data(rng, 5000)
    ref = sm.scatter_counts_2d(ly, lx, H, W, impl="xla")
    out = sm.scatter_counts_2d(ly, lx, H, W, impl=impl, band=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_banded_vmapped_matches_xla():
    rng = np.random.default_rng(6)
    ly, lx = _data(rng, 3000, batch=4)

    def one(impl, band=0):
        return jax.vmap(lambda a, b: sm.scatter_counts_2d(
            a, b, H, W, impl=impl, band=band))(ly, lx)

    np.testing.assert_array_equal(np.asarray(one("interpret_i8", band=24)),
                                  np.asarray(one("xla")))

"""ops/select4: the fused 4-corner selection vs the jnp one-hot math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.ops import select4 as s4

H, W = 48, 64


def _data(rng, n, batch=None):
    gshape = (H, W) if batch is None else (batch, H, W)
    ishape = (n,) if batch is None else (batch, n)
    grid = rng.integers(0, 101, gshape).astype(np.int8)
    # indices straddle the borders (incl. negative / past-edge)
    ly = rng.integers(-3, H + 3, ishape).astype(np.int32)
    lx = rng.integers(-3, W + 3, ishape).astype(np.int32)
    return jnp.asarray(grid), jnp.asarray(ly), jnp.asarray(lx)


def _oracle(grid, ly, lx):
    g = np.asarray(grid)
    ly0 = np.clip(np.asarray(ly), 0, H - 1)
    ly1 = np.clip(np.asarray(ly) + 1, 0, H - 1)
    lx0 = np.clip(np.asarray(lx), 0, W - 1)
    lx1 = np.clip(np.asarray(lx) + 1, 0, W - 1)
    return np.stack([g[ly0, lx0], g[ly0, lx1], g[ly1, lx0], g[ly1, lx1]],
                    axis=0).astype(np.int32)


@pytest.mark.parametrize("impl", ["jnp", "interpret"])
def test_matches_oracle_single(impl):
    rng = np.random.default_rng(0)
    grid, ly, lx = _data(rng, 300)
    out = s4.select4_sq(grid, ly, lx, impl=impl)
    np.testing.assert_array_equal(np.asarray(out), _oracle(grid, ly, lx))


@pytest.mark.parametrize("impl", ["jnp", "interpret"])
def test_matches_oracle_vmapped(impl):
    rng = np.random.default_rng(1)
    grid, ly, lx = _data(rng, 137, batch=5)   # non-lane-multiple B
    out = jax.vmap(lambda g, a, b: s4.select4_sq(g, a, b, impl=impl)
                   )(grid, ly, lx)
    ref = np.stack([_oracle(grid[i], ly[i], lx[i]) for i in range(5)])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_default_impl_on_cpu_is_jnp():
    rng = np.random.default_rng(2)
    grid, ly, lx = _data(rng, 64)
    out = s4.select4_sq(grid, ly, lx)
    np.testing.assert_array_equal(np.asarray(out), _oracle(grid, ly, lx))

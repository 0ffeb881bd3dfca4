"""Dtype dependence of the vmapped block writeback (.at[slots].set).

Suspect: u16 scatters lower to sub-word RMW on TPU. Chained donated
state, one dispatch per rep.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 30
CAP = 2048
L = 32
NB = 256   # blocks written per particle


def bench(make_step, label, arr0, slots, blocks, reps=8):
    f = jax.jit(make_step, donate_argnums=(0,))
    arr = jnp.array(arr0)
    arr = f(arr, slots, blocks)
    jax.block_until_ready(arr)
    t0 = time.perf_counter()
    for _ in range(reps):
        arr = f(arr, slots, blocks)
    jax.block_until_ready(arr)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s} {dt:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    slots = jnp.asarray(rng.integers(0, CAP, (P, NB)).astype(np.int32))

    def step(arr, slots, blocks):
        def one(a, s, b):
            # chain: blocks derived from the previous array content
            b = b + a[0, :1, :1].astype(b.dtype)
            return a.at[s].set(b)
        return jax.vmap(one)(arr, slots, blocks)

    for dt_ in (jnp.float32, jnp.int32, jnp.uint16):
        arr = jnp.zeros((P, CAP + 1, L, L), dt_)
        blocks = jnp.asarray(
            rng.integers(0, 100, (P, NB, L, L))).astype(dt_)
        bench(step, f".at[slots].set blocks dtype={dt_.__name__}", arr,
              slots, blocks)

    # two u16 scatters vs one fused u32 scatter (occ/vis packing candidate)
    arr16a = jnp.zeros((P, CAP + 1, L, L), jnp.uint16)
    arr16b = jnp.zeros((P, CAP + 1, L, L), jnp.uint16)
    blocks16 = jnp.asarray(rng.integers(0, 100, (P, NB, L, L))).astype(
        jnp.uint16)

    def step2(pair, slots, blocks):
        a, b = pair
        def one(x, y, s, bl):
            bl = bl + x[0, :1, :1]
            return x.at[s].set(bl), y.at[s].set(bl)
        xa, xb = jax.vmap(one)(a, b, slots, blocks)
        return (xa, xb)

    f2 = jax.jit(step2, donate_argnums=(0,))
    pair = (jnp.array(arr16a), jnp.array(arr16b))
    pair = f2(pair, slots, blocks16)
    jax.block_until_ready(pair)
    t0 = time.perf_counter()
    for _ in range(8):
        pair = f2(pair, slots, blocks16)
    jax.block_until_ready(pair)
    print(f"{'two u16 scatters (occ+vis shape)':44s} "
          f"{(time.perf_counter() - t0) / 8 * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Gather/writeback variants for the PF map update (30 particles).

gather_window pulls 256 patch blocks via a one-hot matmul that casts the
ENTIRE pool array to f32 per particle (measured +5.1 ms for 3 gathers at 30
particles in prof11). Compare against XLA's native row gather, and sweep
the deposit kernel chunk. Every rep is ONE jitted dispatch chained on the
previous scalar output (see CLAUDE.md on the dispatch cache).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 30
CAP = 2048          # pool slots
L = 32              # patch length
WPP = 16            # window patches per side (16x16 = 256 blocks)


def bench(body, label, *arrays, reps=10):
    # arrays are explicit jit args — closing over device arrays bakes them
    # into the HLO as literals (413 on the remote-compile tunnel)
    step = jax.jit(body)
    out = step(jnp.float32(0), jnp.int32(0), *arrays)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = step(out * 0, jnp.int32(i + 1), *arrays)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:48s} {dt:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.integers(0, 100, (P, CAP + 1, L, L)).astype(
        np.uint16))
    vis = jnp.asarray(rng.integers(0, 200, (P, CAP + 1, L, L)).astype(
        np.uint16))
    dist = jnp.asarray(rng.uniform(0, 1, (P, CAP + 1, L, L)).astype(
        np.float32))
    slots = jnp.asarray(rng.integers(0, CAP, (P, WPP * WPP)).astype(np.int32))

    def onehot_gather(arr2d, idx):
        m = arr2d.shape[0]
        oh = (idx[:, None] == jnp.arange(m, dtype=jnp.int32)).astype(
            jnp.float32)
        return jax.lax.dot_general(oh, arr2d.astype(jnp.float32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def body_onehot(prev, i, occ, vis, dist, slots):
        def one(o, v, d, s):
            s = s + i * 0 + prev.astype(jnp.int32) * 0
            tot = jnp.float32(0)
            for arr in (o, v, d):
                flat = onehot_gather(arr.reshape(CAP + 1, -1), s)
                tot = tot + jnp.sum(flat)
            return tot
        return jnp.sum(jax.vmap(one)(occ, vis, dist, slots))

    def body_rowgather(prev, i, occ, vis, dist, slots):
        def one(o, v, d, s):
            s = s + i * 0 + prev.astype(jnp.int32) * 0
            tot = jnp.float32(0)
            for arr in (o, v, d):
                g = arr[s]                      # [256, L, L] row gather
                tot = tot + jnp.sum(g.astype(jnp.float32))
            return tot
        return jnp.sum(jax.vmap(one)(occ, vis, dist, slots))

    bench(body_onehot, "3 window gathers via one-hot matmul", occ, vis, dist, slots)
    bench(body_rowgather, "3 window gathers via XLA row gather", occ, vis, dist, slots)

    # writeback: scatter 256 blocks back per particle
    blocks = jnp.asarray(rng.uniform(0, 1, (P, WPP * WPP, L, L)).astype(
        np.float32))

    def body_writeback(prev, i, dist, slots, blocks):
        def one(d, s, b):
            return d.at[s + i * 0 + prev.astype(jnp.int32) * 0].set(b)
        return jnp.sum(jax.vmap(one)(dist, slots, blocks)[:, 0, 0, 0])

    bench(body_writeback, "window writeback .at[slots].set (1 array)", dist, slots, blocks)

    # deposit kernel chunk sweep
    from iris_lama_tpu.ops import scatter_matmul as sm
    W = 512
    N = 145_440
    ly = jnp.asarray(rng.integers(0, W, (P, N)).astype(np.int32))
    lx = jnp.asarray(rng.integers(0, W, (P, N)).astype(np.int32))
    for chunk in (256, 512, 1024):
        sm.CHUNK = chunk
        sm._MACRO = sm.SUBS * chunk
        sm._scatter_batched.clear_cache()

        def body_dep(prev, i, ly, lx):
            out = sm._scatter_batched(ly + i * 0 + prev.astype(jnp.int32) * 0,
                                      lx, W, W)
            return jnp.sum(out[:, 0])
        bench(body_dep, f"deposit kernel chunk={chunk} P={P}", ly, lx)

        def body_dep1(prev, i, ly, lx):
            out = sm._scatter_batched(
                ly[:1] + i * 0 + prev.astype(jnp.int32) * 0, lx[:1], W, W)
            return jnp.sum(out[:, 0])
        bench(body_dep1, f"deposit kernel chunk={chunk} P=1", ly, lx)
    sm.CHUNK = 512
    sm._MACRO = sm.SUBS * 512


if __name__ == "__main__":
    main()

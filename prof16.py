"""Aliasing interaction: gather-read + scatter-write of the same donated
pool array in one program (the update_maps pattern) vs scatter-only.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 30
CAP = 2048
L = 32
NB = 256


def bench(make_step, label, arrs, slots, reps=8):
    f = jax.jit(make_step, donate_argnums=(0,))
    arrs = jax.tree.map(jnp.array, arrs)
    arrs = f(arrs, slots)
    jax.block_until_ready(arrs)
    t0 = time.perf_counter()
    for _ in range(reps):
        arrs = f(arrs, slots)
    jax.block_until_ready(arrs)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:52s} {dt:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    slots = jnp.asarray(rng.integers(0, CAP, (P, NB)).astype(np.int32))
    occ = jnp.zeros((P, CAP + 1, L, L), jnp.uint16)
    vis = jnp.zeros((P, CAP + 1, L, L), jnp.uint16)
    dist = jnp.zeros((P, CAP + 1, L, L), jnp.float32)

    def scatter_only(arrs, slots):
        o, v, d = arrs
        def one(a, b, c, s):
            blk = (c[s] * 0 + 1.0)       # gather from dist only
            return (a.at[s].set((blk).astype(a.dtype)),
                    b.at[s].set((blk + 1).astype(b.dtype)),
                    c.at[s].set(blk + c[0, 0, 0]))
        return jax.vmap(one)(o, v, d, slots)

    def gather_then_scatter(arrs, slots):
        o, v, d = arrs
        def one(a, b, c, s):
            # read blocks from ALL THREE arrays, modify, write back — the
            # update_maps pattern
            ga = a[s].astype(jnp.int32)
            gb = b[s].astype(jnp.int32)
            gc = c[s]
            blk = (ga + gb).astype(jnp.float32) + gc
            return (a.at[s].set(jnp.minimum(ga + 1, 65535).astype(a.dtype)),
                    b.at[s].set(jnp.minimum(gb + 1, 65535).astype(b.dtype)),
                    c.at[s].set(blk))
        return jax.vmap(one)(o, v, d, slots)

    def gather_grid_scatter(arrs, slots):
        o, v, d = arrs
        wp = 16
        def one(a, b, c, s):
            # blocks -> dense grid -> elementwise -> blocks -> scatter
            # (includes the window transposes of gather/scatter_window)
            def to_grid(x):
                return x[s].reshape(wp, wp, L, L).transpose(0, 2, 1, 3) \
                    .reshape(wp * L, wp * L)
            def to_blocks(g):
                return g.reshape(wp, L, wp, L).transpose(0, 2, 1, 3) \
                    .reshape(NB, L, L)
            ga = to_grid(a).astype(jnp.int32)
            gb = to_grid(b).astype(jnp.int32)
            gc = to_grid(c)
            gd = (ga + gb).astype(jnp.float32) + gc
            return (a.at[s].set(to_blocks(jnp.minimum(ga + 1, 65535)
                                          ).astype(a.dtype)),
                    b.at[s].set(to_blocks(jnp.minimum(gb + 1, 65535)
                                          ).astype(b.dtype)),
                    c.at[s].set(to_blocks(gd)))
        return jax.vmap(one)(o, v, d, slots)

    bench(scatter_only, "scatter-only (3 arrays)", (occ, vis, dist), slots)
    bench(gather_then_scatter, "gather+modify+scatter same arrays",
          (occ, vis, dist), slots)
    bench(gather_grid_scatter, "gather->grid->blocks->scatter (transposes)",
          (occ, vis, dist), slots)


if __name__ == "__main__":
    main()

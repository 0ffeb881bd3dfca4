"""Probe (r5): cost of rolling the [N, W, W] resident grids by a traced
2D shift — jnp.roll vs 2x2-tile+slice vs row/col take-permutation. All
bit-exact; looking for the cheapest lowering on this toolchain (the
scroll program shows ~60 ms of roll/dus copies at 512 particles).

PYTHONPATH=. python prof_r5_roll.py [N] [W]
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iris_lama_tpu.utils import devprof

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
    rng = np.random.default_rng(0)

    def fresh():
        return (jnp.asarray(rng.integers(0, 1000, (n, w, w),
                                         dtype=np.uint16)),
                jnp.asarray(rng.integers(0, 1000, (n, w, w),
                                         dtype=np.uint16)),
                jnp.asarray(rng.integers(-100, 100, (n, w, w))
                            .astype(np.int8)))

    def roll_jnp(o, v, d, sy, sx):
        r = lambda g: jnp.roll(g, shift=(-sy, -sx), axis=(-2, -1))
        return r(o), r(v), r(d)

    def roll_concat(o, v, d, sy, sx):
        def r(g):
            gg = jnp.concatenate([g, g], axis=-2)
            gg = jnp.concatenate([gg, gg], axis=-1)
            return jax.lax.dynamic_slice(
                gg, (jnp.int32(0), sy % w, sx % w), g.shape)
        return r(o), r(v), r(d)

    def roll_take(o, v, d, sy, sx):
        rows = (jnp.arange(w, dtype=jnp.int32) + sy) % w
        cols = (jnp.arange(w, dtype=jnp.int32) + sx) % w
        def r(g):
            return jnp.take(jnp.take(g, rows, axis=-2), cols, axis=-1)
        return r(o), r(v), r(d)

    shifts = [jnp.asarray(s, jnp.int32) for s in (64, 65, 66, 67)]
    for name, fn in (("jnp.roll", roll_jnp), ("tile+slice", roll_concat),
                     ("take-perm", roll_take)):
        jf = jax.jit(fn, donate_argnums=(0, 1, 2))
        st = {"t": fresh()}

        def call(k):
            o, v, d = st["t"]
            st["t"] = jf(o, v, d, shifts[k % 4], shifts[(k + 1) % 4])
            return st["t"][0]

        try:
            ms = devprof.device_time_ms(call, lambda k: (k,), n=3)
            print(f"{name}: {ms:.2f} ms device", flush=True)
        except Exception as e:  # noqa
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        st["t"] = None


if __name__ == "__main__":
    sys.exit(main())

"""Probe (r4): DEVICE-time A/B (jax.profiler) — pool window gathers.

row  — XLA row gather (the current gather_window): serialized
       dynamic-slice lowering, measured 13-25 ms/array on device.
mxu  — byte-plane one-hot s8 matmul gather (bit-exact for any dtype).
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from iris_lama_tpu.utils.devprof import device_time_ms

    P, CAP, L, NB = 30, 2049, 32, 1156
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.integers(0, 60000, (P, CAP, L, L)), jnp.uint16)
    vis = jnp.asarray(rng.integers(0, 60000, (P, CAP, L, L)), jnp.uint16)
    dist = jnp.asarray(rng.uniform(0, 0.5, (P, CAP, L, L)), jnp.float32)
    slots = jnp.asarray(rng.integers(0, CAP - 1, (P, NB)), jnp.int32)

    def summed(os_, vs_, ds_):
        return (jnp.sum(os_.astype(jnp.int32)) +
                jnp.sum(vs_.astype(jnp.int32)) + jnp.sum(ds_))

    @jax.jit
    def row(occ, vis, dist, slots, bump):
        s = (slots + bump) % (CAP - 1)

        def one(o, v, d, s1):
            return o[s1], v[s1], d[s1]

        return summed(*jax.vmap(one)(occ, vis, dist, s))

    @jax.jit
    def mxu(occ, vis, dist, slots, bump):
        s = (slots + bump) % (CAP - 1)

        def one(o, v, d, s1):
            oh = (s1[:, None] == jnp.arange(CAP, dtype=jnp.int32)[None, :]
                  ).astype(jnp.int8)

            def sel(a):
                raw = a.reshape(CAP, L * L)
                if a.dtype == jnp.uint16:
                    byts = [(raw & 0xFF), (raw >> 8)]
                elif a.dtype == jnp.float32:
                    u = jax.lax.bitcast_convert_type(raw, jnp.uint32)
                    byts = [(u >> (8 * i)) & 0xFF for i in range(4)]
                else:
                    byts = [raw]
                acc = jnp.zeros((NB, L * L), jnp.uint32)
                for i, b in enumerate(byts):
                    r = jax.lax.dot_general(
                        oh, b.astype(jnp.int8), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = acc | ((r.astype(jnp.uint32) & 0xFF) << (8 * i))
                return acc

            og = sel(o).astype(jnp.uint16)
            vg = sel(v).astype(jnp.uint16)
            dg = jax.lax.bitcast_convert_type(sel(d), jnp.float32)
            return og, vg, dg

        return summed(*jax.vmap(one)(occ, vis, dist, s))

    for name, fn in (("row", row), ("mxu", mxu)):
        ms = device_time_ms(
            fn, lambda k: (occ, vis, dist, slots, jnp.int32(k)), n=4)
        print(f"{name:4s} {ms:8.2f} ms on-device")

    a = row(occ, vis, dist, slots, jnp.int32(5))
    b = mxu(occ, vis, dist, slots, jnp.int32(5))
    print("equal:", int(a) == int(b), int(a), int(b))


if __name__ == "__main__":
    sys.exit(main())

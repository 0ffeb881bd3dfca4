"""Scratch profiler: matmul-scatter (one-hot MXU deposit) vs XLA scatter.

Measurement notes (axon remote TPU): identical dispatches are served from a
cache, and un-jitted helper ops each pay a tunnel dispatch. So every rep is
ONE jitted program whose inputs change (a counter) and which depends on the
previous output (serialization).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.ops.scatter_matmul import _scatter_batched, _scatter_xla

W = 512          # window cells
N = 145_440      # 720 beams x 202 steps
P = 30           # particles


def bench(make_body, label, reps=10):
    step = jax.jit(make_body)
    out = step(jnp.zeros((), jnp.int32), jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        dep = (jnp.ravel(out)[0] * 0).astype(jnp.int32) if i else \
            jnp.zeros((), jnp.int32)
        out = step(dep, jnp.int32(i + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s} {dt:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, (P, 720))
    tt = np.arange(202)[None, None, :]
    yy = (W // 2 + np.sin(ang)[..., None] * tt).astype(np.int32).reshape(P, -1)
    xx = (W // 2 + np.cos(ang)[..., None] * tt).astype(np.int32).reshape(P, -1)
    valid = rng.uniform(size=(P, 720, 202)) < 0.7
    yy = np.where(valid.reshape(P, -1), yy, W).astype(np.int32)
    xx = np.where(valid.reshape(P, -1), xx, W).astype(np.int32)
    ly = jnp.asarray(np.clip(yy, 0, W))
    lx = jnp.asarray(np.clip(xx, 0, W))

    def xla_body(dep, i):
        y = ly + dep + i * 0
        return jax.vmap(lambda a, b: _scatter_xla(a, b, W, W))(y, lx)

    def mxu_body(dep, i):
        y = ly + dep + i * 0
        return _scatter_batched(y, lx, W, W)

    def xla1_body(dep, i):
        return _scatter_xla(ly[0] + dep + i * 0, lx[0], W, W)

    def mxu1_body(dep, i):
        return _scatter_batched((ly[:1] + dep + i * 0), lx[:1], W, W)

    ref = bench(xla_body, f"XLA scatter P={P}")
    out = bench(mxu_body, f"matmul-scatter P={P}")
    print(f"    exact: {bool(jnp.all(out.astype(jnp.int32) == ref))}",
          flush=True)
    bench(xla1_body, "XLA scatter P=1")
    bench(mxu1_body, "matmul-scatter P=1")

    from iris_lama_tpu.sdm.distance import edt2d
    obst = jnp.asarray(rng.uniform(size=(P, W, W)) < 0.01)

    def edt_body(dep, i):
        o = jnp.logical_or(obst, (dep + i * 0) > 0)
        return jax.vmap(lambda g: edt2d(g, 100, 10))(o)

    def edt1_body(dep, i):
        o = jnp.logical_or(obst[0], (dep + i * 0) > 0)
        return edt2d(o, 100, 10)

    bench(edt_body, f"vmapped edt2d P={P} (radius 10)")
    bench(edt1_body, "edt2d P=1 (radius 10)")


if __name__ == "__main__":
    main()

"""Probe (r5): chunked gn_batch glue cost at the 512-particle shape.

while.43 in the 512p update profile is 70.7 ms while the 11 visible
_solve_batched launches only sum to ~33 ms — this isolates the chunked
vmap call on synthetic data to see whether the glue (pad concat, per-trip
slicing, row moveaxis) or the kernel launches themselves carry the rest.

PYTHONPATH=. python prof_r5_gnb.py [P] [W] [B]
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from iris_lama_tpu.ops import gn_batch
    from iris_lama_tpu.utils import devprof

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 432
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.integers(0, 100, (P, W, W), np.int8))
    org = jnp.zeros((P, 2), jnp.int32)
    st0 = jnp.asarray(
        np.tile(np.array([10.0, 10.0, 1.0, 0.0], np.float32), (P, 1)))
    pts = jnp.asarray(rng.uniform(5, 15, (B, 2)).astype(np.float32))
    mask = jnp.ones((B,), bool)

    kw = dict(max_dist=0.5, res=0.05, scale=20.0, cell_offset=0,
              cauchy_c=0.15, eps1=1e-4, eps2=1e-4, max_iter=8,
              want_lik=True)

    g = gn_batch.group_size(W, W, B)
    print(f"P={P} W={W} B={B} group={g} chunks={-(-P // g)}")

    def solve(st):
        return jax.vmap(
            lambda gr, o, s: gn_batch.solve_window_sq(gr, o, s, pts, mask,
                                                      **kw))(grid, org, st)

    jsolve = jax.jit(solve)

    def args(k):
        return (st0 + jnp.float32(k % 13) * 1e-5,)

    ms = devprof.device_time_ms(jsolve, args, n=4)
    print(f"chunked full call: {ms:.3f} ms device")
    rows = devprof.device_breakdown(jsolve, args, n=2, top=16)
    for name, m in rows:
        print(f"{m:8.3f} ms  {name[:90]}")

    # variant: grids sliced per particle from a big resident-window array
    # (the real update's shape: vmapped dynamic_slice [W,W] out of
    # [P, RW, RW]) — isolates whether the slice is while.43's extra cost
    RW = 1088
    big = jnp.asarray(rng.integers(0, 100, (P, RW, RW), np.int8))
    starts = jnp.asarray(rng.integers(0, RW - W, (P, 2), np.int32))

    def solve_sliced(big_, starts_, st):
        def one(bg, s0, o, s):
            gr = jax.lax.dynamic_slice(bg, (s0[0], s0[1]), (W, W))
            return gn_batch.solve_window_sq(gr, o, s, pts, mask, **kw)
        return jax.vmap(one)(big_, starts_, org, st)

    jss = jax.jit(solve_sliced)

    def args_s(k):
        return (big, starts, st0 + jnp.float32(k % 13) * 1e-5)

    ms2 = devprof.device_time_ms(jss, args_s, n=4)
    rows = devprof.device_breakdown(jss, args_s, n=2, top=8)
    print(f"sliced-from-resident call: {ms2:.3f} ms device")
    for name, m in rows:
        print(f"{m:8.3f} ms  {name[:90]}")

    # single-group launch at the same shape for the per-launch floor
    grid1 = grid[:g]
    org1 = org[:g]

    def solve1(st):
        return jax.vmap(
            lambda gr, o, s: gn_batch.solve_window_sq(gr, o, s, pts, mask,
                                                      **kw))(grid1, org1,
                                                             st)

    jsolve1 = jax.jit(solve1)

    def args1(k):
        return (st0[:g] + jnp.float32(k % 13) * 1e-5,)

    ms1 = devprof.device_time_ms(jsolve1, args1, n=4)
    print(f"single-group ({g}) launch: {ms1:.3f} ms device "
          f"-> {-(-P // g)}x = {ms1 * (-(-P // g)):.2f} ms")


if __name__ == "__main__":
    sys.exit(main())

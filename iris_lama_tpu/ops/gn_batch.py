"""Batched whole-solve GN IRLS kernel: ONE Pallas launch for ALL
particles' scan-match solves, every grid VMEM-resident for the whole
IRLS loop.

Why this shape (third attempt at the PF match wall, after ops/match_eval
and ops/gn_solve): the default XLA path runs a vmapped while_loop whose
every trip launches the select4 kernel (30 sequential program instances,
each re-DMAing its grid) plus ~10 small fused kernels — the per-trip
fixed cost times the WORST lane's iteration count is ~8 of the ~11 ms PF
update (docs/STATUS.md r3). ops/gn_solve moved the loop inside the
kernel but kept grid=(P,): each particle's iterations serialize with
full per-iteration latency, so sum-of-latencies ties the XLA path.

This kernel inverts the nesting: grid=(1,), the iteration loop is outer
and the (unrolled) particle loop is inner. Per iteration the P
independent one-hot/matmul/reduction sections pipeline back-to-back on
the MXU/VPU with no program-change or launch overhead, every grid loaded
from HBM exactly once per SOLVE, and per-particle `pl.when` guards give
sum-of-iterations cost (converged lanes skip their eval entirely).
Scalar IRLS bookkeeping lives in SMEM scratch, advanced by the scalar
core while the vector core chews the next particle's evaluation.

Exact formula parity: corner selection and the residual/Jacobian/robust
algebra reuse ops/match_eval's `_corners`/`_eval_math`, the scalar
step/stop/revert logic mirrors ops/gn_solve._kernel statement for
statement (solver.cpp:53-118 / gauss_newton.cpp:53-91 semantics).
Reduction association is Mosaic-scheduled, so sums can differ from the
XLA path in the last ulp; the CPU jnp path stays the oracle.

VMEM budget (PF bench shape, P=30, match window 432, 768 beams): grids
30 x 448 x 512 s8 = 6.9 MB + one [2B, W] i32 eval transient ~3.1 MB +
one-hot ~0.7 MB — ~11 MB of the ~16 MB/core. Batches that exceed the
budget (``group_size()``, transient-aware per ADVICE r4 #2) are chunked
over particle groups and solved by sequential whole-solve launches
inside one program (lax.map in the vmap rule) — the 512-particle
BASELINE #5 config runs ~46 particles per launch instead of falling
back to the run-to-slowest-of-512 XLA while_loop path (VERDICT r4 #1).

Measured numbers live in docs/STATUS.md (r4). IRIS_GN_BATCH=0 restores
the XLA while_loop path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import match_eval
from .gn_solve import _sin_cos, _exp_compose, _solve3_scalar

# default ON (measured ~2x at PF); IRIS_GN_BATCH=0 to fall back
ENABLED = bool(int(os.environ.get("IRIS_GN_BATCH", "1")))

# r5 experiment knobs (VERDICT r4 #2 levers):
# IRIS_GN_WAYS: independent particles interleaved per inner trip (the
#   r4 pair interleave = 2). 3-way needs smaller per-eval transients to
#   fit VMEM -> combine with IRIS_GN_BSPLIT=2.
# IRIS_GN_BSPLIT: beam-axis split per evaluation: the corner one-hot/dot
#   transients shrink by the factor (two sequential half-B matmuls);
#   reduction association changes within the kernel's documented
#   last-ulp contract (sums accumulate across chunks).
# Defaults 3/2 (r5): same-session A/B on the PF bench measured 97.18
# (ways 2, no split) / 98.08 (2, split 2) / 98.30 (3, split 2) up/s —
# the halved transients let a third in-flight particle overlap, ~+1.2%.
WAYS = int(os.environ.get("IRIS_GN_WAYS", "3"))
BSPLIT = int(os.environ.get("IRIS_GN_BSPLIT", "2"))

N_ROWS = 8   # tx ty cos sin chi2 iters sum_d2 pad
_LANES = 128
_SUBLANES_S8 = 32   # s8 VMEM tile is (32, 128)

# Usable VMEM per launch (core has ~16 MB; leave headroom for Mosaic's
# own spills). Grids + the eval transients of ONE in-flight particle
# evaluation must fit; group_size() below computes how many particles
# that admits per launch, and batches larger than it are chunked into
# sequential launches inside one program (lax.map in the vmap rule).
VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _pad_up(x: int, m: int) -> int:
    return -(-x // m) * m


def group_size(h: int, w: int, b: int) -> int:
    """Particles per kernel launch so that the VMEM-resident grids plus
    the per-evaluation transients fit the budget (ADVICE r4 #2: the old
    grids-only 12 MB guard ignored the ~4 MB of transients and could
    exceed VMEM near the boundary).

    Transients per evaluation (shapes from match_eval._corners): the s8
    row one-hot [2B, Hp] and its i32 corner dot [2B, Wp]; B is padded to
    lanes, H to s8 sublanes, W to lanes (VMEM tiling).
    """
    hp, wp = _pad_up(h, _SUBLANES_S8), _pad_up(w, _LANES)
    bk = _pad_up(b, _LANES * BSPLIT)
    # per-eval transient shrinks with the beam split; the ``ways``
    # interleave reuses (Mosaic-scheduled) buffers across the in-flight
    # particles at the measured default, so it is not multiplied here —
    # raising WAYS above 2 without BSPLIT>=2 risks Mosaic VMEM overflow
    # (the r4 3-way attempt did exactly that).
    transient = (2 * bk * hp + 2 * bk * wp * 4) // BSPLIT
    return max(1, (VMEM_BUDGET_BYTES - transient) // (hp * wp))


def _kernel(org_ref, st0_ref, px_ref, py_ref, fm_ref, g_ref, out_ref,
            st_s, sums_s, stop_s, it_s, nact_s, *,
            max_dist, res, scale, cell_offset, cauchy_c, eps1, eps2,
            max_iter, want_lik, ways=2, bsplit=1):
    from jax.experimental import pallas as pl

    p_n = g_ref.shape[0]
    h = g_ref.shape[-2]
    w = g_ref.shape[-1]
    px = px_ref[0]
    py = py_ref[0]
    fm = fm_ref[0]
    scl = jnp.float32(scale)
    off = jnp.int32(cell_offset)

    # particle loops are lax.fori_loop (dynamic ref indexing), NOT Python
    # unrolls: a 30x-unrolled body with nested conds blew Mosaic's compile
    # time past 9 minutes; the rolled form compiles in normal time.
    bs = px.shape[-1] // bsplit   # beam sub-chunk (padded to a multiple)

    def sums_at(p, tx, ty, c, s, cc):
        # lie.se2_apply + geometry.w2m_frac (floor + integer offset);
        # evaluated in ``bsplit`` beam chunks (sums accumulate across
        # chunks — the per-chunk transients are 1/bsplit the size)
        g = g_ref[pl.dslice(p, 1)][0]
        total = None
        for j in range(bsplit):
            pxj = px[j * bs:(j + 1) * bs]
            pyj = py[j * bs:(j + 1) * bs]
            fmj = fm[j * bs:(j + 1) * bs]
            hx = tx + c * pxj - s * pyj
            hy = ty + s * pxj + c * pyj
            mfx = hx * scl
            mfy = hy * scl
            flx = jnp.floor(mfx)
            fly = jnp.floor(mfy)
            lx = flx.astype(jnp.int32) + off - org_ref[p, 0]
            ly = fly.astype(jnp.int32) + off - org_ref[p, 1]
            mux = mfx - flx
            muy = mfy - fly
            v00, v10, v01, v11 = match_eval._corners(ly, lx, g, h, w)
            sj = match_eval._eval_math(ly, lx, v00, v10, v01, v11, mux,
                                       muy, hx, hy, fmj, h, w, max_dist,
                                       res, scale, cc)
            total = sj if total is None else [a + b for a, b in
                                              zip(total, sj)]
        return total

    # ---- init: evaluate every particle at its start state -------------
    def init_one(p, carry):
        st_s[0, p] = st0_ref[p, 0]
        st_s[1, p] = st0_ref[p, 1]
        st_s[2, p] = st0_ref[p, 2]
        st_s[3, p] = st0_ref[p, 3]
        stop_s[0, p] = jnp.int32(0)
        it_s[0, p] = jnp.int32(0)
        s0 = sums_at(p, st0_ref[p, 0], st0_ref[p, 1], st0_ref[p, 2],
                     st0_ref[p, 3], cauchy_c)
        for i in range(10):
            sums_s[i, p] = s0[i]
        return carry

    jax.lax.fori_loop(0, p_n, init_one, jnp.int32(0))
    nact_s[0, 0] = jnp.int32(p_n)

    # ---- IRLS: fixed trips, all-stopped trips cost one SMEM read ------
    def particle_step(p, carry):
        @pl.when(stop_s[0, p] == 0)
        def _():
            tx = st_s[0, p]
            ty = st_s[1, p]
            c = st_s[2, p]
            s = st_s[3, p]
            sm = [sums_s[i, p] for i in range(10)]
            chi2 = sm[9]
            g_max = jnp.maximum(
                jnp.maximum(jnp.abs(sm[6]), jnp.abs(sm[7])),
                jnp.abs(sm[8]))
            stop_g = g_max < eps1
            h0, h1, h2 = _solve3_scalar(sm[0], sm[1], sm[2], sm[3],
                                        sm[4], sm[5], sm[6], sm[7],
                                        sm[8])
            zero = jnp.float32(0)
            h0 = jnp.where(stop_g, zero, h0)
            h1 = jnp.where(stop_g, zero, h1)
            h2 = jnp.where(stop_g, zero, h2)
            h_max = jnp.maximum(jnp.maximum(jnp.abs(h0), jnp.abs(h1)),
                                jnp.abs(h2))
            stop_now = jnp.logical_or(stop_g, h_max < eps2)

            @pl.when(stop_now)
            def _():
                # converged before the step: freeze, no it++
                stop_s[0, p] = jnp.int32(1)
                nact_s[0, 0] = nact_s[0, 0] - 1

            @pl.when(jnp.logical_not(stop_now))
            def _():
                ntx, nty, nc, ns_ = _exp_compose(h0, h1, h2,
                                                 tx, ty, c, s)
                nsm = sums_at(p, ntx, nty, nc, ns_, cauchy_c)
                ok = (chi2 - nsm[9]) > 0.0
                st_s[0, p] = jnp.where(ok, ntx, tx)
                st_s[1, p] = jnp.where(ok, nty, ty)
                st_s[2, p] = jnp.where(ok, nc, c)
                st_s[3, p] = jnp.where(ok, ns_, s)
                for i in range(10):
                    sums_s[i, p] = jnp.where(ok, nsm[i], sm[i])
                it_s[0, p] = it_s[0, p] + 1

                @pl.when(jnp.logical_not(ok))
                def _():
                    # GN: invalid step => revert + stop
                    stop_s[0, p] = jnp.int32(1)
                    nact_s[0, 0] = nact_s[0, 0] - 1
        return carry

    # ``ways`` independent particles per inner trip: their eval chains
    # have no data dependence, so Mosaic can overlap one particle's
    # one-hot/VPU work with another's MXU corner dot (a single-particle
    # body is a serial matmul->reduce->scalar chain that leaves units
    # idle). 2-way bought 7.5% in r4; 3-way fits VMEM only with
    # bsplit>=2 shrinking the per-eval transients.
    stride = (p_n + ways - 1) // ways

    def particle_group(i, carry):
        particle_step(i, carry)
        for k in range(1, ways):
            @pl.when(i + k * stride < p_n)
            def _(k=k):
                particle_step(i + k * stride, carry)
        return carry

    def trip(_, carry):
        @pl.when(nact_s[0, 0] > 0)
        def _():
            jax.lax.fori_loop(0, stride, particle_group, jnp.int32(0))
        return carry

    jax.lax.fori_loop(0, max_iter, trip, jnp.int32(0))

    # ---- outputs (+ optional likelihood eval at the final state) ------
    def emit_one(p, carry):
        tx = st_s[0, p]
        ty = st_s[1, p]
        c = st_s[2, p]
        s = st_s[3, p]
        out_ref[0, p] = tx
        out_ref[1, p] = ty
        out_ref[2, p] = c
        out_ref[3, p] = s
        out_ref[4, p] = sums_s[9, p]
        out_ref[5, p] = it_s[0, p].astype(jnp.float32)
        if want_lik:
            # unweighted masked sum d^2 at the final state (cauchy_c=0
            # makes _eval_math's s9 exactly sum((d*fm)^2))
            out_ref[6, p] = sums_at(p, tx, ty, c, s, 0.0)[9]
        else:
            out_ref[6, p] = jnp.float32(0)
        out_ref[7, p] = jnp.float32(0)
        return carry

    jax.lax.fori_loop(0, p_n, emit_one, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=tuple(range(6, 18)))
def _solve_batched(grid, org, st0, px, py, fm,
                   max_dist: float, res: float, scale: float,
                   cell_offset: int, cauchy_c: float, eps1: float,
                   eps2: float, max_iter: int, want_lik: bool,
                   interpret: bool = False, ways: int = 2,
                   bsplit: int = 1):
    """grid s8[P, H, W], org i32[P, 2], st0 f32[P, 4], px/py/fm f32[B]
    (shared across particles) -> f32[N_ROWS, P] result rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, h, w = grid.shape
    b = px.shape[-1]
    mult = _LANES * bsplit   # each beam sub-chunk stays lane-aligned
    bk = (b + mult - 1) // mult * mult
    if bk != b:
        zf = jnp.zeros((bk - b,), jnp.float32)
        px = jnp.concatenate([px, zf])
        py = jnp.concatenate([py, zf])
        fm = jnp.concatenate([fm, zf])
    px, py, fm = px[None, :], py[None, :], fm[None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, max_dist=max_dist, res=res, scale=scale,
                          cell_offset=cell_offset, cauchy_c=cauchy_c,
                          eps1=eps1, eps2=eps2, max_iter=max_iter,
                          want_lik=want_lik, ways=ways, bsplit=bsplit),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # org
            pl.BlockSpec(memory_space=pltpu.SMEM),   # st0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # px
            pl.BlockSpec(memory_space=pltpu.VMEM),   # py
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # grids
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((N_ROWS, p), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((4, p), jnp.float32),    # state
            pltpu.SMEM((10, p), jnp.float32),   # sums
            pltpu.SMEM((1, p), jnp.int32),      # stop
            pltpu.SMEM((1, p), jnp.int32),      # iterations
            pltpu.SMEM((1, 1), jnp.int32),      # n active
        ],
        interpret=interpret,
    )(org, st0, px, py, fm, grid)
    return out


@functools.lru_cache(maxsize=None)
def _make(max_dist: float, res: float, scale: float, cell_offset: int,
          cauchy_c: float, eps1: float, eps2: float, max_iter: int,
          want_lik: bool, impl: str, ways: int, bsplit: int):
    interpret = impl == "interpret"
    statics = (max_dist, res, scale, cell_offset, cauchy_c, eps1, eps2,
               max_iter, want_lik, interpret, ways, bsplit)

    @jax.custom_batching.custom_vmap
    def ev(grid, org, st0, px, py, fm):
        return _solve_batched(grid[None], org[None], st0[None], px, py, fm,
                              *statics)[:, 0]

    @ev.def_vmap
    def _batch_rule(axis_size, in_batched, grid, org, st0, px, py, fm):
        gb, ob, sb, pxb, pyb, fb = in_batched
        if pxb or pyb or fb:
            raise NotImplementedError(
                "gn_batch requires shared scan points across the batch")

        def bc(a, ab):
            return a if ab else jnp.broadcast_to(a, (axis_size,) + a.shape)

        grid, org, st0 = bc(grid, gb), bc(org, ob), bc(st0, sb)
        g = group_size(grid.shape[-2], grid.shape[-1], px.shape[-1])
        if axis_size <= g:
            rows = _solve_batched(grid, org, st0, px, py, fm, *statics)
            return rows.T, True   # [P, N_ROWS]

        # VERDICT r4 #1: batches beyond the VMEM budget (the 512-particle
        # BASELINE #5 config) chunk over particle groups — sequential
        # whole-solve launches inside ONE program (lax.map), each group's
        # grids VMEM-resident for its entire IRLS loop. Run-to-slowest is
        # per ~g-particle group instead of per 512 XLA lanes. Padding
        # replicates particle 0 (any valid operand) and is sliced off.
        c = -(-axis_size // g)
        pad = c * g - axis_size

        def padc(a):
            if not pad:
                return a
            fill = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
            return jnp.concatenate([a, fill])

        grid_c = padc(grid).reshape(c, g, *grid.shape[1:])
        org_c = padc(org).reshape(c, g, org.shape[-1])
        st0_c = padc(st0).reshape(c, g, st0.shape[-1])
        rows = jax.lax.map(
            lambda t: _solve_batched(t[0], t[1], t[2], px, py, fm,
                                     *statics),
            (grid_c, org_c, st0_c))                 # [c, N_ROWS, g]
        rows = jnp.moveaxis(rows, 1, 2).reshape(c * g, N_ROWS)
        return rows[:axis_size], True

    return ev


def solve_window_sq(grid, org_cell, state0, points_xy, mask, *,
                    max_dist, res, scale, cell_offset, cauchy_c,
                    eps1, eps2, max_iter, want_lik=False,
                    impl: str | None = None):
    """Full GN IRLS scan-match on an s8 squared-distance window, batched
    as ONE kernel launch across a vmapped particle axis.

    Same contract as ops/gn_solve.solve_window_sq: returns (state f32[4],
    iterations i32, chi2 f32, sum_d2 f32); vmap-aware over (grid,
    org_cell, state0) with scan points shared across the batch.
    """
    if impl is None:
        impl = "mxu" if jax.default_backend() == "tpu" else "interpret"
    fm = mask.astype(jnp.float32)
    rows = _make(float(max_dist), float(res), float(scale),
                 int(cell_offset), float(cauchy_c), float(eps1),
                 float(eps2), int(max_iter), bool(want_lik),
                 impl, WAYS, BSPLIT)(grid, org_cell, state0,
                                     points_xy[..., 0],
                                     points_xy[..., 1], fm)
    state = rows[..., 0:4] if rows.ndim == 2 else rows[0:4]
    if rows.ndim == 2:
        return (state, rows[..., 5].astype(jnp.int32), rows[..., 4],
                rows[..., 6])
    return (state, rows[5].astype(jnp.int32), rows[4], rows[6])

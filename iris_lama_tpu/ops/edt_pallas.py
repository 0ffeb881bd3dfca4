"""Pallas TPU kernels: exact capped Euclidean distance transform.

Two gridded kernels whose working sets live in VMEM: a per-column-strip
vertical pass (log-doubling min-plus erosion) and a per-row-strip horizontal
lower-envelope pass. Verified bit-exact against sdm/distance.py:edt2d.

Status: NOT the default. Measured on TPU v5e (axon remote-compile
toolchain) the hand kernel runs ~30 ms/576^2 vs ~1.4 ms for the XLA-fused
version — Mosaic currently lowers the lane-crossing concatenate shifts of
the horizontal pass far worse than XLA's fusion does. Kept (and tested) as
the starting point for a future in-register envelope implementation; the
production path stays on edt2d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1 << 20  # plain int: pallas kernels cannot capture traced constants


def _vertical_kernel(obst_ref, g_ref, *, radius: int):
    g = jnp.where(obst_ref[:], 0, _BIG).astype(jnp.int32)
    shift = 1
    while shift <= radius:
        pad = jnp.full((shift, g.shape[1]), _BIG, jnp.int32)
        up = jnp.concatenate([g[shift:], pad], axis=0)
        down = jnp.concatenate([pad, g[:-shift]], axis=0)
        g = jnp.minimum(g, jnp.minimum(up + shift, down + shift))
        shift <<= 1
    g_ref[:] = jnp.minimum(g, radius + 1)


def _horizontal_kernel(g_ref, out_ref, *, max_sqdist: int, radius: int):
    g = g_ref[:]
    g2 = g * g
    d2 = g2
    cap = jnp.int32(max_sqdist)
    h = g.shape[0]
    for dx in range(1, radius + 1):
        padc = jnp.full((h, dx), cap, jnp.int32)
        left = jnp.concatenate([g2[:, dx:], padc], axis=1)
        right = jnp.concatenate([padc, g2[:, :-dx]], axis=1)
        d2 = jnp.minimum(d2, jnp.minimum(left, right) + dx * dx)
    out_ref[:] = jnp.minimum(d2, cap)


@functools.partial(jax.jit, static_argnums=(1, 2))
def edt2d_pallas(obstacle, max_sqdist: int, radius: int):
    """Drop-in for sdm.distance.edt2d on TPU backends. Requires H, W
    divisible by the strip sizes (window sizes are patch multiples)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = obstacle.shape
    col_strip = 128 if w % 128 == 0 else w
    row_strip = 64 if h % 64 == 0 else h

    vert = pl.pallas_call(
        functools.partial(_vertical_kernel, radius=radius),
        grid=(w // col_strip,),
        in_specs=[pl.BlockSpec((h, col_strip), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, col_strip), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
    )
    g = vert(obstacle)

    horiz = pl.pallas_call(
        functools.partial(_horizontal_kernel, max_sqdist=max_sqdist,
                          radius=radius),
        grid=(h // row_strip,),
        in_specs=[pl.BlockSpec((row_strip, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((row_strip, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
    )
    return horiz(g)


def edt_supported() -> bool:
    """Pallas TPU lowering available on the active backend?"""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")

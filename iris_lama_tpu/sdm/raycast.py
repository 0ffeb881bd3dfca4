"""Loop-free raycasting: the reference's integer ray walk in closed form.

reference: src/sdm/map.cpp:198-258 ``computeRay`` — an error-accumulation
max-coordinate walk: per step ``error += delta`` and coordinate ``j`` advances
when ``2*error_j >= n`` (n = max |delta|), visiting cells t = 1..n-1
(the endpoint/hit cell is excluded, as is the start cell).

That sequential loop has a closed form: after ``t`` error accumulations the
number of advances of axis ``j`` is

    c_j(t) = (2*t*|delta_j| + n) // (2*n)

so *every* cell of *every* ray is computed independently — a [B, T] batch of
integer ops with no loops, no scatter ordering, no thread pool. This is the
TPU-native replacement for the per-beam callback walk in Slam2D::updateMaps
(src/slam2d.cpp:313-317) and PFSlam2D::updateParticleMaps
(src/pf_slam2d.cpp:495-505).
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_cells(from_cells, to_cells, max_steps: int):
    """All intermediate cells of each ray, vectorized.

    Args:
      from_cells: int32[B, 2] start cells (map coords).
      to_cells:   int32[B, 2] end cells (the hit; excluded from output).
      max_steps:  static bound on cells per ray (T). Rays longer than T+1
        cells are truncated (callers size T from max_range / resolution).

    Returns:
      cells: int32[B, T, 2] visited cells (t = 1..T).
      mask:  bool[B, T] — True where the cell is a real ray cell
             (t <= n-1, matching the reference's loop bound map.cpp:209).
    """
    f = jnp.asarray(from_cells, jnp.int32)
    d = jnp.asarray(to_cells, jnp.int32) - f                   # [B, 2]
    step = jnp.sign(d)
    ad = jnp.abs(d)
    n = jnp.max(ad, axis=-1)                                   # [B]
    n_safe = jnp.maximum(n, 1)

    t = jnp.arange(1, max_steps + 1, dtype=jnp.int32)          # [T]
    # c_j(t) = (2 t |d_j| + n) // (2 n)  — see module docstring.
    # Integer division by a per-beam denominator is serialized scalar work
    # on the VPU (~[B, T, 2] of them); compute the quotient with an f32
    # reciprocal instead and repair the (at most ±1) rounding with one
    # integer multiply-compare each way. Exact: operands stay below 2^24
    # (num <= 2*T*|d| + n; callers keep T, |d| in the hundreds).
    num = 2 * t[None, :, None] * ad[:, None, :] + n_safe[:, None, None]
    den = 2 * n_safe[:, None, None]                            # [B, 1, 1]
    q = jnp.floor(num.astype(jnp.float32)
                  * (1.0 / den.astype(jnp.float32))).astype(jnp.int32)
    # repair float rounding: ensure q*den <= num < (q+1)*den
    q = jnp.where(q * den > num, q - 1, q)
    c = jnp.where((q + 1) * den <= num, q + 1, q)              # [B, T, 2]
    cells = f[:, None, :] + step[:, None, :] * c
    mask = t[None, :] <= (n[:, None] - 1)                      # [B, T]
    return cells, mask

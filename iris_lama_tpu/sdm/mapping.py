"""Fused SLAM map: frequency occupancy + obstacle mask + distance field.

This is the TPU-native equivalent of the (occupancy map, dynamic distance
map) pair every LaMa SLAM algorithm maintains (reference:
src/slam2d.cpp:247-321 ``updateMaps``, src/pf_slam2d.cpp:439-509
``updateParticleMaps``). One patch table is shared by all cell arrays, so the
occupancy-driven obstacle mask and the distance field are slot-aligned and
no cross-map hash lookups are ever needed.

Per-scan update, all inside one jit (and vmap-able over particles):

1. beam endpoints + truncation (slam2d.cpp:267-300 semantics, incl. 3D norms)
2. closed-form raycast (sdm/raycast.py)
3. scatter hit/visit counts into a dense pose-centered window
4. frequency-map end-state update: occupied/visited += counts; the obstacle
   mask is re-derived as ``4*occ > vis`` (exactly LaMa's prob > 0.25 test,
   frequency_occupancy_map.cpp:38-44, in integer form) — order-independent,
   so no sequential per-beam transitions are needed
5. exact windowed EDT recompute of the distance field (sdm/distance.py),
   replacing the raise/lower wavefronts (dynamic_distance_map.cpp:160-331)
6. patch-blocked writeback; brand-new patches are allocated in the shared
   table only where content appeared (counts, or distance < max within the
   safe interior) — mirroring the reference's allocate-on-write ``get()``
   plus wavefront-reach allocation.

Geometric safety argument for the windowed recompute: obstacle changes are
confined to cells within ``max_range + pose_slack`` of the window center;
every cell whose distance can change is within ``R`` (= l2_max in cells) of
a changed cell; the window half-width is ``>= (max_range + pose_slack)/res +
R + L``, so all affected cells lie in the interior region [R, W-R) that we
write back, and every relevant obstacle for those cells is inside the
window. Cells outside keep their stored values, which remain exact.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..ops import scatter_matmul
from . import pool as pool_mod
from . import window as win_mod
from .distance import DistanceConfig, edt2d
from .geometry import MapGeometry
from .raycast import ray_cells

OCC_DTYPE = jnp.uint16   # reference cell: {uint16 occupied, uint16 visited}
                          # (frequency_occupancy_map.h frequency struct)

# Debug: compile the scan update WITHOUT pool writeback/alloc (the map
# never changes after the first scan — wrong results, real timing). Used
# to bound the writeback cost with the production bench, because stage
# profiling is untrustworthy on the tunnel (see CLAUDE.md).
import os
_DEBUG_NO_WRITEBACK = bool(int(os.environ.get("IRIS_DEBUG_NO_WRITEBACK",
                                              "0")))
# Same idea, per stage of scan_window_compute (wrong results, real timing):
# replace the stage with a cheap unfoldable stand-in that keeps the data
# dependency, so a production bench run bounds that stage's in-situ cost.
_DEBUG_NO_EDT = bool(int(os.environ.get("IRIS_DEBUG_NO_EDT", "0")))
_DEBUG_NO_DEPOSIT = bool(int(os.environ.get("IRIS_DEBUG_NO_DEPOSIT", "0")))
_DEBUG_NO_RAYCAST = bool(int(os.environ.get("IRIS_DEBUG_NO_RAYCAST", "0")))


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    """Static per-map parameters shared by Slam2D / PFSlam2D.

    Mirrors the map-related fields of Slam2D::Options (slam2d.h:91-125) /
    PFSlam2D::Options (pf_slam2d.h:132-185).
    """

    geometry: MapGeometry = MapGeometry()
    l2_max: float = 0.5
    truncated_ray: float = 0.0
    truncated_range: float = 0.0
    max_range: float = 10.0     # beams beyond this are dropped by the driver
    pose_slack: float = 2.0     # window margin for match-vs-predict motion
    capacity: int = 4096        # patch pool capacity
    # extra patch rings of pose-wander headroom on the resident window.
    # The minimum window admits only half a patch (16 cells = 0.8 m at
    # 5 cm) of wander before a re-org; prof_pf_events measured re-orgs on
    # 41% of PF updates at ~+45 ms each (flush+gather+lineage settle).
    # Each ring adds a full patch of wander per axis while the exact
    # update/match sub-windows (and so the per-update core cost) are
    # unchanged.
    resident_extra_patches: int = 0
    occ_model: str = "frequency"   # "frequency" | "probabilistic"
    transient: bool = False     # prune patches outside the scan AABB
    transient_expand: float = 2.0  # slam2d.cpp:335-340 uses 2x; lidar odom 1x
    max_removals: int = 160     # per-scan prune budget (rest removed later)

    @property
    def distance(self) -> DistanceConfig:
        return DistanceConfig(self.geometry, self.l2_max)

    @property
    def window_patches(self) -> int:
        """Window side in patches (see module docstring margin argument)."""
        geo = self.geometry
        half_cells = ((self.max_range + self.pose_slack) * geo.scale
                      + self.distance.radius_cells)
        half_patches = int(math.ceil(half_cells / geo.patch_length)) + 1
        return 2 * half_patches

    @property
    def window_cells(self) -> int:
        return self.window_patches * self.geometry.patch_length

    @property
    def ray_steps(self) -> int:
        """Static per-beam cell budget for the raycast."""
        reach = self.max_range
        if self.truncated_range > 0.0:
            reach = min(reach, self.truncated_range)
        if self.truncated_ray > 0.0:
            reach = min(reach, self.truncated_ray)
        # diagonal rays advance max-coordinate by ~range/res
        return int(math.ceil(reach * self.geometry.scale)) + 2

    # --- resident sliding window (see ResidentWindow below) -----------------

    @property
    def resident_margin_cells(self) -> int:
        """Safe-zone margin for a resident window, in cells.

        An update anchored at pose cell ``p`` (window-local ``lp``) is exact
        iff ``lp`` lies in ``[margin, W - margin)`` per axis:

        * obstacle changes are confined to cells within
          ``ceil(max_range*scale) + K`` of the *matched* pose, which is
          within ``B = ceil(pose_slack*scale)`` cells of ``p``;
        * distance changes reach at most ``R`` beyond obstacle changes and
          must land in the EDT interior ``[R, W - R)``;
        * interior EDT cells are always exact because every obstacle within
          the cap radius ``R`` of an interior cell is inside the window.

        Hence margin = ceil(max_range*scale) + 2R + K + B (K = 2 covers
        w2m rounding and the bilinear +1 reads of the matcher).
        """
        geo = self.geometry
        r = self.distance.radius_cells
        b = int(math.ceil(self.pose_slack * geo.scale))
        return int(math.ceil(self.max_range * geo.scale)) + 2 * r + 2 + b

    @property
    def resident_window_patches(self) -> int:
        """Window side (patches) for the resident window: smallest size whose
        safe zone still admits the anchor patch alignment plus half a patch
        of pose wander before a re-org is forced."""
        length = self.geometry.patch_length
        need = 2 * (self.resident_margin_cells + length + length // 2 - 1)
        return (need + length - 1) // length + 2 * self.resident_extra_patches

    @property
    def resident_window_cells(self) -> int:
        return self.resident_window_patches * self.geometry.patch_length

    @property
    def sq_dtype(self):
        return self.distance.sq_dtype

    def dist_to_sq(self, dist):
        return self.distance.dist_to_sq(dist)

    def sq_to_dist(self, d2):
        return self.distance.sq_to_dist(d2)

    @property
    def match_window_cells(self) -> int:
        """Side of the scan-match sub-window inside a resident grid.

        The IRLS matcher anchored at the predicted pose probes hit points
        within ``reach`` of poses that wander at most ``pose_slack`` from
        the prediction (the same contract window_patches uses for the
        legacy pool-backed match window): half-width = reach + slack + 3
        (w2m rounding + the bilinear +1 neighbor).
        """
        geo = self.geometry
        half = (int(math.ceil(self.max_range * geo.scale))
                + int(math.ceil(self.pose_slack * geo.scale)) + 3)
        return min((2 * half + 7) // 8 * 8, self.resident_window_cells)

    @property
    def resident_update_cells(self) -> int:
        """Side of the exact update sub-window inside a resident grid.

        A scan update re-anchored at the particle's own pose cell (exact at
        update time — unlike the shared window org there is no match-travel
        slack and no patch alignment) touches: obstacle changes within
        ``reach = ceil(max_range*scale) + K`` of the pose, distance changes
        at most ``R`` beyond, and recomputing those needs obstacles another
        ``R`` out. Half-width = reach + 2R; deposit/EDT/occupancy costs all
        scale with window area, so running :func:`scan_window_compute` on
        this sub-window instead of the full resident grid is pure savings.
        Always <= resident_margin_cells (margin = half + pose_slack), so a
        pose inside the safe zone keeps the sub-window in-bounds.
        """
        geo = self.geometry
        half = (int(math.ceil(self.max_range * geo.scale)) + 2
                + 2 * self.distance.radius_cells)
        w = (2 * half + 7) // 8 * 8
        return min(w, self.resident_window_cells)


class SlamMapState(NamedTuple):
    """Shared-table fused map (see module docstring).

    For occ_model="frequency": occupied/visited are u16 hit/visit counts
    (frequency_occupancy_map.h). For "probabilistic": ``occupied`` holds f32
    log-odds and ``visited`` the visit count (used for the unknown test),
    matching ProbabilisticOccupancyMap's cell semantics
    (probabilistic_occupancy_map.cpp:38-59).
    """

    table: pool_mod.PatchTable
    occupied: jax.Array   # u16 counts | f32 log-odds  [P+1, L, L]
    visited: jax.Array    # u16[P+1, L, L]
    dist: jax.Array       # f32[P+1, L, L] meters

    @property
    def obstacle(self):
        """bool[P+1, L, L]: derived — a cell is an obstacle iff its stored
        distance is exactly zero (sqdist 0 <=> the cell itself)."""
        return self.dist == 0.0


def slam_map_init(cfg: MappingConfig) -> SlamMapState:
    length = cfg.geometry.patch_length
    p1 = cfg.capacity + 1
    occ_dtype = OCC_DTYPE if cfg.occ_model == "frequency" else jnp.float32
    return SlamMapState(
        table=pool_mod.table_init(cfg.capacity),
        occupied=jnp.zeros((p1, length, length), occ_dtype),
        visited=jnp.zeros((p1, length, length), OCC_DTYPE),
        dist=jnp.full((p1, length, length), cfg.distance.max_dist, jnp.float32),
    )


class ScanGeometry(NamedTuple):
    """Per-beam world-space geometry after truncation (slam2d.cpp:267-300)."""

    start_xy: jax.Array   # f32[B, 2] per-beam ray start (world)
    hit_xy: jax.Array     # f32[B, 2] per-beam endpoint (world)
    mark_hit: jax.Array   # bool[B] — mark an obstacle at the endpoint?
    valid: jax.Array      # bool[B]


def beam_geometry(cfg: MappingConfig, pose, points, mask,
                  origin) -> ScanGeometry:
    """Transform + truncate beams.

    pose: SE(2) [4]; points: f32[B, 3] sensor-frame-applied cloud (the
    reference's ``moving_tf * p``, slam2d.cpp:249-258); origin: f32[3] sensor
    origin in the base frame. Norms are 3D like the reference's.
    """
    hit_xy = lie.se2_apply(pose, points[:, :2])
    hit_z = points[:, 2]
    start_xy = jnp.broadcast_to(lie.se2_apply(pose, origin[:2]), hit_xy.shape)
    start_z = jnp.broadcast_to(origin[2], hit_z.shape)

    ab_xy = hit_xy - start_xy
    ab_z = hit_z - start_z
    ray_len = jnp.sqrt(jnp.sum(ab_xy * ab_xy, -1) + ab_z * ab_z)
    safe_len = jnp.maximum(ray_len, 1e-12)

    mark_hit = mask
    if cfg.truncated_range > 0.0:
        over = ray_len > cfg.truncated_range
        scalef = jnp.where(over, cfg.truncated_range / safe_len, 1.0)
        hit_xy = start_xy + ab_xy * scalef[:, None]
        mark_hit = jnp.logical_and(mark_hit, ~over)
        # (hit_z changes too but only xy is rasterized in 2D)
    if cfg.truncated_ray > 0.0:
        over = jnp.logical_and(mark_hit, ray_len > cfg.truncated_ray)
        scalef = jnp.where(over, cfg.truncated_ray / safe_len, 0.0)
        start_xy = jnp.where(over[:, None],
                             hit_xy - ab_xy * scalef[:, None], start_xy)
    return ScanGeometry(start_xy, hit_xy, mark_hit, mask)


class WindowScan(NamedTuple):
    """Result of applying one scan to a dense window (shared by the
    pool-backed :func:`update_maps` and the resident-window path)."""

    occ_new: jax.Array      # i32 counts | f32 log-odds [W, W]
    vis_new: jax.Array      # i32[W, W]
    dist_merged: jax.Array  # f32[W, W]
    occ_add: jax.Array      # i32[W, W]
    vis_add: jax.Array      # i32[W, W]
    d2: jax.Array           # i32[W, W] fresh capped sqdist
    interior: jax.Array     # bool[W, W] cells whose EDT is authoritative
    n_cells: jax.Array      # i32[] processed-cell count


def scan_window_compute(cfg: MappingConfig, pose, points, mask, origin,
                        org_cell, occ_w, vis_w, dist_old) -> WindowScan:
    """Pure window math for one scan: raycast -> counts -> occupancy
    end-state -> exact windowed EDT -> interior merge.

    ``occ_w``/``vis_w``/``dist_old`` are dense [W, W] grids holding the
    current map content at ``org_cell`` (W is read off the grids, so wider
    resident windows work unchanged). No pool interaction happens here.

    ``dist_old`` may be f32 meters (pool-backed path) or an integer capped
    squared-distance grid (resident path, cfg.sq_dtype) — the returned
    ``dist_merged`` stays in the same domain; all other fields are
    domain-independent.
    """
    sq_domain = jnp.issubdtype(jnp.asarray(dist_old).dtype, jnp.integer)
    geo = cfg.geometry
    dcfg = cfg.distance
    radius = dcfg.radius_cells
    w = dist_old.shape[-1]

    # ---- beams -> cells ----------------------------------------------------
    g = beam_geometry(cfg, pose, points, mask, origin)
    mhit = geo.w2m(g.hit_xy)                    # [B, 2]
    mstart = geo.w2m(g.start_xy)
    if _DEBUG_NO_RAYCAST:
        # Cheap stand-in keeping shape [B, T, 2] and the mstart/mhit data
        # dependency: every "ray cell" is the beam midpoint. Downstream
        # deposit cost is value-independent (dense one-hot contraction),
        # so this bounds only the ray closed-form's cost.
        mid = (mstart + mhit) // 2                              # [B, 2]
        free_cells = jnp.broadcast_to(mid[:, None, :],
                                      (mid.shape[0], cfg.ray_steps, 2))
        free_mask = jnp.broadcast_to((mstart[:, :1] != mhit[:, :1]),
                                     (mid.shape[0], cfg.ray_steps))
    else:
        free_cells, free_mask = ray_cells(mstart, mhit, cfg.ray_steps)
    free_mask = jnp.logical_and(free_mask, g.valid[:, None])

    # window-local coords ([x, y] cell -> grid row y, col x)
    hit_loc = mhit - org_cell
    free_loc = free_cells - org_cell

    def in_win(loc):
        return ((loc[..., 0] >= 0) & (loc[..., 0] < w) &
                (loc[..., 1] >= 0) & (loc[..., 1] < w))

    hit_ok = jnp.logical_and(jnp.logical_and(g.valid, g.mark_hit),
                             in_win(hit_loc))
    free_ok = jnp.logical_and(free_mask, in_win(free_loc))

    # ---- scatter counts into the dense window ------------------------------
    # Free-space counts (~150k elements) ride the MXU one-hot contraction
    # (ops/scatter_matmul.py); the ~B hit endpoints stay on XLA's scatter.
    def scatter_counts(loc, ok, impl=None, band=0):
        ly = jnp.where(ok, loc[..., 1], w).reshape(-1)
        lx = jnp.where(ok, loc[..., 0], w).reshape(-1)
        if _DEBUG_NO_DEPOSIT:
            # Stand-in: one reduction instead of the scatter/contraction.
            # Keeps the (ly, lx) dependency; not constant-foldable.
            tot = (jnp.sum(ly) + jnp.sum(lx)) % 3
            return jnp.broadcast_to(tot, (w, w)).astype(jnp.int32)
        return scatter_matmul.scatter_counts_2d(ly, lx, w, w, impl=impl,
                                                band=band)

    occ_add = scatter_counts(hit_loc, hit_ok, impl="xla")
    # free cells are beam-major and beams are angle-ordered, so any one
    # 4096-element chunk is a narrow sector whose row extent is bounded by
    # the ray reach — the banded kernel's precondition (scatter_matmul)
    vis_add = occ_add + scatter_counts(free_loc, free_ok,
                                       band=cfg.ray_steps + 8)

    # ---- occupancy end-state + obstacle mask -------------------------------
    vis_new = jnp.minimum(vis_w.astype(jnp.int32) + vis_add, 65535)
    if cfg.occ_model == "frequency":
        occ_new = jnp.minimum(occ_w.astype(jnp.int32) + occ_add, 65535)
        # prob > 0.25  <=>  4*occ > vis (frequency_occupancy_map.cpp:40-44)
        obst_new = (4 * occ_new) > vis_new
    else:
        # log-odds update with per-visit clamping
        # (probabilistic_occupancy_map.cpp:51-59, 82-107)
        from .occupancy import probabilistic_saturate
        misses = vis_add - occ_add
        occ_new = probabilistic_saturate(occ_w, occ_add, misses)
        # occ_thresh_ = 0 log-odds (probabilistic_occupancy_map.cpp:60)
        obst_new = occ_new > 0.0

    # ---- exact windowed EDT ------------------------------------------------
    if _DEBUG_NO_EDT:
        # Stand-in: elementwise function of the obstacle mask (wrong values,
        # same shape/dtype, keeps the dependency; subtraction of a 0/1 mask
        # from a constant is not foldable).
        d2 = jnp.int32(dcfg.max_sqdist) - obst_new.astype(jnp.int32)
    else:
        d2 = edt2d(obst_new, dcfg.max_sqdist, radius)

    yy = jnp.arange(w)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = ((yy >= radius) & (yy < w - radius) &
                (xx >= radius) & (xx < w - radius))
    if sq_domain:
        dist_merged = jnp.where(interior, d2.astype(dist_old.dtype),
                                dist_old)
    else:
        dist_new = (jnp.sqrt(d2.astype(jnp.float32))
                    * jnp.float32(geo.resolution))
        dist_merged = jnp.where(interior, dist_new, dist_old)
    n_cells = jnp.sum(free_ok) + jnp.sum(hit_ok)
    return WindowScan(occ_new, vis_new, dist_merged, occ_add, vis_add, d2,
                      interior, n_cells)


def update_maps(state: SlamMapState, cfg: MappingConfig, pose,
                points, mask, origin, org_cell=None, window=None):
    """Apply one scan to the map. Returns (new_state, info dict).

    ``org_cell``: optional precomputed window origin (reused from the scan
    matcher so the matcher's gather and this writeback share one window).
    ``window``: optional (slots, dist_grid) pair already gathered at
    ``org_cell`` (the scan matcher's window) — skips one probe + one gather.
    """
    geo = cfg.geometry
    length = geo.patch_length
    wp = cfg.window_patches
    dcfg = cfg.distance

    if org_cell is None:
        org_cell = win_mod.window_org(geo, geo.w2m(pose[:2]), wp)
    keys = win_mod.window_patch_keys(geo, org_cell, wp)

    # one table probe serves every window gather in this scan
    if window is None:
        slots = pool_mod.table_lookup(state.table, keys)
        dist_old = None
    else:
        slots, dist_old = window
    occ_w, _ = win_mod.gather_window(state.table, state.occupied, keys, 0,
                                     slots=slots)
    vis_w, _ = win_mod.gather_window(state.table, state.visited, keys, 0,
                                     slots=slots)
    if dist_old is None:
        dist_old, _ = win_mod.gather_window(state.table, state.dist, keys,
                                            dcfg.max_dist, slots=slots)

    sc = scan_window_compute(cfg, pose, points, mask, origin, org_cell,
                             occ_w, vis_w, dist_old)
    occ_new, vis_new, dist_merged = sc.occ_new, sc.vis_new, sc.dist_merged
    occ_add, vis_add, d2, interior = sc.occ_add, sc.vis_add, sc.d2, sc.interior

    if _DEBUG_NO_WRITEBACK:
        tot = (jnp.sum(dist_merged) + jnp.sum(occ_new).astype(jnp.float32)
               + jnp.sum(vis_new).astype(jnp.float32))
        dbg_state = state._replace(dist=state.dist.at[-1, 0, 0].add(tot))
        info = {"processed_cells": sc.n_cells,
                "num_patches": state.table.num_patches(),
                "overflow": state.table.overflow}
        return dbg_state, info

    # ---- allocate patches that gained content ------------------------------
    content = ((occ_add + vis_add) > 0) | (interior & (d2 < dcfg.max_sqdist))
    content_patch = jnp.any(
        content.reshape(wp, length, wp, length).transpose(0, 2, 1, 3),
        axis=(2, 3))
    need_new = jnp.logical_and(content_patch, slots < 0)
    cand = jnp.where(need_new, keys, jnp.int32(-1)).reshape(-1)
    # window keys are unique -> the parallel 8-round claim insert applies
    # (the sequential loop is 256 latency-bound steps under vmap); its
    # returned slots merge with the probe result — no second lookup
    table, new_slots = pool_mod.table_insert_unique(state.table, cand)
    slots = jnp.where(need_new, new_slots.reshape(wp, wp), slots)

    # ---- patch-blocked writeback ------------------------------------------
    # only patches whose cells actually changed are scattered (the rest
    # redirect to the trash slot inside scatter_window) — a scan touches
    # roughly half the window's patches
    counts_changed = (occ_add + vis_add) > 0
    dist_changed = dist_merged != dist_old
    occupied = win_mod.scatter_window(state.occupied, slots,
                                      occ_new.astype(state.occupied.dtype),
                                      write_mask=counts_changed)
    visited = win_mod.scatter_window(state.visited, slots,
                                     vis_new.astype(OCC_DTYPE),
                                     write_mask=counts_changed)
    dist = win_mod.scatter_window(state.dist, slots, dist_merged,
                                  write_mask=dist_changed)

    new_state = SlamMapState(table, occupied, visited, dist)

    # ---- transient map: prune patches outside the surface AABB -------------
    # (slam2d.cpp:323-373 / lidar_odometry_2d.cpp:131-182)
    if cfg.transient:
        # identical pure recompute of the beam geometry — CSE'd by XLA
        g = beam_geometry(cfg, pose, points, mask, origin)
        a_center, a_half = transient_keep_aabb(cfg, pose, g)
        new_state = prune_transient_pool(new_state, cfg, a_center, a_half)

    info = {
        "processed_cells": sc.n_cells,
        "num_patches": new_state.table.num_patches(),
        "overflow": new_state.table.overflow,
    }
    return new_state, info


def transient_keep_aabb(cfg: MappingConfig, pose, g: ScanGeometry):
    """The expanded surface AABB transient maps keep (slam2d.cpp:329-343):
    surface bounds symmetrized around the pose (x2 expansion for Slam2D, x1
    for LidarOdometry2D), grown by twice the distance-map range. Returns
    (center [2], half-extent [2]) in world coords."""
    big = jnp.float32(1e30)
    m = g.valid[:, None]
    mn = jnp.min(jnp.where(m, g.hit_xy, big), axis=0)
    mx = jnp.max(jnp.where(m, g.hit_xy, -big), axis=0)
    px, py = pose[0], pose[1]
    xdist = jnp.maximum(px - mn[0], mx[0] - px) * cfg.transient_expand
    ydist = jnp.maximum(py - mn[1], mx[1] - py) * cfg.transient_expand
    a_center = jnp.stack([px, py])
    a_half = jnp.stack([xdist, ydist]) + 2.0 * cfg.distance.max_dist
    return a_center, a_half


def prune_transient_pool(state: SlamMapState, cfg: MappingConfig,
                         a_center, a_half) -> SlamMapState:
    """Delete pool patches whose AABB misses the keep AABB
    (slam2d.cpp:345-371: per-patch box intersection test; survivors stay).
    """
    geo = cfg.geometry
    keys, active = pool_mod.active_keys(state.table)
    anchors = geo.p2anchor(keys)                       # [P, 2] cells
    ws = geo.m2w(anchors)
    we = geo.m2w(anchors + geo.patch_length)
    b_center = 0.5 * (ws + we)
    b_half = 0.5 * (we - ws)
    sep = jnp.abs(a_center[None, :] - b_center)
    intersect = jnp.all(sep <= (a_half[None, :] + b_half), axis=-1)
    remove = jnp.logical_and(active, jnp.logical_not(intersect))

    rm_keys = jnp.nonzero(remove, size=cfg.max_removals,
                          fill_value=remove.shape[0])[0]
    rm_keys = jnp.where(rm_keys < remove.shape[0],
                        keys[jnp.minimum(rm_keys, remove.shape[0] - 1)],
                        jnp.int32(-1))

    # UNCONDITIONAL vectorized removal (r3): the previous lax.cond around a
    # sequential table_remove staged the pool arrays through its branches
    # every scan — on the tunnel that staging dominated the whole transient
    # step. The no-op case (all rm_keys == -1) is now just a masked
    # gather/scatter pass.
    table, freed = pool_mod.table_remove_vec(state.table, rm_keys)
    # distinct out-of-range rows for non-freed entries (unique scatter
    # indices -> parallel lowering; see scatter_window)
    oob = state.dist.shape[0] + jnp.arange(rm_keys.shape[0],
                                           dtype=jnp.int32)
    safe = jnp.where(freed >= 0, freed, oob)
    length = geo.patch_length
    zero_occ = jnp.zeros((rm_keys.shape[0], length, length),
                         state.occupied.dtype)
    zero_vis = jnp.zeros((rm_keys.shape[0], length, length), OCC_DTYPE)
    max_d = jnp.full((rm_keys.shape[0], length, length),
                     cfg.distance.max_dist, jnp.float32)
    return SlamMapState(
        table,
        state.occupied.at[safe].set(zero_occ, mode="drop",
                                    unique_indices=True),
        state.visited.at[safe].set(zero_vis, mode="drop",
                                   unique_indices=True),
        state.dist.at[safe].set(max_d, mode="drop", unique_indices=True),
    )


def _window_patch_boxes(cfg: MappingConfig, org, wp: int):
    """World-space (center [wp,wp,2], half [2]) boxes of a window's patches
    (grid row py = y, col px = x, same layout as window_patch_keys)."""
    geo = cfg.geometry
    length = geo.patch_length
    ax = org[0] + jnp.arange(wp, dtype=jnp.int32) * length   # col -> x
    ay = org[1] + jnp.arange(wp, dtype=jnp.int32) * length   # row -> y
    anchors = jnp.stack(jnp.broadcast_arrays(ax[None, :], ay[:, None]), -1)
    ws = geo.m2w(anchors)
    we = geo.m2w(anchors + length)
    return 0.5 * (ws + we), 0.5 * (we - ws)


def resident_transient_reset(cfg: MappingConfig, org, occ, vis, dist,
                             a_center, a_half):
    """Transient pruning applied to the resident window grids: patches whose
    AABB misses the keep AABB are reset to default content (the resident
    equivalent of the pool path's patch deletion — slam2d.cpp:345-371; the
    per-patch decision is identical, the patch just lives as a dense block
    of the window instead of a pool slot)."""
    geo = cfg.geometry
    length = geo.patch_length
    wp = occ.shape[-1] // length
    b_center, b_half = _window_patch_boxes(cfg, org, wp)
    sep = jnp.abs(a_center[None, None, :] - b_center)
    keep = jnp.all(sep <= (a_half[None, None, :] + b_half), axis=-1)
    keep_cells = jnp.repeat(jnp.repeat(keep, length, 0), length, 1)
    occ = jnp.where(keep_cells, occ, jnp.zeros((), occ.dtype))
    vis = jnp.where(keep_cells, vis, jnp.zeros((), vis.dtype))
    if jnp.issubdtype(dist.dtype, jnp.integer):
        default = jnp.asarray(cfg.distance.max_sqdist, dist.dtype)
    else:
        default = jnp.asarray(cfg.distance.max_dist, dist.dtype)
    dist = jnp.where(keep_cells, dist, default)
    return occ, vis, dist


# ---------------------------------------------------------------------------
# Resident sliding window
# ---------------------------------------------------------------------------
# The per-update gather/alloc/writeback against the patch pool is pure
# overhead while the robot stays inside one window. The resident mode keeps
# the dense (occ, vis, dist) window grids as the PRIMARY map state: scans
# update them elementwise (scan_window_compute), and the pool is only
# touched when the pose leaves the safe zone — flush the window back
# (allocating patches that gained content), re-center, regather. The window
# is authoritative for every cell it covers; pool copies of those patches go
# stale between re-orgs. This replaces the reference's per-cell allocate-on-
# write Map::get (map.cpp:375-454) with an amortized bulk exchange.
#
# Exactness: identical to the per-update windowed path — the safe-zone
# margin (resident_margin_cells) guarantees all obstacle/distance changes
# land in the EDT interior, and interior recomputes only ever need obstacles
# within the cap radius R, which are all in-window. The boundary ring is
# never written between re-orgs and cannot change (changed obstacles stay
# >= 2R away from the window edge).


def resident_safe(cfg: MappingConfig, org, pose_cell):
    """bool[...]: is an update anchored at ``pose_cell`` exact in the
    resident window at ``org``? (callers reduce over particles)."""
    m = cfg.resident_margin_cells
    w = cfg.resident_window_cells
    lp = jnp.asarray(pose_cell, jnp.int32) - org
    return jnp.all((lp >= m) & (lp < w - m), axis=-1)


def resident_org(cfg: MappingConfig, anchor_cell):
    """Patch-aligned resident-window origin centered at ``anchor_cell``."""
    return win_mod.window_org(cfg.geometry, anchor_cell,
                              cfg.resident_window_patches)


def resident_gather(state: SlamMapState, cfg: MappingConfig, org):
    """Pull the resident grids (occ, vis, dist) from the pool at ``org``.

    The distance grid converts to the capped squared-cell-distance domain
    (cfg.sq_dtype) — narrow integers that ride the s8 MXU in the matcher's
    row selection and cut resident HBM traffic 4x. Exact both ways
    (cfg.dist_to_sq docstring).
    """
    wp = cfg.resident_window_patches
    keys = win_mod.window_patch_keys(cfg.geometry, org, wp)
    slots = pool_mod.table_lookup(state.table, keys)
    occ, _ = win_mod.gather_window(state.table, state.occupied, keys, 0,
                                   slots=slots)
    vis, _ = win_mod.gather_window(state.table, state.visited, keys, 0,
                                   slots=slots)
    # convert to the squared domain BEFORE the gather: dist_to_sq is an
    # exact elementwise bijection on the stored values, so it commutes
    # with patch selection — and the narrow-dtype gather moves 1 byte
    # plane instead of f32's 4 on the TPU matmul-gather path
    dist_sq, _ = win_mod.gather_window(
        state.table, cfg.dist_to_sq(state.dist), keys,
        cfg.dist_to_sq(jnp.float32(cfg.distance.max_dist)), slots=slots)
    return occ, vis, dist_sq


def resident_flush(state: SlamMapState, cfg: MappingConfig, org,
                   occ, vis, dist) -> SlamMapState:
    """Write the resident grids back into the pool.

    Patches that gained content are allocated; patches already in the pool
    are rewritten wholesale (the grids are authoritative, so no old-value
    merge is needed); missing no-content patches are dropped.
    """
    wp = cfg.resident_window_patches
    keys = win_mod.window_patch_keys(cfg.geometry, org, wp)
    return _flush_grids(state, cfg, keys, occ, vis, dist)


def _flush_grids(state: SlamMapState, cfg: MappingConfig, keys,
                 occ, vis, dist) -> SlamMapState:
    """Rectangular core of :func:`resident_flush`: write dense grids
    covering the patch grid ``keys`` [a, b] (cell grids [a*L, b*L]) back
    into the pool. Also serves the scroll re-org's band flushes."""
    length = cfg.geometry.patch_length
    a, b = keys.shape
    slots = pool_mod.table_lookup(state.table, keys)

    if jnp.issubdtype(dist.dtype, jnp.integer):   # squared-distance domain
        has_dist = dist != dist.dtype.type(cfg.distance.max_sqdist)
        dist = cfg.sq_to_dist(dist)
    else:
        has_dist = dist != jnp.float32(cfg.distance.max_dist)
    if cfg.occ_model == "frequency":
        has_occ = occ > 0
    else:
        has_occ = occ != 0.0
    content = has_occ | (vis > 0) | has_dist
    content_patch = jnp.any(
        content.reshape(a, length, b, length).transpose(0, 2, 1, 3),
        axis=(2, 3))
    need_new = jnp.logical_and(content_patch, slots < 0)
    cand = jnp.where(need_new, keys, jnp.int32(-1)).reshape(-1)
    table, new_slots = pool_mod.table_insert_unique(state.table, cand)
    slots = jnp.where(need_new, new_slots.reshape(a, b), slots)

    if cfg.transient:
        # pool-path parity: a transient-reset window patch is *deleted*
        # from the pool (slam2d.cpp:356-366), not stored as zeros — free
        # its stale slot; the scatter below routes its block out of range.
        stale = jnp.logical_and(slots >= 0, jnp.logical_not(content_patch))
        rm = jnp.where(stale, keys, jnp.int32(-1)).reshape(-1)
        table, _ = pool_mod.table_remove_vec(table, rm)
        # keep the stale slots in the scatter: their window blocks are all
        # default values (that is what made them stale), so the write
        # resets the freed rows — the invariant every partial writeback
        # (write_mask) relies on.

    occupied = win_mod.scatter_window(state.occupied, slots,
                                      occ.astype(state.occupied.dtype))
    visited = win_mod.scatter_window(state.visited, slots,
                                     vis.astype(OCC_DTYPE))
    new_dist = win_mod.scatter_window(state.dist, slots, dist)
    return SlamMapState(table, occupied, visited, new_dist)


def resident_scroll(state: SlamMapState, cfg: MappingConfig, org,
                    occ, vis, dist, new_org, kp: int):
    """Band ("scroll") re-org: move the resident window from ``org`` to
    ``new_org``, touching only ``kp``-patch edge bands instead of flushing
    and regathering all ``wp**2`` patches.

    Preconditions (caller-enforced): both orgs patch-aligned and
    ``|new_org - org| <= kp * L`` cells per axis (clamp the target org);
    ``cfg.transient`` is False (transient pruning semantics need the full
    flush).

    Steps: (1) flush the trailing K-band on each axis (a superset of the
    exiting patches — flushing a staying patch merely syncs its pool copy
    early; the window remains authoritative), (2) roll the grids so
    surviving cells keep their exact values (no pool round trip at all —
    the full re-org's flush(sq->m)->gather(m->sq) round trip is an exact
    bijection, so results are bit-identical), (3) gather the leading
    K-bands at the new org and merge ONLY the truly-entering cells (the
    rest of the band keeps the rolled — authoritative — content).

    The pool's copies of interior window patches go stale until those
    patches exit; extraction APIs must settle + full-flush first (they
    already do — the resident grids are primary by design).

    Returns (state, occ, vis, dist).
    """
    geo = cfg.geometry
    length = geo.patch_length
    wp = cfg.resident_window_patches
    w = wp * length
    from .geometry import PKEY_BITS

    shift = jnp.asarray(new_org, jnp.int32) - jnp.asarray(org, jnp.int32)
    sx, sy = shift[0], shift[1]                            # cells
    org_p = jnp.asarray(org, jnp.int32) >> geo.log2dim
    ar = jnp.arange(kp, dtype=jnp.int32)
    aw = jnp.arange(wp, dtype=jnp.int32)

    def band(g, y0c, x0c, h, wd):
        return jax.lax.dynamic_slice(g, (y0c, x0c), (h, wd))

    # ---- 1. flush the trailing (exit-side) bands ---------------------------
    ry0 = jnp.where(sy > 0, 0, wp - kp)                    # patch row start
    rx0 = jnp.where(sx > 0, 0, wp - kp)
    row_keys = (((org_p[0] + aw)[None, :] << PKEY_BITS)
                | (org_p[1] + ry0 + ar)[:, None])          # [kp, wp]
    state = _flush_grids(state, cfg, row_keys,
                         band(occ, ry0 * length, 0, kp * length, w),
                         band(vis, ry0 * length, 0, kp * length, w),
                         band(dist, ry0 * length, 0, kp * length, w))
    col_keys = (((org_p[0] + rx0 + ar)[None, :] << PKEY_BITS)
                | (org_p[1] + aw)[:, None])                # [wp, kp]
    state = _flush_grids(state, cfg, col_keys,
                         band(occ, 0, rx0 * length, w, kp * length),
                         band(vis, 0, rx0 * length, w, kp * length),
                         band(dist, 0, rx0 * length, w, kp * length))

    # ---- 2. roll surviving content into its new-local position ------------
    occ = jnp.roll(occ, shift=(-sy, -sx), axis=(0, 1))
    vis = jnp.roll(vis, shift=(-sy, -sx), axis=(0, 1))
    dist = jnp.roll(dist, shift=(-sy, -sx), axis=(0, 1))

    # ---- 3. gather + merge the leading (enter-side) bands ------------------
    new_org_p = jnp.asarray(new_org, jnp.int32) >> geo.log2dim
    max_sq = cfg.dist_to_sq(jnp.float32(cfg.distance.max_dist))
    dist_pool_sq = cfg.dist_to_sq(state.dist)

    def gather_band(keys):
        slots = pool_mod.table_lookup(state.table, keys)
        o, _ = win_mod.gather_window(state.table, state.occupied, keys, 0,
                                     slots=slots)
        v, _ = win_mod.gather_window(state.table, state.visited, keys, 0,
                                     slots=slots)
        d, _ = win_mod.gather_window(state.table, dist_pool_sq, keys,
                                     max_sq, slots=slots)
        return o, v, d

    def merge(g, b, m, y0c, x0c, h, wd):
        cur = band(g, y0c, x0c, h, wd)
        return jax.lax.dynamic_update_slice(
            g, jnp.where(m, b.astype(g.dtype), cur), (y0c, x0c))

    # a new-local row r maps to old-local r + sy; entering iff outside
    # [0, w) there: r >= w - sy (sy > 0) or r < -sy (sy < 0)
    ly0 = jnp.where(sy > 0, wp - kp, 0)
    rows_c = ly0 * length + jnp.arange(kp * length, dtype=jnp.int32)
    m_row = ((rows_c >= w - sy) | (rows_c < -sy))[:, None]
    rk = (((new_org_p[0] + aw)[None, :] << PKEY_BITS)
          | (new_org_p[1] + ly0 + ar)[:, None])
    ob, vb, db = gather_band(rk)
    occ = merge(occ, ob, m_row, ly0 * length, 0, kp * length, w)
    vis = merge(vis, vb, m_row, ly0 * length, 0, kp * length, w)
    dist = merge(dist, db, m_row, ly0 * length, 0, kp * length, w)

    lx0 = jnp.where(sx > 0, wp - kp, 0)
    cols_c = lx0 * length + jnp.arange(kp * length, dtype=jnp.int32)
    m_col = ((cols_c >= w - sx) | (cols_c < -sx))[None, :]
    ck = (((new_org_p[0] + lx0 + ar)[None, :] << PKEY_BITS)
          | (new_org_p[1] + aw)[:, None])
    ob, vb, db = gather_band(ck)
    occ = merge(occ, ob, m_col, 0, lx0 * length, w, kp * length)
    vis = merge(vis, vb, m_col, 0, lx0 * length, w, kp * length)
    dist = merge(dist, db, m_col, 0, lx0 * length, w, kp * length)
    return state, occ, vis, dist


def resident_update(cfg: MappingConfig, org, occ, vis, dist, pose,
                    points, mask, origin):
    """Apply one scan to the resident grids (no pool interaction).

    Returns (occ, vis, dist, processed_cells). Caller must have verified
    :func:`resident_safe` (possibly re-orging first).

    The scan math runs on the exact-update sub-window
    (``cfg.resident_update_cells``, centered at the pose cell) when that is
    smaller than the resident grid: a dynamic slice in, the same
    :func:`scan_window_compute`, a dynamic slice back out. Cells outside
    the sub-window cannot change (every deposit and every EDT-interior
    change lands inside it by the half-width argument), so this is
    bitwise-identical to full-window compute.
    """
    w = dist.shape[-1]
    ws = cfg.resident_update_cells
    if ws >= w:
        sc = scan_window_compute(cfg, pose, points, mask, origin, org,
                                 occ, vis, dist)
        return (sc.occ_new.astype(occ.dtype), sc.vis_new.astype(vis.dtype),
                sc.dist_merged, sc.n_cells)

    geo = cfg.geometry
    lp = geo.w2m(pose[:2]) - org                      # window-local [x, y]
    start = jnp.clip(lp - ws // 2, 0, w - ws)         # [x, y]
    sy, sx = start[1], start[0]
    occ_s = jax.lax.dynamic_slice(occ, (sy, sx), (ws, ws))
    vis_s = jax.lax.dynamic_slice(vis, (sy, sx), (ws, ws))
    dist_s = jax.lax.dynamic_slice(dist, (sy, sx), (ws, ws))
    sc = scan_window_compute(cfg, pose, points, mask, origin, org + start,
                             occ_s, vis_s, dist_s)
    return (jax.lax.dynamic_update_slice(occ, sc.occ_new.astype(occ.dtype),
                                         (sy, sx)),
            jax.lax.dynamic_update_slice(vis, sc.vis_new.astype(vis.dtype),
                                         (sy, sx)),
            jax.lax.dynamic_update_slice(dist, sc.dist_merged, (sy, sx)),
            sc.n_cells)

"""Online scan-to-map SLAM (the reference's Slam2D).

reference: include/lama/slam2d.h, src/slam2d.cpp:143-198 (update loop) and
:247-321 (map update). Per scan: odometry prediction -> motion gate ->
scan-match against the dynamic distance field (GN + Cauchy(0.15),
slam2d.cpp:104-107) -> rasterize the scan into the maps.

TPU architecture: the whole per-scan work (window gather, IRLS scan match,
raycast scatter, windowed exact EDT, writeback) is ONE jitted device program
with static shapes; the host keeps only the f64 pose/odometry bookkeeping and
the data-dependent motion gate (slam2d.cpp:163-170), which is trivially cheap
and inherently sequential.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.pose import Pose2D
from ..match import match_surface_2d as match
from ..nlls.robust import CAUCHY_SCAN
from ..nlls.solver import SolverOptions
from ..sdm import mapping, window as win_mod
from ..sdm.geometry import MapGeometry
from ..utils.cloud import PointCloudXYZ, pad_scan, beam_bucket
from ..utils.summary import Summary

# IRIS_ESC_HARVEST=0: diagnostic — skip the per-re-org escaped-counter
# harvest (the async d2h snapshot + its blocking read at the next re-org).
# The r5 corridor bisect traced the r4 corridor regression to exactly
# this machinery (bdf122f): copy_to_host_async is NOT asynchronous over
# the axon tunnel, so every harvest pays a real ~30 ms round trip — at
# corridor re-org cadence 30-40% of Slam2D throughput (A/B 494 vs 839
# scans/s). Harvests are therefore rate-limited to one per
# IRIS_ESC_INTERVAL seconds (default 5): the guard's reaction latency
# becomes a few seconds, its cost < 1%.
_ESC_HARVEST = os.environ.get("IRIS_ESC_HARVEST", "1") != "0"
_ESC_INTERVAL_S = float(os.environ.get("IRIS_ESC_INTERVAL", "5"))


@dataclasses.dataclass(frozen=True)
class Slam2DOptions:
    """reference: Slam2D::Options (slam2d.h:91-125) + TPU sizing knobs."""

    trans_thresh: float = 0.5
    rot_thresh: float = 0.5
    l2_max: float = 0.5
    truncated_ray: float = 0.0
    truncated_range: float = 0.0
    resolution: float = 0.05
    patch_size: int = 32
    max_iter: int = 100
    strategy: str = "gn"
    transient_map: bool = False
    create_summary: bool = False
    # Opt-in per-phase Summary (reference parity: Slam2D::Summary splits
    # solving vs mapping, src/slam2d.cpp:61-87). The production step is ONE
    # fused program (solve+map), so phase timings require a two-program
    # step with a host sync between — ~2x dispatch overhead; off the hot
    # path by default. Resident path only.
    detailed_summary: bool = False
    # Compression knobs kept for 1:1 Options parity (slam2d.h:115-120).
    # On TPU the live pool stays uncompressed in HBM; these select the codec
    # used for host-side snapshots/checkpoints (utils/codec.py).
    use_compression: bool = False
    cache_size: int = 100
    calgorithm: str = "lz4"
    # --- TPU sizing (static shapes) ---
    max_range: float = 10.0     # beams beyond this are dropped on host
    max_beams: int = 0          # 0 = bucket from first scan
    capacity: int = 4096        # patch-pool capacity
    pose_slack: float = 2.0
    # Resident sliding window (sdm/mapping.py): dense window grids as the
    # primary map state; the patch pool is only exchanged on a (rare)
    # re-org — removes the per-scan gather/alloc/writeback. Exact (same
    # windowed-EDT contract; the match sub-window provably contains every
    # probe the pool window would serve). Transient maps stay resident
    # (pruning = in-window patch resets + pool prunes inside the step);
    # only the host spill tier disables it (per-scan pool interaction).
    resident_window: bool = os.environ.get("IRIS_SLAM_RESIDENT", "1") != "0"
    resident_extra_patches: int = int(os.environ.get(
        "IRIS_SLAM_RESIDENT_EXTRA", "4"))
    # Host-gated re-orgs (r3): the hot step carries NO pool and NO re-org
    # cond — the driver predicts re-orgs from odometry travel (conservative
    # slack, see _reorg_trigger_m) and dispatches flush+regather as its own
    # program. The device cond was measured to dominate the step on the
    # tunnel (prof_nocond). Auto-falls back to the device cond when the
    # window's wander allowance is too tight for a safe host trigger, and
    # for transient/spill modes (per-scan pool interaction). Results are
    # bitwise-equal (re-org timing only moves WHEN the semantic no-op
    # pool<->window exchange happens); the step counts would-have-clipped
    # poses as a correctness guard (escaped_count).
    host_reorg: bool = os.environ.get("IRIS_SLAM_HOST_REORG", "1") != "0"
    # odometry drift allowance (m) between re-orgs for the host trigger
    host_reorg_slack: float = 1.0
    # Scroll ("band") re-orgs (r5, mapping.resident_scroll): at the full
    # re-org's deadline, flush/gather only kp-patch edge bands + roll —
    # bit-identical window content at a fraction of the patch traffic.
    # kp=0 auto-sizes to the wander allowance. Non-transient, non-spill
    # maps only (transient pruning semantics need the full flush).
    scroll_reorg: bool = os.environ.get("IRIS_SLAM_SCROLL", "1") != "0"
    scroll_kp: int = int(os.environ.get("IRIS_SLAM_SCROLL_KP", "0"))

    def mapping_config(self) -> mapping.MappingConfig:
        log2dim = int(np.log2(self.patch_size))
        return mapping.MappingConfig(
            geometry=MapGeometry(self.resolution, log2dim, False),
            l2_max=self.l2_max,
            truncated_ray=self.truncated_ray,
            truncated_range=self.truncated_range,
            max_range=self.max_range,
            pose_slack=self.pose_slack,
            capacity=self.capacity,
            transient=self.transient_map,
            transient_expand=2.0,       # slam2d.cpp:335-340
            resident_extra_patches=self.resident_extra_patches,
        )

    def solver_options(self) -> SolverOptions:
        # Cauchy(0.15) hardwired like the reference (slam2d.cpp:106)
        return SolverOptions(max_iterations=self.max_iter,
                             strategy=self.strategy, robust=CAUCHY_SCAN)


import functools


@functools.lru_cache(maxsize=None)
def _make_step(cfg: mapping.MappingConfig, sopts: SolverOptions):
    """Build the fused per-scan device programs.

    Cached on (cfg, sopts): every Slam2D instance with the same options
    shares ONE set of jit wrappers. Fresh wrappers per instance would
    re-trace and re-load a distinct (byte-identical) executable per
    instance — on the remote-TPU runtime that loading costs seconds and
    dominated the chunked bench reps (prof_chunk: ~5 s per pass at any
    scan count).

    The driver keeps the pose ON DEVICE between scans — remote-TPU tunnels
    pay tens of ms per device->host transfer, so the step takes the previous
    device pose plus the (tiny, host-computed) odometry delta, and appends
    the matched pose into a device-side trajectory ring; the host only pulls
    poses when explicitly asked.
    """
    geo = cfg.geometry
    max_dist = cfg.distance.max_dist
    wp = cfg.window_patches

    def step(state, pose_prev, odelta, points, mask, origin, traj, k):
        # predict from odometry (slam2d.cpp:163-166) on device
        pose0 = lie.se2_compose(pose_prev, odelta)
        org = win_mod.window_org(geo, geo.w2m(pose0[:2]), wp)
        keys = win_mod.window_patch_keys(geo, org, wp)
        grid, slots = win_mod.gather_window(state.table, state.dist, keys,
                                            max_dist)
        # one elementwise pass converts the f32 window to the squared-cell-
        # distance domain; the IRLS row selections then ride the s8/bf16 MXU
        # (distance._interp_window_sq) instead of f32 dots — bit-identical.
        # IRIS_SLAM_F32=1 A/Bs the f32 window (the domain switch halved
        # Loc2D's identical batch=1 576-cell match; see algos/loc2d.py —
        # measured here: s8 496/496/498 vs f32 430/482/475 scans/s)
        win = (grid if os.environ.get("IRIS_SLAM_F32") == "1"
               else cfg.dist_to_sq(grid))
        res = match.solve_window(win, org, geo, max_dist,
                                 points[:, :2], mask, pose0, sopts)
        new_state, info = mapping.update_maps(state, cfg, res.state, points,
                                              mask, origin, org,
                                              window=(slots, grid))
        info["iterations"] = res.iterations
        info["chi2"] = res.chi2
        traj = traj.at[jnp.minimum(k, traj.shape[0] - 1)].set(res.state)
        return new_state, res.state, traj, info

    def first_step(state, pose0, points, mask, origin):
        return mapping.update_maps(state, cfg, pose0, points, mask, origin)

    return (jax.jit(step, donate_argnums=(0, 6)),
            jax.jit(first_step, donate_argnums=(0,)))


@functools.lru_cache(maxsize=None)
def _make_step_resident(cfg: mapping.MappingConfig, sopts: SolverOptions):
    """Fused per-scan program on a resident sliding window (lru-cached on
    (cfg, sopts) — see _make_step).

    Same math as :func:`_make_step`'s pool path, but the dense window grids
    are the primary state: the step re-orgs (pool flush + re-center +
    gather) only when the predicted pose leaves the safe zone, matches on a
    pose-centered sub-window of the resident s8 squared-distance grid, and
    applies the scan with :func:`mapping.resident_update`. Bit-parity with
    the pool path: the sub-window provably contains every matcher probe
    (match_window_cells' half-width >= reach + pose_slack + bilinear slop,
    and the safe-zone margin keeps the slice unclipped), and resident
    values equal pool values between exchanges (test_pf_resident /
    test_slam2d_resident).
    """
    geo = cfg.geometry
    max_dist = cfg.distance.max_dist
    w_res = cfg.resident_window_cells
    ws_m = cfg.match_window_cells

    def solve_part(state, org, occ, vis, dist, pose_prev, odelta, points,
                   mask):
        """Predict + (maybe) re-org + scan match."""
        pose0 = lie.se2_compose(pose_prev, odelta)
        p0cell = geo.w2m(pose0[:2])
        safe = mapping.resident_safe(cfg, org, p0cell)

        def do_reorg(op):
            state, org, occ, vis, dist = op
            state = mapping.resident_flush(state, cfg, org, occ, vis, dist)
            new_org = mapping.resident_org(cfg, p0cell)
            occ, vis, dist = mapping.resident_gather(state, cfg, new_org)
            return state, new_org, occ, vis, dist

        if os.environ.get("IRIS_DEBUG_NO_REORG_COND") == "1":
            # Debug bound (wrong results when a re-org would fire, real
            # timing): how much does the cond + pool/grid carry cost the
            # per-scan step? See CLAUDE.md on why only whole-run A/B is
            # trustworthy here.
            pass
        else:
            state, org, occ, vis, dist = jax.lax.cond(
                safe, lambda op: op, do_reorg, (state, org, occ, vis, dist))

        dist_m, m_org = dist, org
        if ws_m < w_res:
            lp = p0cell - org
            start = jnp.clip(lp - ws_m // 2, 0, w_res - ws_m)
            dist_m = jax.lax.dynamic_slice(dist, (start[1], start[0]),
                                           (ws_m, ws_m))
            m_org = org + start
        res = match.solve_window(dist_m, m_org, geo, max_dist,
                                 points[:, :2], mask, pose0, sopts)
        return state, org, occ, vis, dist, res, safe

    def map_part(state, org, occ, vis, dist, pose, points, mask, origin):
        """Rasterize the scan + transient pruning."""
        occ, vis, dist, n_cells = mapping.resident_update(
            cfg, org, occ, vis, dist, pose, points, mask, origin)
        if cfg.transient:
            # transient pruning, resident form: reset non-kept window
            # patches in place and prune out-of-window pool patches —
            # per-scan, exactly like the pool path (slam2d.cpp:323-373).
            g = mapping.beam_geometry(cfg, pose, points, mask, origin)
            ac, ah = mapping.transient_keep_aabb(cfg, pose, g)
            occ, vis, dist = mapping.resident_transient_reset(
                cfg, org, occ, vis, dist, ac, ah)
            state = mapping.prune_transient_pool(state, cfg, ac, ah)
        return state, occ, vis, dist, n_cells

    def raw_step(state, org, occ, vis, dist, pose_prev, odelta, points,
                 mask, origin):
        state, org, occ, vis, dist, res, safe = solve_part(
            state, org, occ, vis, dist, pose_prev, odelta, points, mask)
        state, occ, vis, dist, n_cells = map_part(
            state, org, occ, vis, dist, res.state, points, mask, origin)
        info = {"iterations": res.iterations, "chi2": res.chi2,
                "processed_cells": n_cells,
                "num_patches": state.table.num_patches(),
                "overflow": state.table.overflow,
                "reorged": ~safe,
                "escaped": ~mapping.resident_safe(cfg, org,
                                                  geo.w2m(res.state[:2]))}
        return state, org, occ, vis, dist, res.state, info

    def step(state, org, occ, vis, dist, pose_prev, odelta, points, mask,
             origin, traj, k):
        state, org, occ, vis, dist, new_pose, info = raw_step(
            state, org, occ, vis, dist, pose_prev, odelta, points, mask,
            origin)
        traj = traj.at[jnp.minimum(k, traj.shape[0] - 1)].set(new_pose)
        return state, org, occ, vis, dist, new_pose, traj, info

    def chunk_step(state, org, occ, vis, dist, pose, traj, k0, odeltas,
                   points, masks, origins, dos):
        """C gated scan updates in ONE device program (`lax.scan` over the
        staged chunk). On a remote-TPU tunnel every dispatch costs ~1-3 ms
        — comparable to the whole per-scan device time — so offline-log
        replay is dispatch-bound unless updates are batched. ``dos`` masks
        padded tail entries (host gates on odometry exactly like the
        per-scan driver, so accepted-scan semantics are identical)."""
        def body(carry, inp):
            odelta, pts, msk, orgn, do = inp

            def run(args):
                state, org, occ, vis, dist, pose = args
                state, org, occ, vis, dist, pose, _ = raw_step(
                    state, org, occ, vis, dist, pose, odelta, pts, msk,
                    orgn)
                return (state, org, occ, vis, dist, pose)

            if os.environ.get("IRIS_CHUNK_NO_COND") == "1":
                carry = run(carry)      # probe: measure the cond's cost
            else:
                carry = jax.lax.cond(do, run, lambda a: a, carry)
            return carry, carry[5]

        (state, org, occ, vis, dist, pose), poses = jax.lax.scan(
            body, (state, org, occ, vis, dist, pose),
            (odeltas, points, masks, origins, dos))
        k0 = jnp.minimum(k0, traj.shape[0] - poses.shape[0])
        traj = jax.lax.dynamic_update_slice(traj, poses, (k0, jnp.int32(0)))
        info = {"num_patches": state.table.num_patches(),
                "overflow": state.table.overflow}
        return state, org, occ, vis, dist, pose, traj, info

    def first_step(org, occ, vis, dist, pose0, points, mask, origin):
        occ, vis, dist, _ = mapping.resident_update(
            cfg, org, occ, vis, dist, pose0, points, mask, origin)
        if cfg.transient:
            g = mapping.beam_geometry(cfg, pose0, points, mask, origin)
            ac, ah = mapping.transient_keep_aabb(cfg, pose0, g)
            occ, vis, dist = mapping.resident_transient_reset(
                cfg, org, occ, vis, dist, ac, ah)
        return occ, vis, dist

    def flush(state, org, occ, vis, dist):
        return mapping.resident_flush(state, cfg, org, occ, vis, dist)

    @functools.lru_cache(maxsize=None)
    def make_unroll(c: int):
        """C accepted scans per dispatch, STRAIGHT-LINE (no lax.scan, no
        gating cond): each scan is textually the per-scan raw_step, so XLA
        compiles the same buffer-aliasing structure as the per-scan
        program — the scan+cond chunk body pays conservative buffer
        copies that measured ~1.3-1.8x the per-scan device time (bench r2
        A/B: chunked median 405 vs sequential 520 scans/s) — while the
        dispatch count still drops by C. Every entry is a real accepted
        scan (the driver routes sub-C remainders through the per-scan
        program instead of padding)."""
        def unroll_step(state, org, occ, vis, dist, pose, traj, k0,
                        odeltas, points, masks, origins):
            poses = []
            for i in range(c):
                state, org, occ, vis, dist, pose, _ = raw_step(
                    state, org, occ, vis, dist, pose, odeltas[i],
                    points[i], masks[i], origins[i])
                poses.append(pose)
            stack = jnp.stack(poses)
            k0 = jnp.minimum(k0, traj.shape[0] - c)
            traj = jax.lax.dynamic_update_slice(traj, stack,
                                                (k0, jnp.int32(0)))
            info = {"num_patches": state.table.num_patches(),
                    "overflow": state.table.overflow}
            return state, org, occ, vis, dist, pose, traj, info

        return jax.jit(unroll_step, donate_argnums=(0, 2, 3, 4, 6))

    # ---- host-gated re-org mode (r3): pool-free hot step -------------------
    # The device-side re-org cond must stage the pool + grids through its
    # branches every scan; measured on the tunnel this dominates the step
    # (prof_nocond: compiling the cond out took the 16-unroll replay from
    # ~280-590 to ~2700-3900 scans/s — partially a diverged-run artifact,
    # but the honest host-gated version below recovers most of it). In
    # this mode the hot step NEVER sees the pool: the driver predicts
    # re-orgs from odometry travel (a conservative trigger with meters of
    # slack) and dispatches the flush+regather as its own program between
    # scans; the step counts would-have-clipped poses (esc) as the
    # correctness guard.
    def nopool_step(state, org, occ, vis, dist, pose_prev, odelta, points,
                    mask, origin, traj, esc, k):
        pose0 = lie.se2_compose(pose_prev, odelta)
        p0cell = geo.w2m(pose0[:2])
        esc = esc + (~mapping.resident_safe(cfg, org, p0cell)).astype(
            jnp.int32)
        dist_m, m_org = dist, org
        if ws_m < w_res:
            lp = p0cell - org
            start = jnp.clip(lp - ws_m // 2, 0, w_res - ws_m)
            dist_m = jax.lax.dynamic_slice(dist, (start[1], start[0]),
                                           (ws_m, ws_m))
            m_org = org + start
        res = match.solve_window(dist_m, m_org, geo, max_dist,
                                 points[:, :2], mask, pose0, sopts)
        occ, vis, dist, n_cells = mapping.resident_update(
            cfg, org, occ, vis, dist, res.state, points, mask, origin)
        if cfg.transient:
            # per-scan transient pruning, cond-free: window resets are
            # elementwise; the pool prune is the unconditional vectorized
            # removal (prune_transient_pool) — without a lax.cond the pool
            # arrays alias straight through under donation
            g = mapping.beam_geometry(cfg, res.state, points, mask, origin)
            ac, ah = mapping.transient_keep_aabb(cfg, res.state, g)
            occ, vis, dist = mapping.resident_transient_reset(
                cfg, org, occ, vis, dist, ac, ah)
            state = mapping.prune_transient_pool(state, cfg, ac, ah)
        traj = traj.at[jnp.minimum(k, traj.shape[0] - 1)].set(res.state)
        info = {"iterations": res.iterations, "chi2": res.chi2,
                "processed_cells": n_cells}
        return state, occ, vis, dist, res.state, traj, esc, info

    @functools.lru_cache(maxsize=None)
    def make_unroll_nopool(c: int):
        def unroll_step(state, org, occ, vis, dist, pose, traj, esc, k0,
                        odeltas, points, masks, origins):
            info = {}
            for i in range(c):
                state, occ, vis, dist, pose, traj, esc, info = nopool_step(
                    state, org, occ, vis, dist, pose, odeltas[i],
                    points[i], masks[i], origins[i], traj, esc, k0 + i)
            return state, occ, vis, dist, pose, traj, esc, info

        return jax.jit(unroll_step, donate_argnums=(0, 2, 3, 4, 6, 7))

    def reorg(state, org, occ, vis, dist, pose_dev):
        """Flush + re-center + regather as a standalone program (host-
        triggered; bit-equal to the in-step cond body)."""
        state = mapping.resident_flush(state, cfg, org, occ, vis, dist)
        new_org = mapping.resident_org(cfg, geo.w2m(pose_dev[:2]))
        occ, vis, dist = mapping.resident_gather(state, cfg, new_org)
        return state, new_org, occ, vis, dist

    @functools.lru_cache(maxsize=None)
    def make_scroll(kp: int):
        """Band re-org (mapping.resident_scroll): bit-identical window
        content, kp-patch edge bands instead of the wp^2 flush+regather.
        The target org is clamped to +-kp patches (driver guarantees the
        shift fits via the dispatch guard)."""
        length = cfg.geometry.patch_length

        def scroll(state, org, occ, vis, dist, pose_dev):
            target = mapping.resident_org(cfg, geo.w2m(pose_dev[:2]))
            shift = jnp.clip(target - org, -kp * length, kp * length)
            new_org = org + shift
            state, occ, vis, dist = mapping.resident_scroll(
                state, cfg, org, occ, vis, dist, new_org, kp)
            return state, new_org, occ, vis, dist

        return jax.jit(scroll, donate_argnums=(0, 2, 3, 4))

    def split_map(state, org, occ, vis, dist, pose, points, mask, origin,
                  traj, k):
        """Map half of the opt-in two-program detailed-summary mode."""
        state, occ, vis, dist, n_cells = map_part(
            state, org, occ, vis, dist, pose, points, mask, origin)
        traj = traj.at[jnp.minimum(k, traj.shape[0] - 1)].set(pose)
        info = {"processed_cells": n_cells,
                "num_patches": state.table.num_patches(),
                "overflow": state.table.overflow}
        return state, occ, vis, dist, traj, info

    return (jax.jit(step, donate_argnums=(0, 2, 3, 4, 10)),
            jax.jit(first_step, donate_argnums=(1, 2, 3)),
            jax.jit(flush, donate_argnums=(0,)),
            jax.jit(chunk_step, donate_argnums=(0, 2, 3, 4, 6)),
            make_unroll,
            jax.jit(solve_part),
            jax.jit(split_map),
            jax.jit(nopool_step, donate_argnums=(0, 2, 3, 4, 10, 11)),
            make_unroll_nopool,
            jax.jit(reorg, donate_argnums=(0, 2, 3, 4)),
            make_scroll)


class Slam2D:
    """Host driver; mirrors the reference public API (slam2d.h:127-176)."""

    TRAJ_CAP = 16384   # device-side trajectory ring capacity

    def __init__(self, options: Slam2DOptions = Slam2DOptions()):
        self.options = options
        self.cfg = options.mapping_config()
        self.sopts = options.solver_options()
        self._map = mapping.slam_map_init(self.cfg)
        self.odom_ = Pose2D()
        self.has_first_scan = False
        self.summary: Optional[Summary] = (
            Summary() if options.create_summary else None)
        self._max_beams = options.max_beams
        self._step = None
        self._last_info_dev = {}
        self._first = None
        # resident sliding window (disabled for the host spill tier, which
        # needs per-scan pool interaction; transient maps are resident-
        # compatible since r3 — pruning runs as window resets + pool
        # prunes inside the fused step)
        self._resident = (options.resident_window
                          and not options.use_compression)
        self._res_org = None
        self._res_occ = None
        self._res_vis = None
        self._res_dist = None
        self._res_dirty = False
        self._scroll_kp = 0
        self._flush = None
        # pose lives on device; host copy is refreshed lazily
        self._pose_dev = jnp.asarray(Pose2D().se2_array())
        self._pose_host: Optional[Pose2D] = Pose2D()
        self._traj = jnp.zeros((self.TRAJ_CAP, 4), jnp.float32)
        self._n_updates = 0
        # host-gated re-org bookkeeping (set up in _build_programs)
        self._host_reorg = False
        self._odom_reorg: Optional[Pose2D] = None
        self._esc_dev = jnp.int32(0)
        self._n_reorgs = 0   # host-gated re-orgs dispatched
        # escaped-guard bookkeeping (ADVICE r3): the counter is harvested
        # once per re-org via an async d2h copy started at the PREVIOUS
        # re-org (zero tunnel stalls); on escape the trigger tightens,
        # and if no safe trigger remains we fall back to the device-cond
        # step (always correct).
        self._esc_stash = None
        self._esc_seen = 0
        self._esc_last_t = -1e9   # last snapshot time (monotonic s)
        self._esc_clean = 0       # consecutive escape-free harvests
        self._extra_slack = 0.0
        # host spill tier (use_compression: LRU compress-on-evict parity)
        self._spill = None
        if options.use_compression and not options.transient_map:
            from ..sdm.spill import HostSpillStore
            self._spill = HostSpillStore(self.cfg, self.cfg.geometry,
                                         codec=options.calgorithm)
            self._sync_pose: Optional[Pose2D] = None   # map pose @ last sync
            self._sync_odom: Optional[Pose2D] = None   # odometry @ last sync
            self._potential: set = set()    # window keys ever approached
            self._check_at = int(0.85 * options.capacity)

    # -- reference API ------------------------------------------------------
    @property
    def map(self) -> mapping.SlamMapState:
        """The patch-pool map. On the resident path the pool is refreshed
        lazily: reading this property flushes the resident grids into the
        pool when they are ahead of it (rare outside map export)."""
        if self._resident and self._res_dirty:
            self._map = self._flush(self._map, self._res_org, self._res_occ,
                                    self._res_vis, self._res_dist)
            self._res_dirty = False
        return self._map

    @map.setter
    def map(self, value: mapping.SlamMapState) -> None:
        self._map = value

    def set_prior(self, prior: Pose2D) -> None:
        self._pose_dev = jnp.asarray(prior.se2_array())
        self._pose_host = prior

    def pose(self) -> Pose2D:
        """Current pose (syncs device->host when stale)."""
        if self._pose_host is None:
            self._pose_host = Pose2D.from_se2_array(
                np.asarray(self._pose_dev))
        return self._pose_host

    def trajectory(self) -> np.ndarray:
        """All matched poses so far, [n, 3] xyr — one device pull."""
        n = min(self._n_updates, self.TRAJ_CAP)
        t = np.asarray(self._traj[:n])
        return np.stack([t[:, 0], t[:, 1],
                         np.arctan2(t[:, 3], t[:, 2])], -1)

    @property
    def _last_info(self):
        d = {k: int(np.asarray(v)) for k, v in self._last_info_dev.items()
             if k != "chi2"}
        if "overflow" not in d:
            # pool-free hot step (host-gated re-orgs): pool telemetry comes
            # from the pool state, valid as of the last flush/re-org
            d["overflow"] = int(np.asarray(self._map.table.overflow))
            d["num_patches"] = int(np.asarray(
                self._map.table.num_patches()))
        return d

    def enough_motion(self, odometry: Pose2D) -> bool:
        """slam2d.cpp:130-141."""
        if not self.has_first_scan:
            return True
        odelta = self.odom_ - odometry
        return not (np.linalg.norm(odelta.xy()) <= self.options.trans_thresh
                    and abs(odelta.rotation()) <= self.options.rot_thresh)

    def update(self, cloud: PointCloudXYZ, odometry: Pose2D,
               timestamp: float = 0.0) -> bool:
        """slam2d.cpp:143-198."""
        t0 = time.perf_counter()
        if self._max_beams == 0:
            self._max_beams = beam_bucket(len(cloud.points))
        if self._step is None:
            self._build_programs()

        points, mask, origin = pad_scan(cloud, self._max_beams)
        points, mask, origin = (jnp.asarray(points), jnp.asarray(mask),
                                jnp.asarray(origin))

        if not self.has_first_scan:
            self.odom_ = odometry
            self._do_first(points, mask, origin)
            if self.summary:
                jax.block_until_ready(self._pose_dev)
                dt = time.perf_counter() - t0
                self.summary.probe(timestamp, dt, mapping=dt,
                                   memory=self.memory_usage())
            return True

        # 1. predict from odometry (slam2d.cpp:163-173); gate is pure
        #    host-side odometry math — no device sync needed
        odelta = self.odom_ - odometry
        if (np.linalg.norm(odelta.xy()) <= self.options.trans_thresh and
                abs(odelta.rotation()) <= self.options.rot_thresh):
            return False
        if self._spill is not None:
            self._spill_hooks(odometry)        # refill window / spill far
        self._maybe_reorg(odometry)
        self.odom_ = odometry
        if (self.summary is not None and self.options.detailed_summary
                and self._resident):
            self._do_step_detailed(odelta, points, mask, origin,
                                   timestamp, t0)
            return True
        self._do_step(odelta, points, mask, origin)

        if self.summary:
            jax.block_until_ready(self._pose_dev)
            dt = time.perf_counter() - t0
            self.summary.probe(timestamp, dt, solving=dt, mapping=dt,
                               memory=self.memory_usage())
        return True

    def _do_step_detailed(self, odelta: Pose2D, points, mask, origin,
                          timestamp: float, t0: float) -> None:
        """Two-program step with a host sync between solve and map — real
        per-phase Summary timings (src/slam2d.cpp:61-87 parity), paid for
        with one extra dispatch per scan. Enabled by
        ``Slam2DOptions.detailed_summary``."""
        od = jnp.asarray(odelta.se2_array())
        k = jnp.int32(self._n_updates)
        ts = time.perf_counter()
        (self._map, self._res_org, occ, vis, dist, res,
         _safe) = self._split_solve(
            self._map, self._res_org, self._res_occ, self._res_vis,
            self._res_dist, self._pose_dev, od, points, mask)
        jax.block_until_ready(res.state)
        t_solve = time.perf_counter() - ts
        tm = time.perf_counter()
        (self._map, self._res_occ, self._res_vis, self._res_dist,
         self._traj, info) = self._split_map(
            self._map, self._res_org, occ, vis, dist, res.state, points,
            mask, origin, self._traj, k)
        self._pose_dev = res.state
        self._pose_host = None
        self._res_dirty = True
        info = dict(info)
        info["iterations"] = res.iterations
        self._last_info_dev = info
        self._n_updates += 1
        jax.block_until_ready(self._res_dist)
        t_map = time.perf_counter() - tm
        self.summary.probe(timestamp, time.perf_counter() - t0,
                           solving=t_solve, mapping=t_map,
                           memory=self.memory_usage())

    def _do_first(self, points, mask, origin) -> None:
        if self._resident:
            cfg, geo = self.cfg, self.cfg.geometry
            w = cfg.resident_window_cells
            occ_dtype = (mapping.OCC_DTYPE if cfg.occ_model == "frequency"
                         else jnp.float32)
            self._res_org = mapping.resident_org(
                cfg, geo.w2m(self._pose_dev[:2]))
            self._res_occ, self._res_vis, self._res_dist = self._first(
                self._res_org,
                jnp.zeros((w, w), occ_dtype),
                jnp.zeros((w, w), mapping.OCC_DTYPE),
                jnp.full((w, w), cfg.distance.max_sqdist, cfg.sq_dtype),
                self._pose_dev, points, mask, origin)
            self._res_dirty = True
        else:
            self._map, _ = self._first(self._map, self._pose_dev, points,
                                       mask, origin)
        self._traj = self._traj.at[0].set(self._pose_dev)
        self._n_updates = 1
        self.has_first_scan = True
        self._odom_reorg = self.odom_   # host-gated re-org anchor

    def _do_step(self, odelta: Pose2D, points, mask, origin) -> None:
        self._do_step_od(jnp.asarray(odelta.se2_array()), points, mask,
                         origin)

    def escaped_count(self) -> int:
        """Updates whose pose left the resident safe zone before a re-org
        (host-gated mode correctness guard) — 0 in a healthy run."""
        return int(np.asarray(self._esc_dev))

    def _maybe_reorg(self, odometry: Pose2D) -> None:
        """Host-gated re-org trigger: flush+re-center+regather as its own
        dispatch once odometry has travelled the window's wander allowance
        minus slack since the last re-org."""
        if not self._host_reorg or self._odom_reorg is None:
            return
        d = float(np.linalg.norm((self._odom_reorg - odometry).xy()))
        if d < self._reorg_trigger_m:
            return
        self._harvest_escapes()
        patch_m = (self.cfg.geometry.patch_length
                   * self.cfg.geometry.resolution)
        if (self._scroll_kp
                and d + self.options.host_reorg_slack
                <= self._scroll_kp * patch_m):
            prog = self._make_scroll(self._scroll_kp)
        else:
            prog = self._reorg
        (self._map, self._res_org, self._res_occ, self._res_vis,
         self._res_dist) = prog(
            self._map, self._res_org, self._res_occ, self._res_vis,
            self._res_dist, self._pose_dev)
        self._odom_reorg = odometry
        self._n_reorgs += 1
        if prog is self._reorg:
            self._res_dirty = False   # pool and window are in sync now
        # (a scroll leaves interior pool copies stale: _res_dirty stays)
        if (self._host_reorg and _ESC_HARVEST
                and time.monotonic() - self._esc_last_t >= _ESC_INTERVAL_S):
            # rate-limited snapshot, harvested at a later re-org (the
            # read pays a real ~30 ms tunnel round trip — see
            # _ESC_HARVEST note). jnp.add makes a fresh buffer: the live
            # one is donated by the next step dispatch.
            self._esc_last_t = time.monotonic()
            snap = jnp.add(self._esc_dev, 0)
            snap.copy_to_host_async()
            self._esc_stash = snap

    def _harvest_escapes(self) -> None:
        """Escaped-guard reaction (ADVICE r3): if any update since the last
        check ran with its pose outside the resident safe zone, tighten the
        re-org trigger (double the slack); once no safe trigger distance
        remains, fall back to the always-correct device-cond step."""
        if self._esc_stash is None:
            return
        esc = int(np.asarray(self._esc_stash))   # cumulative counter
        self._esc_stash = None
        if esc <= self._esc_seen:
            # recovery: 4 consecutive clean harvests release one
            # tightening step (a transient excursion should not
            # permanently multiply re-orgs)
            self._esc_clean += 1
            if self._esc_clean >= 4 and self._extra_slack > 0:
                self._esc_clean = 0
                self._extra_slack = max(
                    0.0, self._extra_slack
                    - max(self.options.host_reorg_slack, 0.25))
            return
        self._esc_seen = esc
        self._esc_clean = 0
        self._extra_slack += max(self.options.host_reorg_slack, 0.25)
        import warnings
        if self._reorg_trigger_m >= 0.5:
            warnings.warn(
                f"Slam2D host-gated re-org: {esc} update(s) escaped the "
                f"resident safe zone (clipped writes); tightening re-org "
                f"trigger to {self._reorg_trigger_m:.2f} m")
        else:
            warnings.warn(
                f"Slam2D host-gated re-org: {esc} escaped update(s) and no "
                "safe trigger distance left; falling back to the "
                "device-cond step")
            self._host_reorg = False

    def _check_traj_cap(self) -> None:
        """Warn before the trajectory ring saturates (ADVICE r3): poses
        past TRAJ_CAP collapse into the last row, which silently corrupts
        consumers slicing the ring (GraphSlam2D's key-pose gate)."""
        if (self._n_updates >= self.TRAJ_CAP - 256
                and not getattr(self, "_traj_warned", False)):
            self._traj_warned = True
            import warnings
            warnings.warn(
                f"Slam2D trajectory ring is {self._n_updates} of "
                f"{self.TRAJ_CAP} entries; poses past the cap collapse "
                "into the last row (raise Slam2D.TRAJ_CAP for longer runs)")

    def _do_step_od(self, od, points, mask, origin) -> None:
        """2-3. optimize + map update (single fused device program); the
        pose stays on device, host copy goes stale."""
        self._check_traj_cap()
        k = jnp.int32(self._n_updates)
        if self._resident and self._host_reorg:
            (self._map, self._res_occ, self._res_vis, self._res_dist,
             self._pose_dev, self._traj, self._esc_dev,
             info) = self._step_np(
                self._map, self._res_org, self._res_occ, self._res_vis,
                self._res_dist, self._pose_dev, od, points, mask, origin,
                self._traj, self._esc_dev, k)
            self._res_dirty = True
            self._pose_host = None
            self._last_info_dev = info
            self._n_updates += 1
            return
        if self._resident:
            (self._map, self._res_org, self._res_occ, self._res_vis,
             self._res_dist, self._pose_dev, self._traj, info) = self._step(
                self._map, self._res_org, self._res_occ, self._res_vis,
                self._res_dist, self._pose_dev, od, points, mask, origin,
                self._traj, k)
            self._res_dirty = True
        else:
            self._map, self._pose_dev, self._traj, info = self._step(
                self._map, self._pose_dev, od, points, mask, origin,
                self._traj, k)
        self._pose_host = None
        self._last_info_dev = info
        self._n_updates += 1

    def update_prepadded(self, points, mask, origin, odometry: Pose2D,
                         timestamp: float = 0.0) -> bool:
        """Fast path for pre-staged scans (offline logs): points/mask/origin
        already padded device arrays — skips per-scan host packing."""
        if self._step is None:
            self._max_beams = points.shape[0]
            self._build_programs()
        if not self.has_first_scan:
            self.odom_ = odometry
            self._do_first(points, mask, origin)
            return True
        odelta = self.odom_ - odometry
        if (np.linalg.norm(odelta.xy()) <= self.options.trans_thresh and
                abs(odelta.rotation()) <= self.options.rot_thresh):
            return False
        if self._spill is not None:
            self._spill_hooks(odometry)
        self._maybe_reorg(odometry)
        self.odom_ = odometry
        self._do_step(odelta, points, mask, origin)
        return True

    @property
    def _reorg_trigger_m(self) -> float:
        """Odometry travel between host-gated re-orgs: wander allowance
        minus patch-alignment slop minus the drift slack, in meters."""
        cfg = self.cfg
        cells = (cfg.resident_window_cells // 2 - cfg.resident_margin_cells
                 - cfg.geometry.patch_length)
        return (cells * cfg.geometry.resolution
                - self.options.host_reorg_slack - self._extra_slack)

    def _build_programs(self) -> None:
        if self._resident:
            (self._step, self._first, self._flush, self._chunk,
             self._make_unroll, self._split_solve, self._split_map,
             self._step_np, self._make_unroll_np,
             self._reorg, self._make_scroll) = _make_step_resident(
                 self.cfg, self.sopts)
            # host-gated re-orgs need enough wander allowance for the
            # odometry trigger to be conservative (transient maps are
            # eligible since the prune went cond-free; the spill tier
            # keeps the device cond — per-scan pool interaction)
            self._host_reorg = (self.options.host_reorg
                                and self._spill is None
                                and self._reorg_trigger_m >= 0.5)
            # scroll (band) re-orgs: non-transient resident maps whose
            # allowance shift fits inside a < wp/2 patch band
            self._scroll_kp = 0
            if (self._host_reorg and self.options.scroll_reorg
                    and not self.options.transient_map):
                patch_m = (self.cfg.geometry.patch_length
                           * self.cfg.geometry.resolution)
                kp = self.options.scroll_kp or (int(np.ceil(
                    (self._reorg_trigger_m + self.options.host_reorg_slack)
                    / patch_m)) + 1)
                if kp < self.cfg.resident_window_patches // 2:
                    self._scroll_kp = kp
        else:
            self._step, self._first = _make_step(self.cfg, self.sopts)
            self._chunk = None
            self._make_unroll = None
            self._split_solve = self._split_map = None
            self._host_reorg = False
            self._scroll_kp = 0

    def update_many_prepadded(self, staged, odoms,
                              chunk: int = 32) -> list:
        """Replay a pre-staged offline log with one device dispatch per
        ``chunk`` accepted scans (resident path only; falls back to the
        per-scan loop otherwise).

        ``staged`` is a list of (points, mask, origin) device arrays (see
        :func:`iris_lama_tpu.utils.cloud.pad_scan`), ``odoms`` the matching
        odometry poses. The motion gate runs on host exactly like
        :meth:`update` (it only reads odometry), so the set of accepted
        scans — and their odometry deltas — is identical to the sequential
        driver; the device program then chains the accepted updates with
        ``lax.scan`` (reference per-scan loop: src/slam2d.cpp:143-198).
        Returns the list of accepted scan indices.
        """
        start = 0
        accepted = []
        if not self.has_first_scan:
            p, m, o = staged[0]
            if self._step is None:
                self._max_beams = p.shape[0]
                self._build_programs()
            self.odom_ = odoms[0]
            self._do_first(p, m, o)
            start = 1
            accepted.append(0)
        if not self._resident or self._chunk is None:
            for k in range(start, len(staged)):
                if self.update_prepadded(*staged[k], odoms[k]):
                    accepted.append(k)
            return accepted

        # "unroll" (default): straight-line C-scan programs, remainder via
        # the per-scan program — no gating cond, no scan-body buffer
        # copies. "scan": the lax.scan+cond chunk (kept for A/B; measured
        # slower on TPU, faster on CPU).
        mode = os.environ.get("IRIS_SLAM_CHUNK_MODE", "unroll")
        use_np = self._host_reorg and mode == "unroll"
        if mode == "unroll":
            # depth A/B on TPU (prof_unroll r3, medians of 3):
            # 8 -> 288 (noisy 211-470), 16 -> 666 (475-673), 32 -> 642
            # (562-679). 16 amortizes the ~2.5 ms tunnel dispatch to
            # ~0.16 ms/scan and rides through per-dispatch latency noise;
            # 32 ties within noise at 2x the program size.
            chunk = min(chunk, int(os.environ.get("IRIS_SLAM_UNROLL",
                                                  "16")))
            unroll_prog = (self._make_unroll_np(chunk) if use_np
                           else self._make_unroll(chunk))

        pend = []   # accepted (odelta, points, mask, origin)

        def flush_chunk():
            nonlocal pend
            n_real = len(pend)
            if n_real == 0:
                return
            if mode == "unroll" and n_real < chunk:
                for od_np, p, m, o in pend:     # tail: per-scan program
                    self._do_step_od(jnp.asarray(od_np), p, m, o)
                pend = []
                return
            while len(pend) < chunk:           # pad tail with no-ops
                pend.append(pend[-1])
            od = jnp.asarray(np.stack([p[0] for p in pend]))
            pts = jnp.stack([p[1] for p in pend])
            msk = jnp.stack([p[2] for p in pend])
            org = jnp.stack([p[3] for p in pend])
            if use_np:
                (self._map, self._res_occ, self._res_vis, self._res_dist,
                 self._pose_dev, self._traj, self._esc_dev,
                 info) = unroll_prog(
                    self._map, self._res_org, self._res_occ,
                    self._res_vis, self._res_dist, self._pose_dev,
                    self._traj, self._esc_dev,
                    jnp.int32(self._n_updates), od, pts, msk, org)
            elif mode == "unroll":
                (self._map, self._res_org, self._res_occ, self._res_vis,
                 self._res_dist, self._pose_dev, self._traj,
                 info) = unroll_prog(
                    self._map, self._res_org, self._res_occ, self._res_vis,
                    self._res_dist, self._pose_dev, self._traj,
                    jnp.int32(self._n_updates), od, pts, msk, org)
            else:
                dos = jnp.asarray(np.arange(chunk) < n_real)
                (self._map, self._res_org, self._res_occ, self._res_vis,
                 self._res_dist, self._pose_dev, self._traj,
                 info) = self._chunk(
                    self._map, self._res_org, self._res_occ, self._res_vis,
                    self._res_dist, self._pose_dev, self._traj,
                    jnp.int32(self._n_updates), od, pts, msk, org, dos)
            self._res_dirty = True
            self._pose_host = None
            self._last_info_dev = info
            self._n_updates += n_real
            self._check_traj_cap()
            pend = []

        for k in range(start, len(staged)):
            odelta = self.odom_ - odoms[k]
            if (np.linalg.norm(odelta.xy()) <= self.options.trans_thresh
                    and abs(odelta.rotation()) <=
                    self.options.rot_thresh):
                continue
            if (use_np and self._odom_reorg is not None
                    and float(np.linalg.norm(
                        (self._odom_reorg - odoms[k]).xy()))
                    >= self._reorg_trigger_m):
                flush_chunk()          # staged scans precede the re-org
                self._maybe_reorg(odoms[k])
            self.odom_ = odoms[k]
            pend.append((odelta.se2_array().astype(np.float32),)
                        + tuple(staged[k]))
            accepted.append(k)
            if len(pend) == chunk:
                flush_chunk()
        flush_chunk()
        return accepted

    def full_map(self) -> mapping.SlamMapState:
        """The complete map for IO/export: with the spill tier active this
        re-merges host-stored patches (geometry unchanged; pool capacity may
        be larger than options.capacity)."""
        if self._spill is None or not self._spill.store:
            return self.map
        merged, _ = self._spill.merged_map(self.map)
        return merged

    def memory_usage(self) -> int:
        """Allocated patch bytes (Map::memory, src/sdm/map.cpp:115-137).

        Reads the unflushed pool (plus the dense resident grids when
        active) so per-update Summary probes never force a pool flush.
        """
        n = int(self._map.table.num_patches())
        if self._resident and self._res_dist is not None:
            w = self.cfg.resident_window_cells
            return (n * self.cfg.geometry.patch_length ** 2 * 9
                    + w * w * (2 + 2 + self._res_dist.dtype.itemsize)
                    + (self._spill.memory_usage() if self._spill else 0))
        length = self.cfg.geometry.patch_length
        per_patch = length * length * (2 + 2 + 1 + 4)
        total = n * per_patch
        if self._spill is not None:
            total += self._spill.memory_usage()
        return total

    # -- host spill tier ------------------------------------------------------
    def _approx_pose(self, odometry: Pose2D) -> np.ndarray:
        """Predicted map-frame pose without a device pull: the device pose
        at the last sync composed with the odometry increment since. Must be
        called BEFORE ``self.odom_`` is advanced (the synced device pose
        corresponds to the previous odometry). Drift between syncs is
        covered by the refill margin."""
        if self._sync_pose is None:
            self._sync_now()
        est = self._sync_pose + (self._sync_odom - odometry)
        return np.asarray(est.xy())

    def _sync_now(self) -> None:
        """Pair the current device pose with its odometry (one pull)."""
        self._pose_host = None
        self._sync_pose = self.pose()
        self._sync_odom = self.odom_

    def _spill_hooks(self, odometry: Pose2D) -> None:
        """Refill the upcoming window; spill when the pool nears capacity.

        Pool-pressure checks are driven by a host-side upper bound (window
        keys ever approached minus keys in the store) so the steady state
        costs zero device pulls."""
        sp = self._spill
        xy = self._approx_pose(odometry)
        if sp.store:
            self.map = sp.refill(self.map, xy)
        self._potential.update(int(k) for k in sp.window_keys_np(xy))
        upper = len(self._potential) - len(sp.store)
        if upper > self._check_at:
            self._sync_now()
            xy = self._approx_pose(odometry)
            n_active = int(self.map.table.num_patches())
            if n_active > sp.high:
                self.map = sp.spill(self.map, xy)
                n_active = int(self.map.table.num_patches())
            # next check once the upper bound grows past high water again
            # (floor of 8 so a keep-zone ~ capacity doesn't re-check every
            # update — each check costs two device pulls)
            self._check_at = (len(self._potential) - len(sp.store)
                              + max(sp.high - n_active, 8))

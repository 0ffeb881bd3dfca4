"""Rao-Blackwellized particle-filter SLAM (the reference's PFSlam2D).

reference: include/lama/pf_slam2d.h, src/pf_slam2d.cpp. Each particle owns a
full (occupancy, distance) map pair; per update: sample motion noise
(drawFromMotion, :365-391), scan-match every particle on its own map
(:416-437), likelihood (:393-414), normalize + Neff (:511-535), systematic
resampling when Neff < N/2 (:537-574), then rasterize the scan into every
particle's maps (:439-509).

TPU architecture: the reference's ThreadPool fan-out/barrier pairs
(SURVEY §3.2) become a *particle axis*: every map array carries a leading
[N] dimension, per-particle work is `vmap`-ed, and multi-chip scaling is
pure sharding of that axis (see parallel/pf_sharding.py) — weights/Neff
reduce with `psum`-style collectives inserted by XLA, resampling is a
cross-shard gather. Randomness is `jax.random` counter-based, reproducible
like Options::seed (pf_slam2d.h:174-176).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.pose import Pose2D
from ..match import match_surface_2d as match
from ..nlls.robust import CAUCHY_SCAN
from ..nlls.solver import SolverOptions
from ..ops import gn_batch, gn_solve, slice_mxu
from ..sdm import mapping, window as win_mod
from ..sdm.geometry import MapGeometry
from ..utils.cloud import PointCloudXYZ, pad_scan, beam_bucket
from ..utils.summary import Summary

# Stage-cost debug bounds (wrong results, real timing) — see the matching
# IRIS_DEBUG_NO_* flags in sdm/mapping.py for the methodology.
_DEBUG_NO_MATCH = bool(int(os.environ.get("IRIS_DEBUG_NO_MATCH", "0")))
_DEBUG_NO_LINEAGE = bool(int(os.environ.get("IRIS_DEBUG_NO_LINEAGE", "0")))
_DEBUG_NO_REORG = bool(int(os.environ.get("IRIS_DEBUG_NO_REORG", "0")))
_DEBUG_NO_MAP = bool(int(os.environ.get("IRIS_DEBUG_NO_MAP", "0")))


@dataclasses.dataclass(frozen=True)
class PFSlam2DOptions:
    """reference: PFSlam2D::Options (pf_slam2d.h:132-185) + TPU sizing."""

    particles: int = 30
    srr: float = 0.1
    str_: float = 0.2
    stt: float = 0.1
    srt: float = 0.2
    meas_sigma: float = 0.05
    meas_sigma_gain: float = 3.0
    trans_thresh: float = 0.5
    rot_thresh: float = 0.5
    l2_max: float = 0.5
    truncated_ray: float = 0.0
    truncated_range: float = 0.0
    resolution: float = 0.05
    patch_size: int = 32
    max_iter: int = 100
    strategy: str = "gn"
    seed: int = 0
    create_summary: bool = False
    # Opt-in per-phase Summary (PFSlam2D::Summary parity: solve/normalize/
    # resample/mapping timings, src/pf_slam2d.cpp:66-101). Splits the fused
    # update into four programs with host syncs between — observability
    # mode, off the hot path by default. Resident path only.
    detailed_summary: bool = False
    # Compression knobs kept for 1:1 Options parity (slam2d.h:115-120).
    # On TPU the live pool stays uncompressed in HBM; these select the codec
    # used for host-side snapshots/checkpoints (utils/codec.py).
    use_compression: bool = False
    cache_size: int = 100
    calgorithm: str = "lz4"
    # --- TPU sizing ---
    max_range: float = 10.0
    max_beams: int = 0
    capacity: int = 2048
    # PF windows anchor at the per-particle pose right before each use
    # (post-motion for the match, post-resample for the map update), so the
    # match-travel margin can be much tighter than Slam2D's — this shrinks
    # the window from 18 to 16 patches (-21% EDT/gather/writeback area)
    pose_slack: float = 0.5
    # Resident sliding window (sdm/mapping.py): keep the dense per-particle
    # window grids as primary state and exchange with the patch pool only
    # when the filter strays from the shared window origin — removes the
    # per-update gather/alloc/writeback entirely at the cost of a slightly
    # wider window. Exact (same windowed-EDT contract).
    resident_window: bool = True
    # wander headroom rings on the resident window (sdm/mapping.py:
    # MappingConfig.resident_extra_patches). prof_pf_events: with 0 rings
    # the filter re-orgs on 41% of updates at ~+45 ms each (the minimum
    # window allows half a patch of wander). Measured interleaved on the
    # PF bench: 30.2/31.3 (0) -> 38.7/41.5 (2) -> 51.6/51.1/44.9/34.9 (4)
    # -> 49.2/33.7 (6) -> 58.4/53.8 (8) up/s at identical 1.0 mm error
    # (the 34.9/33.7 round hit a tunnel-drift window; 8 led every round).
    # Env override for A/B.
    resident_extra_patches: int = int(os.environ.get(
        "IRIS_RESIDENT_EXTRA", "8"))
    # Host-gated re-orgs (r3, mirrors Slam2DOptions.host_reorg): the
    # per-update program drops the device-side re-org cond — staging the
    # 30x [W, W] grids + pools through the cond's branches was measured
    # to be ~95% of the PF update on the tunnel (prof_pf_nocond: 89 up/s
    # with the cond, 2790-3257 with it compiled out; the honest host-gated
    # version keeps results bitwise-correct). The driver predicts re-orgs
    # from odometry travel and dispatches the settle+flush+regather as its
    # own program; the step's `escaped` info field is the guard.
    host_reorg: bool = os.environ.get("IRIS_PF_HOST_REORG", "1") != "0"
    host_reorg_slack: float = 1.5   # odometry drift + particle spread (m)
    # Re-org flush/regather particle group size (0 = never chunk, -1 =
    # auto). Chunking bounds the patch-blocked transients (4x tile
    # padding) that OOMed HBM at 512 particles x 2048-patch pools; but it
    # also serializes the re-org into scan trips — at 512 x 512-patch
    # pools the UNchunked re-org measured 318 vs 353 ms (bench 4.42 vs
    # 4.16 up/s). Auto chunks at 64 only when the total pool payload
    # exceeds ~3 GB.
    reorg_chunk: int = int(os.environ.get("IRIS_PF_REORG_CHUNK", "-1"))
    # Scroll ("band") re-orgs (r5, mapping.resident_scroll): at the same
    # wander-allowance deadline as the full re-org, dispatch a band
    # re-org — kp-patch edge-band flush/gather + a roll (bit-identical
    # window content) — instead of flushing + regathering all wp^2
    # patches. kp=0 auto-sizes the band to cover the allowance shift
    # (driver init). Firing scrolls EARLY at a short travel trigger was
    # measured WORSE (office 88.9 vs 98.3 up/s: a scroll costs ~14 ms vs
    # the full re-org's ~63, but a 1.6 m trigger fired 9x more often).
    # Disabled when the spill tier is active (it consumes full flushes).
    scroll_reorg: bool = os.environ.get("IRIS_PF_SCROLL", "1") != "0"
    scroll_kp: int = int(os.environ.get("IRIS_PF_SCROLL_KP", "0"))

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
            resident_extra_patches=self.resident_extra_patches,
        )

    def solver_options(self) -> SolverOptions:
        # scanMatch hardwires GN + Cauchy(0.15) (pf_slam2d.cpp:421-426)
        return SolverOptions(max_iterations=self.max_iter, strategy="gn",
                             robust=CAUCHY_SCAN)


class ParticleSet(NamedTuple):
    """All particle state; every array has leading [N] except ``res_org``
    (the shared resident-window origin; None in legacy pool-per-update
    mode)."""

    pose: jax.Array              # f32[N, 4] SE(2)
    weight: jax.Array            # f32[N]
    weight_sum: jax.Array        # f32[N]
    normalized: jax.Array        # f32[N]
    maps: mapping.SlamMapState   # arrays [N, ...]
    res_org: Optional[jax.Array] = None   # i32[2] shared window origin
    res_occ: Optional[jax.Array] = None   # u16[N, W, W]
    res_vis: Optional[jax.Array] = None   # u16[N, W, W]
    res_dist: Optional[jax.Array] = None  # sq_dtype[N, W, W] capped sqdist
    # Deferred lineage: pool maps are stale between re-orgs (the resident
    # grids are authoritative), so resampling composes this permutation
    # instead of gathering the big pool arrays every update; the gather by
    # ``lineage`` happens once per re-org/flush. i32[N]; resident mode only.
    lineage: Optional[jax.Array] = None
    # Host-store lineage (use_compression only): the composed resample
    # permutation since the host last permuted its per-particle compressed
    # stores (sdm/spill.PFSpillStore). Unlike ``lineage`` it survives
    # device-side re-orgs — only the host resets it, right after applying
    # it to the stores. i32[N].
    spill_lineage: Optional[jax.Array] = None


def particles_init(opts: PFSlam2DOptions, prior_se2) -> ParticleSet:
    n = opts.particles
    cfg = opts.mapping_config()
    one_map = mapping.slam_map_init(cfg)
    maps = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape), one_map)
    # materialize (broadcast views are fine under jit but be explicit)
    maps = jax.tree.map(jnp.array, maps)
    res = {}
    if opts.resident_window:
        geo = cfg.geometry
        w = cfg.resident_window_cells
        prior = jnp.asarray(prior_se2, jnp.float32)
        res = dict(
            res_org=mapping.resident_org(cfg, geo.w2m(prior[:2])),
            res_occ=jnp.zeros((n, w, w), mapping.OCC_DTYPE),
            res_vis=jnp.zeros((n, w, w), mapping.OCC_DTYPE),
            # squared-cell-distance domain (narrow ints; s8 MXU matcher path)
            res_dist=jnp.full((n, w, w), cfg.distance.max_sqdist,
                              cfg.sq_dtype),
            lineage=jnp.arange(n, dtype=jnp.int32),
        )
        if opts.use_compression:
            res["spill_lineage"] = jnp.arange(n, dtype=jnp.int32)
    return ParticleSet(
        pose=jnp.broadcast_to(prior_se2, (n, 4)).astype(jnp.float32),
        weight=jnp.zeros((n,), jnp.float32),
        weight_sum=jnp.zeros((n,), jnp.float32),
        normalized=jnp.full((n,), 1.0 / n, jnp.float32),
        maps=maps,
        **res,
    )


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------

def draw_from_motion(opts: PFSlam2DOptions, key, odelta, poses):
    """Per-particle motion noise (pf_slam2d.cpp:365-391)."""
    n = poses.shape[0]
    dx, dy = odelta[0], odelta[1]
    drot = jnp.arctan2(odelta[3], odelta[2])
    sxy = 0.3 * opts.stt
    sig_x = opts.stt * jnp.abs(dx) + opts.str_ * jnp.abs(drot) + sxy * jnp.abs(dy)
    sig_y = opts.stt * jnp.abs(dy) + opts.str_ * jnp.abs(drot) + sxy * jnp.abs(dx)
    sig_r = opts.srr * jnp.abs(drot) + opts.srt * jnp.sqrt(dx * dx + dy * dy)
    eps = jax.random.normal(key, (n, 3))
    x = dx + eps[:, 0] * sig_x
    y = dy + eps[:, 1] * sig_y
    yaw = drot + eps[:, 2] * sig_r
    yaw = jnp.mod(yaw, 2 * jnp.pi)
    yaw = jnp.where(yaw > jnp.pi, yaw - 2 * jnp.pi, yaw)
    delta = lie.se2(x, y, yaw)
    return lie.se2_compose(poses, delta)


def _scan_match_one(cfg, sopts, map_state, pose0, points_xy, mask, meas_sigma):
    """Scan match + likelihood for one particle (vmapped)."""
    geo = cfg.geometry
    max_dist = cfg.distance.max_dist
    org = win_mod.window_org(geo, geo.w2m(pose0[:2]), cfg.window_patches)
    keys = win_mod.window_patch_keys(geo, org, cfg.window_patches)
    grid, _ = win_mod.gather_window(map_state.table, map_state.dist, keys,
                                    max_dist)
    res = match.solve_window(grid, org, geo, max_dist, points_xy, mask,
                             pose0, sopts)
    # calculateLikelihood: sum -d^2/sigma over beams (pf_slam2d.cpp:393-414)
    hits = lie.se2_apply(res.state, points_xy)
    from ..sdm.distance import interp_window
    d, _ = interp_window(grid, org, geo, hits, max_dist)
    d = d * mask.astype(jnp.float32)
    lik = jnp.sum(-(d * d) / meas_sigma)
    return res.state, lik, org


def _weights_and_resample(opts: PFSlam2DOptions, pset: ParticleSet, key,
                          states, liks):
    """Steps 3-4: normalize + Neff + systematic resampling
    (pf_slam2d.cpp:511-574). Returns (idx, pose, weight, weight_sum, nw,
    neff, do_resample)."""
    n = opts.particles
    weight = pset.weight + liks
    weight_sum = pset.weight_sum + liks

    gain = 1.0 / (opts.meas_sigma_gain * n)
    max_w = jnp.max(weight)
    nw = jnp.exp(gain * (weight - max_w))
    nw = nw / jnp.sum(nw)
    neff = 1.0 / jnp.sum(nw * nw)

    do_resample = neff < (n * 0.5)
    u = jax.random.uniform(key)
    interval = 1.0 / n
    targets = (jnp.arange(n, dtype=jnp.float32) + u) * interval
    cumw = jnp.cumsum(nw)
    res_idx = jnp.searchsorted(cumw, targets, side="right")
    res_idx = jnp.clip(res_idx, 0, n - 1)
    idx = jnp.where(do_resample, res_idx, jnp.arange(n))

    pose = states[idx]
    weight = jnp.where(do_resample, jnp.zeros_like(weight), weight[idx])
    weight_sum = weight_sum[idx]
    return idx, pose, weight, weight_sum, nw, neff, do_resample


def pf_update_step(opts: PFSlam2DOptions, pset: ParticleSet, key,
                   points, mask, origin, use_cond: bool = True):
    """Full per-scan PF update (scan match -> weights -> resample -> maps).

    Motion sampling runs separately per odometry packet (motion_step) to
    mirror the reference's every-call drawFromMotion. Dispatches to the
    resident-window implementation when the particle set carries resident
    grids. ``use_cond=False``: host-gated re-org mode (see Options).
    """
    if pset.res_org is not None:
        return _pf_update_step_resident(opts, pset, key, points, mask,
                                        origin, use_cond=use_cond)
    cfg = opts.mapping_config()
    sopts = opts.solver_options()

    # 2. per-particle scan match + likelihood (THREAD BOUNDARY -> vmap)
    states, liks, orgs = jax.vmap(
        lambda m, p: _scan_match_one(cfg, sopts, m, p, points[:, :2], mask,
                                     opts.meas_sigma)
    )(pset.maps, pset.pose)

    # 3-4. weights + resampling
    idx, pose, weight, weight_sum, nw, neff, do_resample = \
        _weights_and_resample(opts, pset, key, states, liks)
    maps = jax.tree.map(lambda a: a[idx], pset.maps)

    # 5. per-particle map update (second THREAD BOUNDARY -> vmap)
    def upd(m, p):
        new_m, _ = mapping.update_maps(m, cfg, p, points, mask, origin)
        return new_m

    maps = jax.vmap(upd)(maps, pose)

    new_set = ParticleSet(pose, weight, weight_sum, nw, maps)
    info = {"neff": neff, "resampled": do_resample,
            "overflow": jnp.max(maps.table.overflow)}
    return new_set, info


def _pf_match_phase(opts: PFSlam2DOptions, pset: ParticleSet, points, mask,
                    use_cond: bool = True):
    """Phases 0-2 of the resident PF update: re-org cond + per-particle
    scan match + likelihood. Returns ((maps, org, occ, vis, dist, lineage),
    states, liks, match_iters, safe). ``use_cond=False`` compiles the
    re-org cond out entirely (host-gated re-org mode: the driver
    guarantees safety via the odometry-travel trigger)."""
    cfg = opts.mapping_config()
    sopts = opts.solver_options()
    geo = cfg.geometry
    max_dist = cfg.distance.max_dist

    # 0. re-org when any particle leaves the safe zone (device-side cond:
    # flush every particle's window to its pool, re-center on the mean pose,
    # regather — everything stays on device)
    p0cell = geo.w2m(pset.pose[:, :2])                       # [N, 2]
    safe = jnp.all(mapping.resident_safe(cfg, pset.res_org, p0cell))

    def do_reorg(op):
        maps, org, occ, vis, dist, lineage = op
        # settle the deferred lineage first: the pool copies are stale
        # per-slot, so pick each surviving particle's ancestral pool
        maps = jax.tree.map(lambda a: a[lineage], maps)
        maps = jax.vmap(
            lambda m, o, v, d: mapping.resident_flush(m, cfg, org, o, v, d)
        )(maps, occ, vis, dist)
        anchor = jnp.mean(p0cell.astype(jnp.float32), axis=0).astype(
            jnp.int32)
        new_org = mapping.resident_org(cfg, anchor)
        occ, vis, dist = jax.vmap(
            lambda m: mapping.resident_gather(m, cfg, new_org))(maps)
        return (maps, new_org, occ, vis, dist,
                jnp.arange(lineage.shape[0], dtype=jnp.int32))

    if _DEBUG_NO_REORG or not use_cond:
        maps, org, occ, vis, dist, lineage = (
            pset.maps, pset.res_org, pset.res_occ, pset.res_vis,
            pset.res_dist, pset.lineage)
    else:
        maps, org, occ, vis, dist, lineage = jax.lax.cond(
            safe, lambda op: op, do_reorg,
            (pset.maps, pset.res_org, pset.res_occ, pset.res_vis,
             pset.res_dist, pset.lineage))

    # 2. per-particle scan match + likelihood on the resident distance grids
    # (on a pose-centered sub-window when that is smaller — the matcher
    # only probes within reach + pose_slack of the prediction)
    w_res = cfg.resident_window_cells
    ws_m = cfg.match_window_cells

    # Sub-window extraction happens OUTSIDE the per-particle vmap: at
    # large N the vmapped dynamic_slice lowers to XLA's serialized row
    # gather (40 ms on device at 512 particles — prof_r5_gnb: 70.7 vs
    # 31.0 ms for the same solve with pre-sliced grids), so the s8 grids
    # ride the batched one-hot MXU selection instead (ops/slice_mxu.py,
    # exact; bench 3.43 -> 3.93 up/s at 512). At 30 particles the slice
    # was measured ~free (97.4 dynamic_slice vs 95.7 MXU same-day) — the
    # MXU path only engages above IRIS_SLICE_MXU_N. IRIS_SLICE_MXU=0
    # restores the slice path everywhere for A/B.
    if ws_m < w_res:
        lp = geo.w2m(pset.pose[:, :2]) - org                  # [N, 2]
        starts = jnp.clip(lp - ws_m // 2, 0, w_res - ws_m)
        if (dist.dtype == jnp.int8 and slice_mxu.ENABLED
                and opts.particles > int(os.environ.get(
                    "IRIS_SLICE_MXU_N", "64"))
                and jax.default_backend() == "tpu"):
            dist_m = slice_mxu.slice_windows(dist, starts, ws_m)
        else:
            dist_m = jax.vmap(
                lambda d, s: jax.lax.dynamic_slice(
                    d, (s[1], s[0]), (ws_m, ws_m)))(dist, starts)
        m_orgs = org[None, :] + starts
    else:
        dist_m = dist
        m_orgs = jnp.broadcast_to(org, (dist.shape[0], 2))

    def match_one(dist_i, m_org, pose0):
        if _DEBUG_NO_MATCH:
            # Stage-cost stand-in (see sdm/mapping.py): keep the dist-grid
            # and pose dependency, skip the IRLS solve (wrong results).
            res_state = pose0 + 1e-7 * jnp.sum(dist_i[:2, :4])
            res_iters = jnp.int32(0)
        elif ((gn_batch.ENABLED or gn_solve.ENABLED)
              and dist_i.dtype == jnp.int8
              and jax.default_backend() == "tpu"):
            # whole-solve kernel paths (batched ops/gn_batch.py — one
            # launch for all particles — or per-particle ops/gn_solve.py):
            # likelihood SSE comes out of the same launch (-sse/sigma
            # differs from the per-beam division below only in reduction
            # order; CPU paths keep the old math bit-exactly for the
            # resident-vs-pool oracle tests)
            res, sse = match.solve_window_lik(dist_i, m_org, geo, max_dist,
                                              points[:, :2], mask, pose0,
                                              sopts,
                                              batch_hint=opts.particles)
            return res.state, -sse / opts.meas_sigma, res.iterations
        else:
            res = match.solve_window(dist_i, m_org, geo, max_dist,
                                     points[:, :2], mask, pose0, sopts)
            res_state, res_iters = res.state, res.iterations
        hits = lie.se2_apply(res_state, points[:, :2])
        from ..sdm.distance import interp_window
        d, _ = interp_window(dist_i, m_org, geo, hits, max_dist)
        d = d * mask.astype(jnp.float32)
        return res_state, jnp.sum(-(d * d) / opts.meas_sigma), res_iters

    states, liks, match_iters = jax.vmap(match_one)(dist_m, m_orgs,
                                                    pset.pose)
    return (maps, org, occ, vis, dist, lineage), states, liks, \
        match_iters, safe


def _pf_resample_phase(opts: PFSlam2DOptions, pset: ParticleSet, mid, idx,
                       do_resample):
    """Phase 4b: apply the resample permutation — deferred pool lineage
    composition + cond-gated resident-grid gathers."""
    maps, org, occ, vis, dist, lineage = mid
    spill_lineage = pset.spill_lineage
    if not _DEBUG_NO_LINEAGE:
        # pool maps: defer — compose the permutation (settled at re-org).
        # The big resident-grid gathers only run on actual resamples
        # (idx == arange otherwise, when the gather would copy ~180 MB of
        # grids to produce identical arrays)
        lineage = lineage[idx]
        if spill_lineage is not None:
            spill_lineage = spill_lineage[idx]
        if opts.particles > int(os.environ.get("IRIS_PF_UNCOND_RESAMPLE_N",
                                               "64")):
            # r5: at large N the cond stages the grids through its
            # branches every update (~21 ms of copies + 10 ms conditional
            # at 512 particles, devprof) even when no resample fires; an
            # unconditional gather costs one bandwidth-bound pass
            # (~7.5 ms) instead. Equal results: ``idx`` is already the
            # identity when no resample fires (_weights_and_resample).
            # Small N keeps the cond (r3 measured it neutral at 30).
            occ, vis, dist = occ[idx], vis[idx], dist[idx]
        else:
            occ, vis, dist = jax.lax.cond(
                do_resample,
                lambda ovd: tuple(a[idx] for a in ovd),
                lambda ovd: ovd,
                (occ, vis, dist))
    return (maps, org, occ, vis, dist, lineage), spill_lineage


def _pf_map_phase(opts: PFSlam2DOptions, org, occ, vis, dist, pose,
                  points, mask, origin):
    """Phase 5: per-particle map update — elementwise on resident grids."""
    cfg = opts.mapping_config()

    if _DEBUG_NO_MAP:
        # Stage-cost stand-in: keep the data dependencies, skip the
        # deposit/EDT (wrong results — frozen first-scan maps). XLA folds
        # x*0 (CLAUDE.md), so the pose dependency rides an epsilon-scaled
        # reduction that truncates to 0 in the u16 cast instead.
        eps_dep = (jnp.sum(jnp.abs(pose), axis=-1) * 1e-30).astype(vis.dtype)
        bump = eps_dep + mask[0].astype(vis.dtype)
        return occ, vis + bump[:, None, None], dist

    def upd(o, v, d, p):
        o2, v2, d2, _ = mapping.resident_update(cfg, org, o, v, d, p,
                                                points, mask, origin)
        return o2, v2, d2

    return jax.vmap(upd)(occ, vis, dist, pose)


def _pf_update_step_resident(opts: PFSlam2DOptions, pset: ParticleSet, key,
                             points, mask, origin, use_cond: bool = True):
    """Resident-window PF update: identical math to :func:`pf_update_step`
    but all per-update map work happens on the dense resident grids; the
    patch pool is only exchanged on a (rare) re-org. Composed from the
    phase helpers above (the opt-in detailed-summary mode jits each phase
    separately for reference-parity per-phase timing)."""
    cfg = opts.mapping_config()
    geo = cfg.geometry

    mid, states, liks, match_iters, safe = _pf_match_phase(
        opts, pset, points, mask, use_cond=use_cond)

    # 3-4. weights + resampling (resident grids follow the lineage gather)
    idx, pose, weight, weight_sum, nw, neff, do_resample = \
        _weights_and_resample(opts, pset, key, states, liks)
    mid, spill_lineage = _pf_resample_phase(opts, pset, mid, idx,
                                            do_resample)
    maps, org, occ, vis, dist, lineage = mid

    occ, vis, dist = _pf_map_phase(opts, org, occ, vis, dist, pose,
                                   points, mask, origin)

    new_set = ParticleSet(pose, weight, weight_sum, nw, maps,
                          org, occ, vis, dist, lineage, spill_lineage)
    # escaped: particles whose updates were clipped by the window edge even
    # after a re-org (diverged filter) — degraded, flagged, never fatal
    escaped = jnp.sum(~mapping.resident_safe(cfg, org, geo.w2m(pose[:, :2])))
    info = {"neff": neff, "resampled": do_resample, "reorged": ~safe,
            "escaped": escaped, "overflow": jnp.max(maps.table.overflow),
            "match_iters_max": jnp.max(match_iters),
            "match_iters_mean": jnp.mean(match_iters.astype(jnp.float32))}
    return new_set, info


def pf_chunk_step(opts: PFSlam2DOptions, pset: ParticleSet, key, odeltas,
                  points, masks, origins, dos, valids):
    """C scans of the PF in ONE device program (`lax.scan`).

    Mirrors the sequential driver exactly: motion sampling runs for every
    scan (the reference calls drawFromMotion per odometry packet,
    pf_slam2d.cpp:234-236), the full update runs only where the host-side
    motion gate fired (``dos``). The PRNG key evolves with the same split
    sequence as the per-scan programs, so the chunked replay is
    reproducible like Options::seed. On a remote-TPU tunnel the sequential
    driver pays ~4 dispatches per accepted update (motion per scan +
    update); this pays 1 per C scans."""
    def body(carry, inp):
        od, pts, msk, org, do, valid = inp

        def scan_body(args):
            pset, key = args
            k1, key = jax.random.split(key)
            pset = pset._replace(
                pose=draw_from_motion(opts, k1, od, pset.pose))

            def run(args):
                pset, key = args
                k1, k2 = jax.random.split(key)
                new_pset, _ = pf_update_step(opts, pset, k1, pts, msk, org)
                return new_pset, k2

            return jax.lax.cond(do, run, lambda a: a, (pset, key))

        # padded tail entries are fully inert — they must not consume a
        # PRNG split, or a later per-scan/chunked call would desynchronize
        # from the sequential driver's key stream
        carry = jax.lax.cond(valid, scan_body, lambda a: a, carry)
        return carry, None

    (pset, key), _ = jax.lax.scan(
        body, (pset, key), (odeltas, points, masks, origins, dos, valids))
    info = {"overflow": jnp.max(pset.maps.table.overflow)}
    return pset, key, info


@functools.partial(jax.jit, donate_argnums=(0,))
def pf_settle(pset: ParticleSet) -> ParticleSet:
    """Realize the deferred pool lineage (semantically a no-op: each
    particle's pool becomes its own again) and reset both permutations.
    Host callers MUST permute their per-particle stores with the OLD
    spill_lineage (pulled before this call) — see sdm/spill.PFSpillStore."""
    maps = jax.tree.map(lambda a: a[pset.lineage], pset.maps)
    eye = jnp.arange(pset.lineage.shape[0], dtype=jnp.int32)
    sl = eye if pset.spill_lineage is not None else None
    return pset._replace(maps=maps, lineage=eye, spill_lineage=sl)


@jax.jit
def pf_patch_counts(tables):
    """int32[N] active patch count per particle (tiny pull)."""
    return jax.vmap(lambda t: t.num_patches())(tables)


def pf_first_step(opts: PFSlam2DOptions, pset: ParticleSet, points, mask,
                  origin):
    """First scan: build particle 0's map and share it (pf_slam2d.cpp:185-228
    COW-clones; functionally we just update all identical particles)."""
    cfg = opts.mapping_config()

    if pset.res_org is not None:
        # resident grids were default-initialized at the prior pose's org
        def rupd(o, v, d, p):
            o2, v2, d2, _ = mapping.resident_update(
                cfg, pset.res_org, o, v, d, p, points, mask, origin)
            return o2, v2, d2

        occ, vis, dist = jax.vmap(rupd)(pset.res_occ, pset.res_vis,
                                        pset.res_dist, pset.pose)
        return pset._replace(res_occ=occ, res_vis=vis, res_dist=dist)

    def upd(m, p):
        new_m, _ = mapping.update_maps(m, cfg, p, points, mask, origin)
        return new_m

    maps = jax.vmap(upd)(pset.maps, pset.pose)
    return pset._replace(maps=maps)


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

import functools


def _motion_scan(opts: PFSlam2DOptions, pose, key, odeltas, valids):
    """Apply J queued per-scan motion draws in sequence (the reference
    calls drawFromMotion once per odometry packet, pf_slam2d.cpp:234-236;
    the host queues the packets and replays them here in one program with
    the identical per-packet key-split sequence — bit-equal to J separate
    motion dispatches). ``valids`` masks bucket padding (inert: padded
    entries consume no key split)."""
    def body(carry, inp):
        od, valid = inp

        def run(args):
            pose, key = args
            k1, key = jax.random.split(key)
            return draw_from_motion(opts, k1, od, pose), key

        return jax.lax.cond(valid, run, lambda a: a, carry), None

    (pose, key), _ = jax.lax.scan(body, (pose, key), (odeltas, valids))
    return pose, key


@functools.lru_cache(maxsize=None)
def _make_programs(opts: PFSlam2DOptions):
    """Jitted device programs for a PFSlam2DOptions, shared across driver
    instances (fresh jit wrappers per instance re-trace and re-load a
    byte-identical executable — seconds per program on the remote-TPU
    runtime). The PRNG key lives on device and evolves inside each
    program — a separate jax.random.split would be one more tunnel
    dispatch."""
    def motion(pset, key, odeltas, valids):
        pose, key = _motion_scan(opts, pset.pose, key, odeltas, valids)
        return pset._replace(pose=pose), key

    def update(pset, key, odeltas, valids, pts, msk, org):
        # queued motion + full update in ONE dispatch (the sequential
        # driver used to pay one motion dispatch per scan + one update
        # dispatch per accepted scan — ~4 tunnel round trips per update).
        # host_reorg: the cond is compiled OUT of this program (the driver
        # owns re-org timing); chunked replay programs keep it.
        pose, key = _motion_scan(opts, pset.pose, key, odeltas, valids)
        k1, k2 = jax.random.split(key)
        new_pset, info = pf_update_step(opts, pset._replace(pose=pose), k1,
                                        pts, msk, org,
                                        use_cond=not opts.host_reorg)
        return new_pset, info, k2

    def reorg(pset):
        """Host-triggered re-org: exactly the device cond's body — settle
        lineage, flush every particle's window, re-center on the mean
        pose, regather.

        Large particle counts run the flush+regather in groups of
        ``reorg_chunk`` particles via lax.scan (bit-identical: flush and
        gather are per-particle independent). The all-particle vmap
        materializes patch-blocked transients with 4x (8,128)-tile
        padding — f32[512, 34, 34, 32, 32] alone was 9.0 GB of HLO temp
        and the whole program OOMed at 20.2/15.75 GB HBM (r5, the
        BASELINE #5 512-particle config); chunking bounds the transients
        to the group size while the pool carry is updated in place."""
        cfg = opts.mapping_config()
        geo = cfg.geometry
        n = pset.lineage.shape[0]
        maps = jax.tree.map(lambda a: a[pset.lineage], pset.maps)
        p0cell = geo.w2m(pset.pose[:, :2])
        anchor = jnp.mean(p0cell.astype(jnp.float32), axis=0).astype(
            jnp.int32)
        new_org = mapping.resident_org(cfg, anchor)

        g = opts.reorg_chunk
        if g and n > g and n % g == 0:
            def body(maps_carry, i):
                def sl(a):
                    return jax.lax.dynamic_slice_in_dim(a, i * g, g, 0)

                maps_c = jax.tree.map(sl, maps_carry)
                maps_c = jax.vmap(
                    lambda m, o, v, d: mapping.resident_flush(
                        m, cfg, pset.res_org, o, v, d)
                )(maps_c, sl(pset.res_occ), sl(pset.res_vis),
                  sl(pset.res_dist))
                maps_carry = jax.tree.map(
                    lambda a, c: jax.lax.dynamic_update_slice_in_dim(
                        a, c, i * g, 0), maps_carry, maps_c)
                grids = jax.vmap(
                    lambda m: mapping.resident_gather(m, cfg, new_org)
                )(maps_c)
                return maps_carry, grids

            maps, (occ, vis, dist) = jax.lax.scan(
                body, maps, jnp.arange(n // g))
            occ = occ.reshape((n,) + occ.shape[2:])
            vis = vis.reshape((n,) + vis.shape[2:])
            dist = dist.reshape((n,) + dist.shape[2:])
        else:
            maps = jax.vmap(
                lambda m, o, v, d: mapping.resident_flush(
                    m, cfg, pset.res_org, o, v, d)
            )(maps, pset.res_occ, pset.res_vis, pset.res_dist)
            occ, vis, dist = jax.vmap(
                lambda m: mapping.resident_gather(m, cfg, new_org))(maps)
        return pset._replace(
            maps=maps, res_org=new_org, res_occ=occ, res_vis=vis,
            res_dist=dist,
            lineage=jnp.arange(pset.lineage.shape[0], dtype=jnp.int32))

    def scroll(pset):
        """Host-triggered scroll re-org (mapping.resident_scroll): settle
        lineage, then re-center the window toward the mean pose touching
        only kp-patch edge bands per particle. The target org is clamped
        to +-kp patches (a clamped scroll under-centers; the escape guard
        covers the rare case where travel outruns the trigger)."""
        cfg = opts.mapping_config()
        geo = cfg.geometry
        kp = opts.scroll_kp
        length = geo.patch_length
        n = pset.lineage.shape[0]
        maps = jax.tree.map(lambda a: a[pset.lineage], pset.maps)
        p0cell = geo.w2m(pset.pose[:, :2])
        anchor = jnp.mean(p0cell.astype(jnp.float32), axis=0).astype(
            jnp.int32)
        target = mapping.resident_org(cfg, anchor)
        shift = jnp.clip(target - pset.res_org, -kp * length, kp * length)
        new_org = pset.res_org + shift

        def one(m, o, v, d):
            return mapping.resident_scroll(m, cfg, pset.res_org, o, v, d,
                                           new_org, kp)

        g = opts.reorg_chunk
        if g and n > g and n % g == 0:
            def body(_, i):
                def sl(a):
                    return jax.lax.dynamic_slice_in_dim(a, i * g, g, 0)

                maps_c = jax.tree.map(sl, maps)
                m2, o2, v2, d2 = jax.vmap(one)(
                    maps_c, sl(pset.res_occ), sl(pset.res_vis),
                    sl(pset.res_dist))
                return None, (m2, (o2, v2, d2))

            _, (maps2, grids) = jax.lax.scan(body, None,
                                             jnp.arange(n // g))
            maps2 = jax.tree.map(
                lambda a: a.reshape((n,) + a.shape[2:]), maps2)
            occ, vis, dist = (a.reshape((n,) + a.shape[2:]) for a in grids)
        else:
            maps2, occ, vis, dist = jax.vmap(one)(
                maps, pset.res_occ, pset.res_vis, pset.res_dist)
        return pset._replace(
            maps=maps2, res_org=new_org, res_occ=occ, res_vis=vis,
            res_dist=dist,
            lineage=jnp.arange(pset.lineage.shape[0], dtype=jnp.int32))

    @functools.lru_cache(maxsize=None)
    def make_unroll(c: int, q: int):
        """C accepted updates per dispatch, STRAIGHT-LINE: each update is
        textually the sequential driver's fused (queued-motion + update)
        program — no lax.scan carry, no gating cond, so XLA compiles the
        same buffer-aliasing structure as the per-update program (the
        scan+cond chunk body pays conservative copies of the carried
        particle maps: r2 measured 62.8 vs 89.5 up/s) — while the dispatch
        count drops by C. Each update carries its own [q]-bucketed motion
        packet queue (valids mask padding, which consumes no key split),
        so the PRNG stream is bit-identical to the sequential driver's."""
        def unroll(pset, key, odeltas, valids, pts, msks, origins):
            # host_reorg: cond-free bodies (the driver's staging loop
            # checks the re-org trigger between chunks; the ~12.5 m
            # wander allowance dwarfs a chunk's travel)
            info = {}
            for i in range(c):
                pose, key = _motion_scan(opts, pset.pose, key, odeltas[i],
                                         valids[i])
                k1, key = jax.random.split(key)
                pset, info = pf_update_step(opts, pset._replace(pose=pose),
                                            k1, pts[i], msks[i],
                                            origins[i],
                                            use_cond=not opts.host_reorg)
            return pset, key, info

        return jax.jit(unroll, donate_argnums=(0,))

    # ---- opt-in detailed-summary phase programs (PFSlam2D::Summary
    # parity) — same phase helpers the fused update composes ----------------
    def split_match(pset, key, odeltas, valids, pts, msk):
        pose, key = _motion_scan(opts, pset.pose, key, odeltas, valids)
        k1, k2 = jax.random.split(key)
        pset = pset._replace(pose=pose)
        mid, states, liks, match_iters, safe = _pf_match_phase(
            opts, pset, pts, msk)
        return pset, mid, states, liks, match_iters, safe, k1, k2

    def split_norm(pset, k1, states, liks):
        return _weights_and_resample(opts, pset, k1, states, liks)

    def split_resample(pset, mid, idx, do_resample):
        return _pf_resample_phase(opts, pset, mid, idx, do_resample)

    def split_map(mid, spill_lineage, pose, weight, weight_sum, nw, pts,
                  msk, org3, match_iters, safe, neff, do_resample):
        maps, org, occ, vis, dist, lineage = mid
        occ, vis, dist = _pf_map_phase(opts, org, occ, vis, dist, pose,
                                       pts, msk, org3)
        cfg = opts.mapping_config()
        geo = cfg.geometry
        new_set = ParticleSet(pose, weight, weight_sum, nw, maps, org,
                              occ, vis, dist, lineage, spill_lineage)
        escaped = jnp.sum(~mapping.resident_safe(cfg, org,
                                                 geo.w2m(pose[:, :2])))
        info = {"neff": neff, "resampled": do_resample, "reorged": ~safe,
                "escaped": escaped,
                "overflow": jnp.max(maps.table.overflow),
                "match_iters_max": jnp.max(match_iters),
                "match_iters_mean": jnp.mean(
                    match_iters.astype(jnp.float32))}
        return new_set, info

    split = {
        "match": jax.jit(split_match, donate_argnums=(0,)),
        "norm": jax.jit(split_norm),
        "resample": jax.jit(split_resample),
        "map": jax.jit(split_map),
    }

    return (
        jax.jit(motion, donate_argnums=(0,)),
        jax.jit(update, donate_argnums=(0,)),
        jax.jit(lambda pset, pts, msk, org: pf_first_step(opts, pset, pts,
                                                          msk, org),
                donate_argnums=(0,)),
        jax.jit(
            lambda pset, key, od, pts, msk, org, dos, valids: pf_chunk_step(
                opts, pset, key, od, pts, msk, org, dos, valids),
            donate_argnums=(0,)),
        make_unroll,
        split,
        jax.jit(reorg, donate_argnums=(0,)),
        jax.jit(scroll, donate_argnums=(0,)),
    )


class PFSlam2D:
    """Host driver; mirrors the reference public API (pf_slam2d.h:188-254)."""

    def __init__(self, options: PFSlam2DOptions = PFSlam2DOptions()):
        if options.reorg_chunk < 0:    # auto (see the option's docstring)
            pool_bytes = (options.particles * options.capacity
                          * options.patch_size ** 2 * 9)   # u16+u16+f32+s8
            options = dataclasses.replace(
                options, reorg_chunk=64 if pool_bytes > 3 << 30 else 0)
        self.options = options
        seed = options.seed if options.seed != 0 else int(
            time.time_ns() % (2 ** 31))
        self.key = jax.random.PRNGKey(seed)
        self.pose_prior = Pose2D()
        self.odom_ = Pose2D()
        self.has_first_scan = False
        self.acc_trans = 0.0
        self.acc_rot = 0.0
        self.pset: Optional[ParticleSet] = None
        self.summary: Optional[Summary] = (
            Summary() if options.create_summary else None)
        self._max_beams = options.max_beams
        self._jit_update = None
        self._last_info_dev = {}
        self._jit_motion = None
        self._jit_first = None
        self._jit_flush_one = None
        self._jit_chunk = None
        self._odelta_queue = []   # motion packets since the last dispatch
        # host-gated re-orgs (see Options.host_reorg): trigger distance
        # from the window's wander allowance; auto-fallback to the device
        # cond when the window is too tight for a safe host trigger
        self._odom_reorg: Optional[Pose2D] = None
        self._pf_trigger_m = 0.0
        self._n_reorgs = 0   # host-gated re-orgs dispatched
        # escaped-guard (ADVICE r3): particle spread is unbounded in
        # principle, so the fixed slack is checked — the step's escaped
        # counter is harvested once per re-org (async copy started at the
        # previous re-org), the trigger tightens on escape, and the driver
        # rebuilds with the device-cond step when no safe trigger remains.
        self._esc_stash = None
        self._esc_seen = 0
        self._esc_last_t = -1e9   # last harvest snapshot (monotonic s)
        self._esc_clean = 0       # consecutive escape-free harvests
        self._esc_strikes = 0     # consecutive bursty harvests
        self._pf_trigger0 = 0.0   # initial trigger (recovery ceiling)
        self._pf_scroll_m = 0.0   # scroll-re-org trigger (0 = disabled)
        if options.host_reorg and options.resident_window:
            cfg = options.mapping_config()
            cells = (cfg.resident_window_cells // 2
                     - cfg.resident_margin_cells
                     - cfg.geometry.patch_length)
            self._pf_trigger_m = (cells * cfg.geometry.resolution
                                  - options.host_reorg_slack)
            self._pf_trigger0 = self._pf_trigger_m
            if self._pf_trigger_m < 0.5:
                self.options = options = dataclasses.replace(
                    options, host_reorg=False)
            elif options.scroll_reorg and not options.use_compression:
                # scrolls fire at the SAME deadline as full re-orgs; the
                # band must cover the allowance shift plus slack
                patch_m = (cfg.geometry.patch_length
                           * cfg.geometry.resolution)
                kp_need = int(np.ceil(
                    (self._pf_trigger_m + options.host_reorg_slack)
                    / patch_m)) + 1
                wp = cfg.resident_window_patches
                if options.scroll_kp == 0 and kp_need < wp // 2:
                    self.options = options = dataclasses.replace(
                        options, scroll_kp=kp_need)
                if 0 < options.scroll_kp < wp // 2:
                    self._pf_scroll_m = self._pf_trigger_m
        # per-particle spill tier (use_compression parity:
        # /root/reference/src/pf_slam2d.cpp:201-204 — the compressor bounds
        # every particle's live map memory)
        self._pf_spill = None
        if options.use_compression and options.resident_window:
            from ..sdm.spill import PFSpillStore
            cfg = options.mapping_config()
            self._pf_spill = PFSpillStore(cfg, cfg.geometry,
                                          options.particles,
                                          codec=options.calgorithm)
            self._sync_pose: Optional[Pose2D] = None
            self._sync_odom: Optional[Pose2D] = None
            self._potential: set = set()
            self._check_at = int(0.85 * options.capacity)

    def set_prior(self, prior: Pose2D) -> None:
        self.pose_prior = prior

    def _build(self):
        (self._jit_motion, self._jit_update, self._jit_first,
         self._jit_chunk, self._make_unroll, self._jit_split,
         self._jit_reorg, self._jit_scroll) = _make_programs(self.options)

    def update(self, cloud: PointCloudXYZ, odometry: Pose2D,
               timestamp: float = 0.0) -> bool:
        """pf_slam2d.cpp:178-311."""
        if self._max_beams == 0:
            self._max_beams = beam_bucket(len(cloud.points))
        points, mask, origin = pad_scan(cloud, self._max_beams)
        return self.update_prepadded(
            jnp.asarray(points), jnp.asarray(mask), jnp.asarray(origin),
            odometry, timestamp)

    def update_prepadded(self, points, mask, origin, odometry: Pose2D,
                         timestamp: float = 0.0) -> bool:
        """Per-scan path on pre-padded arrays."""
        t0 = time.perf_counter()
        opts = self.options
        if self._max_beams == 0:
            self._max_beams = points.shape[0]
        if self._jit_update is None:
            self._build()

        if not self.has_first_scan:
            self.odom_ = odometry
            self._odom_reorg = odometry
            self.pset = particles_init(opts, jnp.asarray(
                self.pose_prior.se2_array()))
            self.pset = self._jit_first(self.pset, points, mask, origin)
            jax.block_until_ready(self.pset.maps.dist)
            self.has_first_scan = True
            if self.summary:
                dt = time.perf_counter() - t0
                self.summary.probe(timestamp, dt, mapping=dt,
                                   memory=self.memory_usage())
            return True

        # 1. motion prediction for every particle, every call — QUEUED on
        # host and replayed inside the next device program (identical key
        # sequence; see _motion_scan). Dispatching motion per scan paid a
        # tunnel round trip per odometry packet.
        odelta = self.odom_ - odometry
        self.odom_ = odometry
        self._odelta_queue.append(odelta.se2_array().astype(np.float32))

        self.acc_trans += float(np.linalg.norm(odelta.xy()))
        self.acc_rot += abs(odelta.rotation())
        if (self.acc_trans <= opts.trans_thresh and
                self.acc_rot <= opts.rot_thresh):
            return False
        self.acc_trans = 0.0
        self.acc_rot = 0.0

        if self._pf_spill is not None:
            self._pf_spill_hooks(odometry)   # refill near / spill far
        if opts.host_reorg and self.pset.res_org is not None:
            self._pf_maybe_reorg(odometry)

        if (self.summary is not None and opts.detailed_summary
                and self.pset.res_org is not None):
            self._update_detailed(points, mask, origin, timestamp, t0)
            return True

        # 2-5. queued motion + fused device update, ONE dispatch
        od, valids = self._queued()
        self.pset, info, self.key = self._jit_update(self.pset, self.key,
                                                     od, valids,
                                                     points, mask, origin)
        self._last_info_dev = info

        if self.summary:
            dt = time.perf_counter() - t0
            self.summary.probe(timestamp, dt, solving=dt, mapping=dt,
                               memory=self.memory_usage())
        return True

    def _update_detailed(self, points, mask, origin, timestamp: float,
                         t0: float) -> None:
        """Four-phase update with host syncs between — real per-phase
        Summary rows (PFSlam2D::Summary parity, src/pf_slam2d.cpp:66-101);
        ~4x dispatch overhead, observability mode only
        (``PFSlam2DOptions.detailed_summary``)."""
        sp = self._jit_split
        od, valids = self._queued()
        ts = time.perf_counter()
        (pset, mid, states, liks, match_iters, safe, k1,
         self.key) = sp["match"](self.pset, self.key, od, valids, points,
                                 mask)
        jax.block_until_ready(liks)
        t_solve = time.perf_counter() - ts

        tn = time.perf_counter()
        idx, pose, weight, weight_sum, nw, neff, do_resample = sp["norm"](
            pset, k1, states, liks)
        jax.block_until_ready(nw)
        t_norm = time.perf_counter() - tn

        tr = time.perf_counter()
        mid, spill_lineage = sp["resample"](pset, mid, idx, do_resample)
        jax.block_until_ready(mid[4])
        t_res = time.perf_counter() - tr

        tm = time.perf_counter()
        self.pset, info = sp["map"](mid, spill_lineage, pose, weight,
                                    weight_sum, nw, points, mask, origin,
                                    match_iters, safe, neff, do_resample)
        self._last_info_dev = info
        jax.block_until_ready(self.pset.res_dist)
        t_map = time.perf_counter() - tm
        self.summary.probe(timestamp, time.perf_counter() - t0,
                           solving=t_solve, normalizing=t_norm,
                           resampling=t_res, mapping=t_map,
                           memory=self.memory_usage())

    def update_many_prepadded(self, staged, odoms, chunk: int = 8) -> list:
        """Replay a pre-staged offline log, one device dispatch per
        ``chunk`` accepted updates (every scan does motion sampling; gated
        scans run the full update — exactly the per-scan driver's
        behavior, including the PRNG split sequence). ``staged`` holds
        (points, mask, origin) device arrays. Returns accepted indices.

        Replay program shapes (IRIS_PF_CHUNK_MODE), with the r3 TPU A/B
        verdict (bench_pf, medians):
        * "seq" (default) — one fused per-update dispatch (the live
          driver's program): **90.2 up/s**. Fastest: PF's per-update
          device time (~11 ms) already amortizes the tunnel dispatch.
        * "unroll" — straight-line C-update programs. With the device
          re-org cond in the bodies: 81.1 / 76.9 / 73.6 up/s at depth
          4 / 8 / 16 (each cond stages the [N, W, W] grids + pools
          through its branches). Cond-free under host-gated re-orgs:
          84.5 at depth 8 — a TIE with sequential, confirming PF is
          bound by the per-update IRLS while_loop latency, not by
          dispatch count or the cond. The same structure wins on Slam2D
          (P=1) because there the per-scan compute is tiny.
        * "scan" — the lax.scan+cond chunk over raw scans: 62.8 (r2).
        All three are PRNG-stream-identical to the live driver (equality
        tests cover scan + unroll).
        """
        opts = self.options
        if self._max_beams == 0:
            self._max_beams = staged[0][0].shape[0]
        if self._jit_update is None:
            self._build()
        mode = os.environ.get("IRIS_PF_CHUNK_MODE", "seq")
        if self._pf_spill is not None or mode == "seq":
            # fastest path (and the spill tier needs its host hooks
            # before every update): one fused dispatch per update
            accepted = []
            for k in range(len(staged)):
                if self.update_prepadded(*staged[k], odoms[k]):
                    accepted.append(k)
            return accepted
        self._flush_motion()   # mixed per-scan/chunked usage stays exact
        start = 0
        accepted = []
        if not self.has_first_scan:
            self.odom_ = odoms[0]
            self._odom_reorg = odoms[0]
            self.pset = particles_init(opts, jnp.asarray(
                self.pose_prior.se2_array()))
            self.pset = self._jit_first(self.pset, *staged[0])
            self.has_first_scan = True
            start = 1
            accepted.append(0)

        if mode == "unroll":
            return self._replay_unroll(staged, odoms, start, accepted,
                                       chunk)

        pend = []

        def flush_chunk():
            nonlocal pend
            if not pend:
                return
            while len(pend) < chunk:   # inert padding (valid=False)
                pend.append((np.array([0, 0, 1, 0], np.float32),)
                            + pend[-1][1:4] + (False, False))
            od = jnp.asarray(np.stack([p[0] for p in pend]))
            pts = jnp.stack([p[1] for p in pend])
            msk = jnp.stack([p[2] for p in pend])
            org = jnp.stack([p[3] for p in pend])
            dos = jnp.asarray(np.array([p[4] for p in pend]))
            valids = jnp.asarray(np.array([p[5] for p in pend]))
            self.pset, self.key, info = self._jit_chunk(
                self.pset, self.key, od, pts, msk, org, dos, valids)
            self._last_info_dev = info
            pend = []

        for k in range(start, len(staged)):
            odelta = self.odom_ - odoms[k]
            self.odom_ = odoms[k]
            self.acc_trans += float(np.linalg.norm(odelta.xy()))
            self.acc_rot += abs(odelta.rotation())
            do = (self.acc_trans > opts.trans_thresh or
                  self.acc_rot > opts.rot_thresh)
            if do:
                self.acc_trans = 0.0
                self.acc_rot = 0.0
                accepted.append(k)
            pend.append((odelta.se2_array().astype(np.float32),)
                        + tuple(staged[k]) + (do, True))
            if len(pend) == chunk:
                flush_chunk()
        flush_chunk()
        return accepted

    def _replay_unroll(self, staged, odoms, start, accepted, chunk):
        """Straight-line unroll replay body (see update_many_prepadded)."""
        opts = self.options
        pend = []   # accepted entries: ([motion packets], pts, msk, org)

        def bucket(j):
            return max(4, 1 << (j - 1).bit_length()) if j else 4

        def flush_pend():
            nonlocal pend
            if len(pend) < chunk:
                # remainder: the per-update fused program (same as live)
                for packets, pts, msk, org in pend:
                    q = bucket(len(packets))
                    od = np.stack(packets
                                  + [np.array([0, 0, 1, 0], np.float32)]
                                  * (q - len(packets)))
                    valids = np.arange(q) < len(packets)
                    self.pset, info, self.key = self._jit_update(
                        self.pset, self.key, jnp.asarray(od),
                        jnp.asarray(valids), pts, msk, org)
                    self._last_info_dev = info
                pend = []
                return
            q = bucket(max(len(p[0]) for p in pend))
            od = np.stack([
                np.stack(p[0] + [np.array([0, 0, 1, 0], np.float32)]
                         * (q - len(p[0]))) for p in pend])
            valids = np.stack([np.arange(q) < len(p[0]) for p in pend])
            pts = jnp.stack([p[1] for p in pend])
            msk = jnp.stack([p[2] for p in pend])
            org = jnp.stack([p[3] for p in pend])
            prog = self._make_unroll(chunk, q)
            self.pset, self.key, info = prog(
                self.pset, self.key, jnp.asarray(od), jnp.asarray(valids),
                pts, msk, org)
            self._last_info_dev = info
            pend = []

        packets = []   # motion packets since the last accepted update
        for k in range(start, len(staged)):
            odelta = self.odom_ - odoms[k]
            self.odom_ = odoms[k]
            packets.append(odelta.se2_array().astype(np.float32))
            self.acc_trans += float(np.linalg.norm(odelta.xy()))
            self.acc_rot += abs(odelta.rotation())
            if (self.acc_trans <= opts.trans_thresh and
                    self.acc_rot <= opts.rot_thresh):
                continue
            self.acc_trans = 0.0
            self.acc_rot = 0.0
            if (opts.host_reorg and self._odom_reorg is not None
                    and float(np.linalg.norm(
                        (self._odom_reorg - odoms[k]).xy()))
                    >= self._pf_effective_trigger()):
                flush_pend()           # staged updates precede the re-org
                self._pf_maybe_reorg(odoms[k])
            accepted.append(k)
            pend.append((packets,) + tuple(staged[k]))
            packets = []
            if len(pend) == chunk:
                flush_pend()
        flush_pend()
        # trailing gated-out scans: their motion packets stay queued (the
        # per-scan driver's exact behavior — applied lazily on the next
        # dispatch or _flush_motion with the identical key-split sequence)
        self._odelta_queue.extend(packets)
        return accepted

    @property
    def _last_info(self):
        import numpy as _np
        return {k: float(_np.asarray(v)) for k, v in self._last_info_dev.items()}

    def _queued(self):
        """Queued odeltas padded to a small power-of-two bucket (few
        compiled shapes) + valid mask (padding consumes no key split)."""
        q = self._odelta_queue
        j = len(q)
        bucket = max(4, 1 << (j - 1).bit_length()) if j else 4
        pad = [np.array([0, 0, 1, 0], np.float32)] * (bucket - j)
        valids = np.arange(bucket) < j
        self._odelta_queue = []
        return jnp.asarray(np.stack(q + pad)), jnp.asarray(valids)

    def _flush_motion(self) -> None:
        """Apply queued motion before observable-state reads (keeps pose()
        timing semantics identical to the reference's per-packet draw)."""
        if self._odelta_queue:
            od, valids = self._queued()
            self.pset, self.key = self._jit_motion(self.pset, self.key,
                                                   od, valids)

    def _pf_effective_trigger(self) -> float:
        """Travel distance that dispatches the next re-org (the scroll
        trigger when scrolling is enabled and safe, else the full one)."""
        if 0 < self._pf_scroll_m < self._pf_trigger_m:
            return self._pf_scroll_m
        return self._pf_trigger_m

    def _pf_maybe_reorg(self, odometry: Pose2D) -> None:
        """Host-gated re-org: one standalone dispatch once odometry has
        travelled the wander allowance minus slack. The window centers on
        the mean particle pose as of the last applied motion (queued
        packets lag by <= one gate distance — covered by the slack)."""
        if self._odom_reorg is None:
            return
        d = float(np.linalg.norm((self._odom_reorg - odometry).xy()))
        if d < self._pf_effective_trigger():
            return
        self._pf_harvest_escapes()
        cfg = self.options.mapping_config()
        patch_m = cfg.geometry.patch_length * cfg.geometry.resolution
        if (self._pf_scroll_m > 0
                and d + self.options.host_reorg_slack
                <= self.options.scroll_kp * patch_m):
            self.pset = self._jit_scroll(self.pset)
        else:
            self.pset = self._jit_reorg(self.pset)
        self._odom_reorg = odometry
        self._n_reorgs += 1
        from .slam2d import _ESC_HARVEST, _ESC_INTERVAL_S
        if (self.options.host_reorg and _ESC_HARVEST
                and time.monotonic() - self._esc_last_t >= _ESC_INTERVAL_S):
            # rate-limited: copy_to_host_async is NOT actually async over
            # the axon tunnel — consuming a stash pays a real ~30 ms
            # round trip, which at corridor re-org cadence cost 30-40% of
            # Slam2D throughput (r5 A/B: 494 vs 839 scans/s). One harvest
            # per _ESC_INTERVAL_S bounds the tax at < 1% while keeping the
            # guard's reaction latency at a few seconds.
            self._esc_last_t = time.monotonic()
            esc = self._last_info_dev.get("escaped")
            if esc is not None and hasattr(esc, "copy_to_host_async"):
                esc.copy_to_host_async()
                self._esc_stash = esc

    def _pf_harvest_escapes(self) -> None:
        """Escaped-guard reaction (ADVICE r3): any particle whose update ran
        outside the resident safe zone means the fixed slack under-covered
        odometry drift + particle spread — tighten the trigger; when no safe
        trigger distance remains, rebuild with the device-cond step."""
        if self._esc_stash is None:
            return
        esc = int(np.asarray(self._esc_stash))   # per-update particle count
        self._esc_stash = None
        if esc == 0:
            # recovery: after 4 consecutive clean harvests walk the
            # trigger back toward its initial value (a transient
            # divergence should not permanently multiply re-orgs)
            self._esc_strikes = 0
            self._esc_clean += 1
            if (self._esc_clean >= 4
                    and self._pf_trigger_m < self._pf_trigger0):
                self._esc_clean = 0
                self._pf_trigger_m = min(
                    self._pf_trigger0,
                    self._pf_trigger_m
                    + max(self.options.host_reorg_slack, 0.25))
                if self._pf_scroll_m > 0:
                    self._pf_scroll_m = self._pf_trigger_m
            return
        self._esc_clean = 0
        # r5 calibration: a FEW escaped particles out of the filter are
        # diverged-particle noise (a bad solve throws one particle outside
        # any affordable window; its update clips, its weight collapses,
        # resampling removes it — degraded, never fatal). Tightening the
        # TRAVEL trigger cannot contain spread-caused escapes and only
        # multiplies re-orgs (measured at 512 particles: 1-10 escapes per
        # re-org with a 12.5 m allowance, trigger walked 12.5 -> 5 m).
        # React only when the escape count says the whole CLOUD is
        # outrunning the window — a diverged tail is normal and harmless
        # (an escaped particle's clipped writes degrade only its own map,
        # and resampling kills it; the reference has no window at all, so
        # zero-escape is not reference semantics). Measured tails: 1/30 on
        # the corridor (walked the trigger 12.9 -> 0.5 m and collapsed the
        # filter into the device-cond step, ~24 vs ~90 scans/s), 19-86/512
        # on the office at a 4.4 m allowance (err stayed 1.1 mm). The
        # tolerance is therefore a FRACTION: react above 25% escaped.
        self._esc_seen += 1   # escape events observed
        if esc <= max(1, int(0.25 * self.options.particles)):
            return
        # Burst reaction ladder (r5): a large escape count is usually a
        # TRANSIENT divergence burst (e.g. 86/512 particles at one office
        # corner — resampling cleaned it and the run finished at 1 mm),
        # and a harvest always runs immediately before a re-org dispatch,
        # so the cloud is being recentered RIGHT NOW anyway. Walking the
        # travel trigger down on the first burst turned one transient into
        # a permanent device-cond collapse (1.45 vs 4.4 up/s measured);
        # only three consecutive bursty harvests escalate.
        import warnings
        self._esc_strikes = getattr(self, "_esc_strikes", 0) + 1
        if self._esc_strikes < 3:
            warnings.warn(
                f"PFSlam2D host-gated re-org: {esc} particle-update(s) "
                f"escaped the resident safe zone (strike "
                f"{self._esc_strikes}/3); recentering")
            return
        self._esc_strikes = 0
        self._pf_trigger_m -= max(self.options.host_reorg_slack, 0.25)
        if self._pf_scroll_m > 0:   # scroll deadline tracks the trigger
            self._pf_scroll_m = self._pf_trigger_m
        if self._pf_trigger_m >= 0.5:
            warnings.warn(
                f"PFSlam2D host-gated re-org: {esc} particle-update(s) "
                f"escaped the resident safe zone; tightening trigger to "
                f"{self._pf_trigger_m:.2f} m")
        else:
            warnings.warn(
                "PFSlam2D host-gated re-org: escapes persist with no safe "
                "trigger distance left; rebuilding with the device-cond "
                "step")
            self.options = dataclasses.replace(self.options,
                                               host_reorg=False)
            self._build()

    # -- per-particle spill tier ---------------------------------------------
    def _pf_sync_now(self) -> None:
        """Pair the current best-particle pose with its odometry (one
        pull; flushes queued motion first)."""
        self._sync_pose = self.pose()
        self._sync_odom = self.odom_

    def _pf_approx_pose(self, odometry: Pose2D) -> np.ndarray:
        """Estimated pose without a device pull: best-particle pose at the
        last sync composed with the odometry increment since; drift + the
        particle spread are covered by the refill margin."""
        if self._sync_pose is None:
            self._pf_sync_now()
        est = self._sync_pose + (self._sync_odom - odometry)
        return np.asarray(est.xy())

    def _pf_settle_stores(self) -> None:
        """Settle the deferred lineage on device and re-key the host
        stores with the SAME permutation (one tiny pull)."""
        perm = np.asarray(self.pset.spill_lineage)
        self._pf_spill.permute(perm)
        self.pset = pf_settle(self.pset)

    def _pf_spill_hooks(self, odometry: Pose2D) -> None:
        """Refill stored patches the resident window could touch; spill far
        patches when any particle's pool nears capacity. Steady state costs
        zero device pulls (host-side upper bound, like Slam2D's tier)."""
        sp = self._pf_spill
        if sp.any_stored() and self._sync_odom is not None:
            # bound the estimate drift while stored territory exists: the
            # refill margin must absorb |estimate - true pose|, so resync
            # (one pull) every half-margin of odometry travel
            moved = float(np.linalg.norm(
                (self._sync_odom - odometry).xy()))
            half_margin_m = (0.5 * sp.margin * self.options.patch_size
                             * self.options.resolution)
            if moved > half_margin_m:
                self._pf_sync_now()
        xy = self._pf_approx_pose(odometry)
        if sp.any_stored() and sp.need_refill(xy):
            self._pf_settle_stores()
            self.pset = self.pset._replace(
                maps=sp.refill_batch(self.pset.maps, xy))
        self._potential.update(int(k) for k in sp.window_keys_np(xy))
        upper = len(self._potential) - sp.stored_floor()
        if upper > self._check_at:
            self._pf_sync_now()
            xy = self._pf_approx_pose(odometry)
            counts = np.asarray(pf_patch_counts(self.pset.maps.table))
            n_max = int(counts.max())
            if n_max > sp.high:
                self._pf_settle_stores()
                maps, _ = sp.spill_batch(self.pset.maps, xy)
                self.pset = self.pset._replace(maps=maps)
                n_max = int(np.asarray(
                    pf_patch_counts(self.pset.maps.table)).max())
            self._check_at = (len(self._potential) - sp.stored_floor()
                              + max(sp.high - n_max, 8))

    def full_particle_map(self, idx: Optional[int] = None):
        """One particle's COMPLETE map (device pool + its spilled patches)
        for IO/export — returns (SlamMapState, MappingConfig). Without the
        spill tier this is particle_map with the driver's config."""
        i = self.best_particle_idx() if idx is None else idx
        m = self.particle_map(i)
        if self._pf_spill is None or not self._pf_spill.any_stored():
            return m, self.options.mapping_config()
        si = (int(self.pset.spill_lineage[i])
              if self.pset.spill_lineage is not None else i)
        return self._pf_spill.merged_map_particle(m, si)

    # -- accessors (pf_slam2d.h:188-254) ------------------------------------
    def best_particle_idx(self) -> int:
        return int(jnp.argmax(self.pset.weight_sum))

    def pose(self) -> Pose2D:
        self._flush_motion()
        i = self.best_particle_idx()
        return Pose2D.from_se2_array(np.asarray(self.pset.pose[i]))

    def memory_usage(self) -> int:
        """Allocated patch bytes. In resident mode this counts flushed pool
        patches only (window content not yet flushed is excluded — it is a
        fixed-size buffer, not per-patch storage)."""
        n_p = np.asarray(self.pset.maps.table.num_patches()).sum()
        length = self.options.patch_size
        total = int(n_p) * length * length * (2 + 2 + 1 + 4)
        if self._pf_spill is not None:
            total += self._pf_spill.memory_usage()
        return total

    def particle_map(self, idx: Optional[int] = None) -> mapping.SlamMapState:
        """One particle's fused map (best particle by default) —
        getOccupancyMap/getDistanceMap (pf_slam2d.h:211-225). In resident
        mode the particle's window is flushed into a pool copy first."""
        i = self.best_particle_idx() if idx is None else idx
        pool_i = i
        if self.pset.lineage is not None:
            pool_i = int(self.pset.lineage[i])   # deferred pool lineage
        m = jax.tree.map(lambda a: a[pool_i], self.pset.maps)
        if self.pset.res_org is not None:
            if self._jit_flush_one is None:
                cfg = self.options.mapping_config()
                self._jit_flush_one = jax.jit(
                    lambda st, org, o, v, d: mapping.resident_flush(
                        st, cfg, org, o, v, d))
            m = self._jit_flush_one(m, self.pset.res_org,
                                    self.pset.res_occ[i],
                                    self.pset.res_vis[i],
                                    self.pset.res_dist[i])
        return m

    def save_occ_image(self, path: str) -> None:
        """saveOccImage (pf_slam2d.cpp:341-346)."""
        from ..sdm import export as export_mod
        cfg = self.options.mapping_config()
        m = self.particle_map()
        img = export_mod.occupancy_to_image(m, cfg.geometry)
        export_mod.export_to_png(img, path)

"""Pure localization against fixed prebuilt maps (the reference's Loc2D).

reference: include/lama/loc2d.h, src/loc2d.cpp. Per scan: odometry
prediction -> motion gate -> scan-match solve WITH covariance
(loc2d.cpp:168-173) -> RMSE; optional Olson sampled-covariance blending
(:199-247) and global localization — up to ``gloc_particles`` random
free-cell pose hypotheses scored by residual SSE, best kept, repeated until
RMSE < gloc_thresh (:249-286, options loc2d.h:87-98).

TPU angle: global localization is embarrassingly parallel hypothesis scoring
— 3000 candidate poses x all beams evaluate as ONE vmapped gather kernel
(the reference loops hypotheses sequentially on one core).
"""

from __future__ import annotations

import dataclasses
import functools as _functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.pose import Pose2D
from ..match import match_surface_2d as match
from ..nlls import solver as nlls_solver
from ..nlls.robust import CAUCHY_SCAN
from ..ops import gn_solve
from ..nlls.solver import SolverOptions
from ..sdm import distance as dist_mod
from ..sdm import mapping, occupancy as occ_mod, pool as pool_mod
from ..sdm.geometry import MapGeometry
from ..utils.cloud import PointCloudXYZ, pad_scan, beam_bucket


@dataclasses.dataclass(frozen=True)
class Loc2DOptions:
    """reference: Loc2D::Options (loc2d.h:61-99)."""

    trans_thresh: float = 0.5
    rot_thresh: float = 0.5
    l2_max: float = 1.0
    resolution: float = 0.05
    patch_size: int = 32
    gloc_particles: int = 3000
    gloc_iters: int = 10
    gloc_thresh: float = 0.15
    max_iter: int = 100
    cov_blend: float = 0.0
    strategy: str = "gn"
    # --- TPU sizing ---
    max_range: float = 10.0
    max_beams: int = 0

    def solver_options(self) -> SolverOptions:
        return SolverOptions(max_iterations=self.max_iter,
                             strategy=self.strategy, robust=CAUCHY_SCAN)


class LocMaps(NamedTuple):
    """The fixed map inputs (loc2d.h:103-104)."""

    occupancy: occ_mod.SimpleOccupancyState
    distance: dist_mod.DistanceMapState


def maps_from_slam(slam_map: mapping.SlamMapState,
                   cfg: mapping.MappingConfig) -> LocMaps:
    """Convert a built SLAM map into Loc2D inputs (the role Map::write/read
    plays between Slam2D and Loc2D in the reference, SURVEY §3.5)."""
    occ = slam_map.occupied.astype(jnp.int32)
    vis = slam_map.visited.astype(jnp.int32)
    occupied = 4 * occ > vis
    free = jnp.logical_and(vis > 0, 4 * occ < vis)
    cells = jnp.where(occupied, jnp.int8(1),
                      jnp.where(free, jnp.int8(-1), jnp.int8(0)))
    simple = occ_mod.SimpleOccupancyState(slam_map.table, cells)
    dm = dist_mod.DistanceMapState(slam_map.table, slam_map.obstacle,
                                   slam_map.dist)
    return LocMaps(simple, dm)


def map_bounds(table: pool_mod.PatchTable, geo: MapGeometry):
    """World-coordinate bounds of allocated patches (Map::bounds,
    src/sdm/map.cpp:139-160)."""
    keys, mask = pool_mod.active_keys(table)
    anchors = geo.p2anchor(keys)
    big = jnp.int32(1 << 30)
    lo = jnp.min(jnp.where(mask[:, None], anchors, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], anchors + geo.patch_length, -big),
                 axis=0)
    return geo.m2w(lo), geo.m2w(hi)


def _sse_for_poses(maps: LocMaps, geo, max_dist, points_xy, mask, poses):
    """Residual SSE for a batch of pose hypotheses [K, 4] -> [K]."""
    def one(p):
        hits = lie.se2_apply(p, points_xy)
        d, _ = dist_mod.interp_pool(maps.distance.table, maps.distance.dist,
                                    geo, hits, max_dist)
        d = d * mask.astype(jnp.float32)
        return jnp.sum(d * d)

    return jax.vmap(one)(poses)


def global_localization_kernel(maps: LocMaps, geo: MapGeometry,
                               max_dist, points_xy, mask, key,
                               n_particles: int):
    """One gloc round (loc2d.cpp:249-286): uniform free-space hypotheses,
    keep the arg-min SSE pose."""
    lo, hi = map_bounds(maps.occupancy.table, geo)
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (n_particles, 2)) * (hi - lo) + lo
    th = jax.random.uniform(k2, (n_particles,)) * (2 * jnp.pi) - jnp.pi
    cells = geo.w2m(xy)
    free = occ_mod.simple_is_free(maps.occupancy, geo, cells)
    poses = lie.se2(xy[:, 0], xy[:, 1], th)
    sse = _sse_for_poses(maps, geo, max_dist, points_xy, mask, poses)
    sse = jnp.where(free, sse, jnp.inf)
    best = jnp.argmin(sse)
    return poses[best], sse[best]


def sampling_covariance_kernel(maps: LocMaps, geo, max_dist, points_xy,
                               mask, pose, resolution: float,
                               n_points_step: int):
    """Olson sampled covariance (loc2d.cpp:199-247).

    161 xy offsets (center + 20 rings of 8 neighbors at multiples of the
    resolution, loc2d.cpp:91-107), likelihood l = sum exp(-d^2/0.01)^3 over
    subsampled beams using the *uninterpolated* cell distance (loc2d.cpp:230).
    """
    steps = [(0.0, 0.0)]
    for i in range(1, 21):
        s = i * resolution
        steps += [(s, 0), (0, s), (-s, 0), (0, -s),
                  (s, s), (-s, s), (s, -s), (-s, -s)]
    offsets = jnp.asarray(np.array(steps, np.float32))        # [S, 2]

    pts = points_xy[::n_points_step]
    pmask = mask[::n_points_step].astype(jnp.float32)

    def lik(offset):
        p = pose.at[0:2].add(offset)
        hits = lie.se2_apply(p, pts)
        cells = geo.w2m(hits)
        d = dist_mod.cell_distance(maps.distance.table, maps.distance.dist,
                                   geo, cells, max_dist)
        e = jnp.exp(-(d * d) / 0.01) * pmask
        return jnp.sum(e * e * e)

    ls = jax.vmap(lik)(offsets)                               # [S]
    trans = pose[0:2][None, :] + offsets                      # [S, 2]
    s = jnp.sum(ls)
    u = jnp.sum(trans * ls[:, None], axis=0)
    K = jnp.einsum("si,sj,s->ij", trans, trans, ls)
    return K / s - jnp.outer(u, u) / (s * s)


class Loc2D:
    """Host driver; mirrors the reference public API (loc2d.h:101-160)."""

    def __init__(self, options: Loc2DOptions = Loc2DOptions(),
                 maps: Optional[LocMaps] = None, seed: int = 0):
        if maps is not None:
            # the maps are the authority on patch storage (the reference
            # reads patch_length from the .smd header, sdm/map.h:95-103);
            # a mismatched option produced a deep shape error inside the
            # fused step (found by the r3 verify probe: map built at
            # patch 16, Loc2D default 32)
            length = int(maps.distance.dist.shape[-1])
            if options.patch_size != length:
                options = dataclasses.replace(options, patch_size=length)
        self.options = options
        log2dim = int(np.log2(options.patch_size))
        self.geo = MapGeometry(options.resolution, log2dim, False)
        self.dcfg = dist_mod.DistanceConfig(self.geo, options.l2_max)
        self.maps = maps
        self.odom_ = Pose2D()
        self.has_first_scan = False
        # pose/cov/rmse live on device; host copies are pulled lazily
        # (remote-TPU device->host transfers cost ~30 ms each)
        self._pose_dev = jnp.asarray(Pose2D().se2_array())
        self._pose_host: "Pose2D | None" = Pose2D()
        self._cov_dev = jnp.eye(3)
        self._cov_host = np.eye(3)
        self._rmse_dev = jnp.float32(0.0)
        self._rmse_host = 0.0
        self._traj = jnp.zeros((16384, 4), jnp.float32)
        self._n_updates = 0
        self.do_global_localization = False
        self.gloc_cur_iter = 0
        self.key = jax.random.PRNGKey(seed if seed else 42)
        self._max_beams = options.max_beams
        self._gloc = None
        self._gather = None
        self._win_dev = None            # resident fixed-map window
        self._org_dev = None
        self._samp_cov = None
        self._rmse = None
        self._step = None
        self._chunk = None

    def set_maps(self, maps: LocMaps) -> None:
        self.maps = maps

    def set_prior(self, prior: Pose2D) -> None:
        self._pose_dev = jnp.asarray(prior.se2_array())
        self._pose_host = prior

    def trigger_global_localization(self) -> None:
        self.do_global_localization = True

    def pose(self) -> Pose2D:
        if self._pose_host is None:
            self._pose_host = Pose2D.from_se2_array(
                np.asarray(self._pose_dev))
        return self._pose_host

    def covariance(self) -> np.ndarray:
        if self._cov_host is None:
            self._cov_host = np.asarray(self._cov_dev, np.float64)
        return self._cov_host

    def rmse(self) -> float:
        if self._rmse_host is None:
            self._rmse_host = float(self._rmse_dev)
        return self._rmse_host

    def trajectory(self) -> np.ndarray:
        """All matched poses so far, [n, 3] xyr — one device pull."""
        n = min(self._n_updates, self._traj.shape[0])
        t = np.asarray(self._traj[:n])
        return np.stack([t[:, 0], t[:, 1],
                         np.arctan2(t[:, 3], t[:, 2])], -1)

    def _build(self):
        (self._gather, self._step, self._chunk, self._rmse, win_shape,
         win_dtype) = _make_loc_programs(self.options)
        # sentinel origin far from any pose -> the first step re-gathers
        self._org_dev = jnp.full((2,), 1 << 28, jnp.int32)
        self._win_dev = jnp.zeros(win_shape, win_dtype)



    def update(self, cloud: PointCloudXYZ, odometry: Pose2D,
               timestamp: float = 0.0, force_update: bool = False) -> bool:
        """loc2d.cpp:126-192."""
        assert self.maps is not None, "Loc2D needs maps (loc2d.h:103-104)"
        opts = self.options
        if self._max_beams == 0:
            self._max_beams = beam_bucket(len(cloud.points))
        if self._step is None:
            self._build()

        points, mask, _ = pad_scan(cloud, self._max_beams)
        pts = jnp.asarray(points[:, :2])
        msk = jnp.asarray(mask)

        if not self.has_first_scan:
            self.odom_ = odometry
            self.has_first_scan = True
            if not force_update:
                return True
            self._rmse_dev = self._rmse(self.maps, self._pose_dev, pts, msk)
            self._rmse_host = None

        odelta = self.odom_ - odometry
        if not force_update and not self._enough_motion(odelta):
            return False
        self.odom_ = odometry

        use_gloc = False
        if self.do_global_localization:
            if self.gloc_cur_iter < opts.gloc_iters:
                self.gloc_cur_iter += 1
                use_gloc = True
            else:
                self.do_global_localization = False
                self.gloc_cur_iter = 0
        sub = self.key
        if use_gloc:
            self.key, sub = jax.random.split(self.key)

        # one dispatch: compose prediction (loc2d.cpp:149-151), optional
        # gloc hypothesis sweep, resident-window re-gather when the pose
        # strays, solve+cov+rmse, trajectory-ring append
        state, cov, rmse, self._traj, self._win_dev, self._org_dev = \
            self._step(self.maps, self._pose_dev, self._traj,
                       np.int32(self._n_updates),
                       jnp.asarray(odelta.se2_array()), pts, msk, sub,
                       use_gloc, self._win_dev, self._org_dev)
        self._pose_dev = state
        self._cov_dev = cov
        self._rmse_dev = rmse
        self._pose_host = None
        self._cov_host = None
        self._rmse_host = None
        self._n_updates += 1

        if opts.cov_blend > 0.0:
            n_step = max(int(np.sum(mask)) // 100, 1)
            samp = sampling_covariance_kernel(
                self.maps, self.geo, self.dcfg.max_dist, pts, msk,
                self._pose_dev, opts.resolution, n_step)
            a = min(max(opts.cov_blend, 0.0), 1.0)
            cov_h = np.asarray(self._cov_dev, np.float64)
            cov_h[:2, :2] = (a * np.asarray(samp) + (1 - a) * cov_h[:2, :2])
            self._cov_host = cov_h

        # gloc convergence needs the rmse on host (rare path; one pull)
        if self.do_global_localization and self.rmse() < opts.gloc_thresh:
            self.do_global_localization = False
            self.gloc_cur_iter = 0
        return True

    def _enough_motion(self, odelta: Pose2D) -> bool:
        return not (np.linalg.norm(odelta.xy()) <= self.options.trans_thresh
                    and abs(odelta.rotation()) <= self.options.rot_thresh)

    def update_many_prepadded(self, staged, odoms, chunk: int = 32) -> list:
        """Replay a pre-staged offline log with one device dispatch per
        ``chunk`` accepted scans (see Slam2D.update_many_prepadded — same
        contract; ``staged`` holds (points_xy f32[B, 2], mask bool[B])
        device arrays). Global localization and covariance blending use
        data-dependent host control flow and are served by the per-scan
        path; this method asserts they are off. Returns accepted indices.
        """
        assert self.maps is not None
        assert not self.do_global_localization and \
            self.options.cov_blend == 0.0
        if self._step is None:
            self._max_beams = staged[0][0].shape[0]
            self._build()
        start = 0
        accepted = []
        if not self.has_first_scan:
            self.odom_ = odoms[0]
            self.has_first_scan = True
            start = 1

        pend = []

        def flush_chunk():
            nonlocal pend
            n_real = len(pend)
            if n_real == 0:
                return
            while len(pend) < chunk:
                pend.append(pend[-1])
            od = jnp.asarray(np.stack([p[0] for p in pend]))
            pts = jnp.stack([p[1] for p in pend])
            msk = jnp.stack([p[2] for p in pend])
            dos = jnp.asarray(np.arange(chunk) < n_real)
            (self._pose_dev, self._cov_dev, self._rmse_dev, self._traj,
             self._win_dev, self._org_dev) = self._chunk(
                self.maps, self._pose_dev, self._cov_dev, self._rmse_dev,
                self._traj, jnp.int32(self._n_updates), self._win_dev,
                self._org_dev, od, pts, msk, dos)
            self._pose_host = self._cov_host = self._rmse_host = None
            self._n_updates += n_real
            pend = []

        for k in range(start, len(staged)):
            odelta = self.odom_ - odoms[k]
            if not self._enough_motion(odelta):
                continue
            self.odom_ = odoms[k]
            pend.append((odelta.se2_array().astype(np.float32),)
                        + tuple(staged[k]))
            accepted.append(k)
            if len(pend) == chunk:
                flush_chunk()
        flush_chunk()
        return accepted


@_functools.lru_cache(maxsize=None)
def _make_loc_programs(opts: Loc2DOptions):
    """Jitted Loc2D device programs, shared across driver instances and
    taking the (fixed) maps as ARGUMENTS: closing over the map arrays
    would bake them into the HLO as constants — a distinct multi-MB
    program per Loc2D instance to remote-compile and load (CLAUDE.md:
    baked constants have hit HTTP 413 on the remote compiler), retraced
    for every instance. Returns (gather, step, chunk, rmse, window shape,
    window dtype)."""
    import math as _math
    import os as _os

    log2dim = int(np.log2(opts.patch_size))
    geo = MapGeometry(opts.resolution, log2dim, False)
    dcfg = dist_mod.DistanceConfig(geo, opts.l2_max)
    max_dist = dcfg.max_dist
    sopts = opts.solver_options()
    # window sizing: scan reach + solver travel slack (same margin logic
    # as MappingConfig.window_patches)
    half_cells = int(_math.ceil((opts.max_range + 2.0) * geo.scale
                                + dcfg.radius_cells))
    wp = 2 * (int(_math.ceil(half_cells / geo.patch_length)) + 1)
    ws = wp * geo.patch_length            # match window side (cells)
    # resident window: the maps are FIXED, so the dense window needs no
    # flush — re-gather from the pool only when the pose wanders out
    # (same trick as Slam2D's resident path, minus the writeback).
    # Measured a TIE on bench_loc (107/125/133 resident vs 123/120/126
    # re-gather — the f32 row gather was never the cost at this map
    # size); kept because it is free and the gather share grows with
    # map/window size. Wander rings sized like the slam default.
    extra = int(_os.environ.get("IRIS_LOC_RESIDENT_EXTRA", "4"))
    wp_res = wp + 2 * extra
    w_res = wp_res * geo.patch_length
    use_sq = (_os.environ.get("IRIS_LOC_SQ") == "1"
              or (gn_solve.ENABLED
                  and jax.default_backend() == "tpu"))

    def gather_resident(maps, anchor_cell):
        from ..sdm import window as win_mod
        org = win_mod.window_org(geo, anchor_cell, wp_res)
        keys = win_mod.window_patch_keys(geo, org, wp_res)
        grid, _ = win_mod.gather_window(maps.distance.table,
                                        maps.distance.dist, keys,
                                        max_dist)
        # f32 meters window by default: at batch=1 the f32 interp path
        # measured ~2x the s8 squared domain (bench_loc interleaved:
        # f32 187/214 vs s8+select4 102/89 vs s8+jnp 67/121 up/s).
        # IRIS_LOC_SQ=1 / the whole-solve kernel force s8.
        return (dcfg.dist_to_sq(grid) if use_sq else grid), org

    def solve_and_cov(pose0, pts, msk, win, org):
        # slice the pose-centered match window out of the resident grid
        # (containment: slice half = ws/2 >= half_cells, and the safe
        # check keeps the clip from cutting into the probe reach)
        lp = geo.w2m(pose0[:2]) - org
        start = jnp.clip(lp - ws // 2, 0, w_res - ws)
        sub = jax.lax.dynamic_slice(win, (start[1], start[0]), (ws, ws))
        sub_org = org + start
        eval_fn = match.make_window_eval(sub, sub_org, geo, max_dist,
                                         pts, msk)
        # routes to the whole-solve kernel / fused loop when enabled;
        # the generic branch is make_window_eval + nlls_solver.solve
        res = match.solve_window(sub, sub_org, geo, max_dist, pts, msk,
                                 pose0, sopts)
        # one post-solve evaluation shared by covariance and RMSE
        # (was two identical evals — the field gathers dominate)
        r, J = eval_fn(res.state)
        cov = nlls_solver.covariance_from_eval(r, J, sopts.robust)
        n = jnp.maximum(jnp.sum(msk) - 1, 1).astype(jnp.float32)
        rmse = jnp.sqrt(jnp.sum(r * r) / n)
        return res.state, cov, rmse

    # one fused per-update program (remote dispatch is the Loc2D cost:
    # un-jitted compose/ring ops each pay a tunnel round trip)
    def step(maps, pose_dev, traj, n, odelta_arr, pts, msk, key, use_gloc,
             win, org):
        pose0 = lie.se2_compose(pose_dev, odelta_arr)
        if use_gloc:
            pose0, _ = global_localization_kernel(
                maps, geo, max_dist, pts, msk, key, opts.gloc_particles)
        # re-gather the resident window when the (possibly relocalized)
        # pose strays: the slice must stay unclipped beyond the probe
        # reach, i.e. lp within [ws/2, w_res - ws/2) after clamping slop
        lp = geo.w2m(pose0[:2]) - org
        m = half_cells
        safe = jnp.all((lp >= m) & (lp < w_res - m))
        if _os.environ.get("IRIS_LOC_RESIDENT") == "0":
            safe = jnp.bool_(False)   # A/B: re-gather every update
        win, org = jax.lax.cond(
            safe, lambda a: (win, org),
            lambda a: gather_resident(maps, geo.w2m(pose0[:2])), None)
        state, cov, rmse = solve_and_cov(pose0, pts, msk, win, org)
        traj = traj.at[jnp.minimum(n, traj.shape[0] - 1)].set(state)
        return state, cov, rmse, traj, win, org

    def chunk_step(maps, pose, cov, rmse, traj, k0, win, org, odeltas,
                   ptss, msks, dos):
        """C gated localization updates in one device program
        (lax.scan). Loc2D is dispatch-bound on a remote tunnel — the
        solve converges in 2-3 IRLS iterations (prof_loc_iters), so
        the ~1-3 ms per-dispatch latency dominates the ~2 ms device
        work; chunking amortizes it. ``dos`` masks padded entries."""
        def body(carry, inp):
            odelta, pts, msk, do = inp

            def run(args):
                pose, win, org, _cov, _rmse = args
                pose0 = lie.se2_compose(pose, odelta)
                lp = geo.w2m(pose0[:2]) - org
                m = half_cells
                safe = jnp.all((lp >= m) & (lp < w_res - m))
                win2, org2 = jax.lax.cond(
                    safe, lambda a: (win, org),
                    lambda a: gather_resident(maps, geo.w2m(pose0[:2])),
                    None)
                state, cov, rmse = solve_and_cov(pose0, pts, msk, win2,
                                                 org2)
                return (state, win2, org2, cov, rmse)

            carry = jax.lax.cond(do, run, lambda a: a, carry)
            return carry, carry[0]

        carry0 = (pose, win, org, cov, rmse)
        # IRIS_LOC_UNROLL=k unrolls the scan body (k=chunk -> straight
        # line) for the VERDICT-r3 unroll A/B; measured numbers live in
        # docs/STATUS.md (r4).
        (pose, win, org, cov, rmse), poses = jax.lax.scan(
            body, carry0, (odeltas, ptss, msks, dos),
            unroll=int(_os.environ.get("IRIS_LOC_UNROLL", "1")))
        k0 = jnp.minimum(k0, traj.shape[0] - poses.shape[0])
        traj = jax.lax.dynamic_update_slice(traj, poses,
                                            (k0, jnp.int32(0)))
        return pose, cov, rmse, traj, win, org

    def rmse_only(maps, pose0, pts, msk):
        eval_fn = match.make_pool_eval(maps.distance.table,
                                       maps.distance.dist, geo, max_dist,
                                       pts, msk)
        r, _ = eval_fn(pose0)
        n = jnp.maximum(jnp.sum(msk) - 1, 1).astype(jnp.float32)
        return jnp.sqrt(jnp.sum(r * r) / n)

    return (jax.jit(gather_resident),
            jax.jit(step, static_argnums=(8,), donate_argnums=(2, 9)),
            jax.jit(chunk_step, donate_argnums=(4, 6)),
            jax.jit(rmse_only),
            (w_res, w_res),
            dcfg.sq_dtype if use_sq else jnp.float32)

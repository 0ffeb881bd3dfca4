"""Odometry-free lidar odometry (the reference's LidarOdometry2D).

reference: include/lama/lidar_odometry_2d.h, src/lidar_odometry_2d.cpp —
scan-to-local-map tracking with a ProbabilisticOccupancyMap + 1 m-max
distance field, rays truncated to the last meter before the hit
(lidar_odometry_2d.cpp:104-113), maps always transient (1x AABB expansion,
:131-182), map refresh every 0.1 m / 0.5 rad of estimated motion (:73-80).

TPU architecture (r3): the whole per-scan pass — scan match + the
data-dependent map-refresh gate + the gated map update — is ONE jitted
program (`lax.cond` on the device-computed motion delta). The pose stays on
device in a trajectory ring like Slam2D's; the reference's per-scan
``getPose()`` read maps to :meth:`pose` (one pull, on demand). The r2
driver paid one device->host pose pull per scan (~30 ms on the tunnel) plus
two dispatches; this pays one dispatch and zero pulls.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pose import Pose2D
from ..match import match_surface_2d as match
from ..nlls.robust import CAUCHY_SCAN
from ..nlls.solver import SolverOptions
from ..sdm import mapping, window as win_mod
from ..sdm.geometry import MapGeometry
from ..utils.cloud import PointCloudXYZ, pad_scan, beam_bucket


@dataclasses.dataclass(frozen=True)
class LidarOdometry2DOptions:
    """reference: LidarOdometry2D::Options (lidar_odometry_2d.h:63-68)."""

    resolution: float = 0.05
    max_iter: int = 100
    # --- TPU sizing ---
    max_range: float = 10.0
    max_beams: int = 0
    capacity: int = 2048
    patch_size: int = 32
    # Opt-in constant-velocity prediction (r5, VERDICT r4 #9): seed each
    # scan match at pose_prev * prev_delta instead of pose_prev. The
    # reference tracker has NO motion prediction (lidar_odometry_2d.cpp:
    # 59-81) and is marginally stable at corners — per-rep drifts
    # [4.6, 28.4, 4.6, 4.6, 4.6] m/100 m under 0.1 mm perturbations
    # (prof_r4_lidar2). Prediction only changes the solver's starting
    # basin, not the cost optimum; default OFF for reference parity.
    motion_prediction: bool = False

    def mapping_config(self) -> mapping.MappingConfig:
        log2dim = int(np.log2(self.patch_size))
        return mapping.MappingConfig(
            geometry=MapGeometry(self.resolution, log2dim, False),
            l2_max=1.0,                 # setMaxDistance(1.0) (.cpp:45)
            truncated_ray=1.0,          # start = hit - AB/len (.cpp:110-112)
            max_range=self.max_range,
            capacity=self.capacity,
            occ_model="probabilistic",  # (.cpp:46)
            transient=True,
            transient_expand=1.0,       # (.cpp:141-150: no x2)
        )


@functools.lru_cache(maxsize=None)
def _make_step(cfg: mapping.MappingConfig, sopts: SolverOptions,
               motion_prediction: bool = False):
    """Fused per-scan program, lru-cached across driver instances (fresh
    jit wrappers re-load byte-identical executables — seconds each on the
    remote-TPU runtime)."""
    geo = cfg.geometry
    wp = cfg.window_patches
    max_dist = cfg.distance.max_dist

    def step(state, pose_prev, map_odom, points, mask, origin, traj, k,
             prev_delta):
        # 1. scan match against the local map (lidar_odometry_2d.cpp:63-71)
        import iris_lama_tpu.core.lie as _lie
        if motion_prediction:
            # clamp the constant-velocity extrapolation: one diverged
            # step otherwise throws the next seed outside the local map
            # (empty window -> singular normal equations -> NaN pose;
            # measured as NaN drifts on 3/5 bench reps before the clamp)
            t_norm = jnp.sqrt(prev_delta[0] ** 2 + prev_delta[1] ** 2)
            t_scale = jnp.minimum(1.0, 0.3 / jnp.maximum(t_norm, 1e-9))
            ang = jnp.arctan2(prev_delta[3], prev_delta[2])
            ang = jnp.clip(ang, -0.3, 0.3)
            pd = jnp.stack([prev_delta[0] * t_scale,
                            prev_delta[1] * t_scale,
                            jnp.cos(ang), jnp.sin(ang)])
            seed = _lie.se2_compose(pose_prev, pd)
        else:
            seed = pose_prev
        org = win_mod.window_org(geo, geo.w2m(seed[:2]), wp)
        keys = win_mod.window_patch_keys(geo, org, wp)
        grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                        max_dist)
        res = match.solve_window(grid, org, geo, max_dist, points[:, :2],
                                 mask, seed, sopts)
        pose = res.state
        new_delta = (_lie.se2_compose(_lie.se2_inverse(pose_prev), pose)
                     if motion_prediction else prev_delta)

        # 2. map refresh gate on the ESTIMATED motion since the last map
        #    update (.cpp:73-80) — data-dependent, so a device-side cond
        import iris_lama_tpu.core.lie as lie
        delta = lie.se2_compose(lie.se2_inverse(map_odom), pose)
        dist_moved = jnp.sqrt(delta[0] ** 2 + delta[1] ** 2)
        rot_moved = jnp.abs(jnp.arctan2(delta[3], delta[2]))
        refresh = (dist_moved > 0.1) | (rot_moved > 0.5)

        def do_update(op):
            state, _ = op
            new_state, _ = mapping.update_maps(state, cfg, pose, points,
                                               mask, origin)
            return new_state, pose

        state, map_odom = jax.lax.cond(refresh, do_update,
                                       lambda op: op, (state, map_odom))
        traj = traj.at[jnp.minimum(k, traj.shape[0] - 1)].set(pose)
        return state, pose, map_odom, traj, new_delta, {
            "iterations": res.iterations, "refresh": refresh}

    def first_step(state, pose0, points, mask, origin):
        new_state, _ = mapping.update_maps(state, cfg, pose0, points, mask,
                                           origin)
        return new_state

    return (jax.jit(step, donate_argnums=(0, 6)),
            jax.jit(first_step, donate_argnums=(0,)))


class LidarOdometry2D:
    """Host driver; mirrors the reference API (lidar_odometry_2d.h:50-76)."""

    TRAJ_CAP = 16384

    def __init__(self, options: LidarOdometry2DOptions = LidarOdometry2DOptions()):
        self.options = options
        self.cfg = options.mapping_config()
        self.sopts = SolverOptions(max_iterations=options.max_iter,
                                   strategy="gn", robust=CAUCHY_SCAN)
        self.map = mapping.slam_map_init(self.cfg)
        self.has_first_scan = False
        self._max_beams = options.max_beams
        self._step = None
        self._pose_dev = jnp.asarray(Pose2D().se2_array())
        self._map_odom_dev = jnp.asarray(Pose2D().se2_array())
        self._pose_host = Pose2D()
        self._traj = jnp.zeros((self.TRAJ_CAP, 4), jnp.float32)
        self._delta_dev = jnp.asarray(Pose2D().se2_array())
        self._n_updates = 0
        self._last_info_dev = {}

    def pose(self) -> Pose2D:
        """Current estimate (syncs device->host when stale)."""
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

    def _build(self):
        self._step, self._first = _make_step(
            self.cfg, self.sopts, self.options.motion_prediction)

    def update(self, cloud: PointCloudXYZ, timestamp: float = 0.0) -> bool:
        """lidar_odometry_2d.cpp:59-81."""
        if self._max_beams == 0:
            self._max_beams = beam_bucket(len(cloud.points))
        points, mask, origin = pad_scan(cloud, self._max_beams)
        return self.update_prepadded(jnp.asarray(points), jnp.asarray(mask),
                                     jnp.asarray(origin), timestamp)

    def update_prepadded(self, points, mask, origin,
                         timestamp: float = 0.0) -> bool:
        """One fused dispatch per scan; pose stays on device."""
        if self._max_beams == 0:
            self._max_beams = points.shape[0]
        if self._step is None:
            self._build()
        if not self.has_first_scan:
            self.map = self._first(self.map, self._pose_dev, points, mask,
                                   origin)
            self._traj = self._traj.at[0].set(self._pose_dev)
            self._n_updates = 1
            self.has_first_scan = True
            return True
        (self.map, self._pose_dev, self._map_odom_dev, self._traj,
         self._delta_dev, info) = self._step(
            self.map, self._pose_dev, self._map_odom_dev, points, mask,
            origin, self._traj, jnp.int32(self._n_updates),
            self._delta_dev)
        self._pose_host = None
        self._last_info_dev = info
        self._n_updates += 1
        return True

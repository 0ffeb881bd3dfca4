"""Odometry-free lidar odometry (the reference's LidarOdometry2D).

reference: include/lama/lidar_odometry_2d.h, src/lidar_odometry_2d.cpp —
scan-to-local-map tracking with a ProbabilisticOccupancyMap + 1 m-max
distance field, rays truncated to the last meter before the hit
(lidar_odometry_2d.cpp:104-113), maps always transient (1x AABB expansion,
:131-182), map refresh every 0.1 m / 0.5 rad of estimated motion (:73-80).
"""

from __future__ import annotations

import dataclasses

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


class LidarOdometry2D:
    """Host driver; mirrors the reference API (lidar_odometry_2d.h:50-76)."""

    def __init__(self, options: LidarOdometry2DOptions = LidarOdometry2DOptions()):
        self.options = options
        self.cfg = options.mapping_config()
        self.sopts = SolverOptions(max_iterations=options.max_iter,
                                   strategy="gn", robust=CAUCHY_SCAN)
        self.map = mapping.slam_map_init(self.cfg)
        self.odom = Pose2D()
        self.map_update_odom = Pose2D()
        self.has_first_scan = False
        self._max_beams = options.max_beams
        self._solve = None
        self._update = None

    def pose(self) -> Pose2D:
        return self.odom

    def _build(self):
        cfg, sopts = self.cfg, self.sopts
        geo = cfg.geometry
        wp = cfg.window_patches
        max_dist = cfg.distance.max_dist

        def solve(state, pose0, pts, msk):
            org = win_mod.window_org(geo, geo.w2m(pose0[:2]), wp)
            keys = win_mod.window_patch_keys(geo, org, wp)
            grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                            max_dist)
            res = match.solve_window(grid, org, geo, max_dist, pts[:, :2],
                                     msk, pose0, sopts)
            return res.state

        def update(state, pose, pts, msk, org3):
            new_state, info = mapping.update_maps(state, cfg, pose, pts,
                                                  msk, org3)
            return new_state

        self._solve = jax.jit(solve)
        self._update = jax.jit(update, donate_argnums=(0,))

    def update(self, cloud: PointCloudXYZ, timestamp: float = 0.0) -> bool:
        """lidar_odometry_2d.cpp:59-81."""
        if self._max_beams == 0:
            self._max_beams = beam_bucket(len(cloud.points))
        if self._solve is None:
            self._build()

        points, mask, origin = pad_scan(cloud, self._max_beams)
        points = jnp.asarray(points)
        mask = jnp.asarray(mask)
        origin = jnp.asarray(origin)

        if not self.has_first_scan:
            self.map = self._update(self.map, jnp.asarray(
                self.odom.se2_array()), points, mask, origin)
            self.has_first_scan = True
            return True

        state = self._solve(self.map, jnp.asarray(self.odom.se2_array()),
                            points, mask)
        self.odom = Pose2D.from_se2_array(np.asarray(state))

        odelta = self.map_update_odom - self.odom
        if (np.linalg.norm(odelta.xy()) > 0.1 or
                abs(odelta.rotation()) > 0.5):
            self.map = self._update(self.map, jnp.asarray(
                self.odom.se2_array()), points, mask, origin)
            self.map_update_odom = self.odom
        return True

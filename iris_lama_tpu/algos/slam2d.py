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
    # --- TPU sizing (static shapes) ---
    max_range: float = 10.0     # beams beyond this are dropped on host
    max_beams: int = 0          # 0 = bucket from first scan
    capacity: int = 4096        # patch-pool capacity
    pose_slack: float = 2.0

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
        )

    def solver_options(self) -> SolverOptions:
        # Cauchy(0.15) hardwired like the reference (slam2d.cpp:106)
        return SolverOptions(max_iterations=self.max_iter,
                             strategy=self.strategy, robust=CAUCHY_SCAN)


def _make_step(cfg: mapping.MappingConfig, sopts: SolverOptions):
    geo = cfg.geometry
    max_dist = cfg.distance.max_dist
    wp = cfg.window_patches

    def step(state, pose0, points, mask, origin):
        org = win_mod.window_org(geo, geo.w2m(pose0[:2]), wp)
        keys = win_mod.window_patch_keys(geo, org, wp)
        grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                        max_dist)
        res = match.solve_window(grid, org, geo, max_dist,
                                 points[:, :2], mask, pose0, sopts)
        new_state, info = mapping.update_maps(state, cfg, res.state, points,
                                              mask, origin, org)
        info["iterations"] = res.iterations
        info["chi2"] = res.chi2
        return new_state, res.state, info

    def first_step(state, pose0, points, mask, origin):
        return mapping.update_maps(state, cfg, pose0, points, mask, origin)

    return jax.jit(step, donate_argnums=(0,)), jax.jit(first_step,
                                                       donate_argnums=(0,))


class Slam2D:
    """Host driver; mirrors the reference public API (slam2d.h:127-176)."""

    def __init__(self, options: Slam2DOptions = Slam2DOptions()):
        self.options = options
        self.cfg = options.mapping_config()
        self.sopts = options.solver_options()
        self.map = mapping.slam_map_init(self.cfg)
        self.pose_ = Pose2D()
        self.odom_ = Pose2D()
        self.has_first_scan = False
        self.summary: Optional[Summary] = (
            Summary() if options.create_summary else None)
        self._max_beams = options.max_beams
        self._step = None
        self._last_info = {}
        self._first = None

    # -- reference API ------------------------------------------------------
    def set_prior(self, prior: Pose2D) -> None:
        self.pose_ = prior

    def pose(self) -> Pose2D:
        return self.pose_

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
            self._step, self._first = _make_step(self.cfg, self.sopts)

        points, mask, origin = pad_scan(cloud, self._max_beams)
        points, mask, origin = (jnp.asarray(points), jnp.asarray(mask),
                                jnp.asarray(origin))

        if not self.has_first_scan:
            self.odom_ = odometry
            self.map, _ = self._first(self.map, jnp.asarray(
                self.pose_.se2_array()), points, mask, origin)
            jax.block_until_ready(self.map.dist)
            self.has_first_scan = True
            if self.summary:
                dt = time.perf_counter() - t0
                self.summary.probe(timestamp, dt, mapping=dt,
                                   memory=self.memory_usage())
            return True

        # 1. predict from odometry (slam2d.cpp:163-173)
        odelta = self.odom_ - odometry
        ppose = self.pose_ + odelta
        if (np.linalg.norm(odelta.xy()) <= self.options.trans_thresh and
                abs(odelta.rotation()) <= self.options.rot_thresh):
            return False
        self.pose_ = ppose
        self.odom_ = odometry

        # 2-3. optimize + map update (single fused device program)
        self.map, pose_dev, info = self._step(
            self.map, jnp.asarray(self.pose_.se2_array()),
            points, mask, origin)
        pose_np = np.asarray(jax.block_until_ready(pose_dev))
        self.pose_ = Pose2D.from_se2_array(pose_np)
        self._last_info = {k: int(np.asarray(v)) for k, v in info.items()
                           if k != "chi2"}

        if self.summary:
            dt = time.perf_counter() - t0
            self.summary.probe(timestamp, dt, solving=dt, mapping=dt,
                               memory=self.memory_usage())
        return True

    def memory_usage(self) -> int:
        """Allocated patch bytes (Map::memory, src/sdm/map.cpp:115-137)."""
        n = int(self.map.table.num_patches())
        length = self.cfg.geometry.patch_length
        per_patch = length * length * (2 + 2 + 1 + 4)
        return n * per_patch

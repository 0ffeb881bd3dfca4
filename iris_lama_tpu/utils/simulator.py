"""Synthetic 2D lidar world: exact segment raycasting + noisy odometry.

Stands in for the CARMEN logs (Intel/MIT/ACES) in environments without
datasets: generates ground-truth trajectories through walled worlds, exact
lidar returns (segment intersection), and odometry corrupted with the same
noise model the reference's PF motion sampling assumes
(src/pf_slam2d.cpp:365-391 drawFromMotion).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..core.pose import Pose2D
from .cloud import PointCloudXYZ


@dataclasses.dataclass
class LaserSpec:
    n_beams: int = 360
    fov: float = 2.0 * np.pi * 270.0 / 360.0   # 270 degrees
    max_range: float = 10.0


def office_world(seed: int = 0) -> np.ndarray:
    """Segments [K, 4] (x1, y1, x2, y2): a loop of rooms and corridors."""
    segs: List[Tuple[float, float, float, float]] = []

    def box(x0, y0, x1, y1, openings=()):
        walls = [(x0, y0, x1, y0), (x1, y0, x1, y1),
                 (x1, y1, x0, y1), (x0, y1, x0, y0)]
        for i, wall in enumerate(walls):
            if i in openings:
                continue
            segs.append(wall)

    # outer shell 30x20 with inner rooms — loopy structure for SLAM
    box(0, 0, 30, 20)
    box(4, 4, 12, 9, openings=(1,))
    box(4, 12, 12, 16, openings=(0,))
    box(18, 4, 26, 9, openings=(3,))
    box(18, 12, 26, 16, openings=(1,))
    segs.append((14, 0, 14, 6))
    segs.append((16, 20, 16, 13))
    rng = np.random.default_rng(seed)
    for _ in range(8):  # clutter: pillars
        cx, cy = rng.uniform(2, 28), rng.uniform(2, 18)
        s = rng.uniform(0.2, 0.5)
        box(cx, cy, cx + s, cy + s)
    return np.asarray(segs, np.float64)


def _chaikin(waypoints: np.ndarray, iters: int) -> np.ndarray:
    """Chaikin corner cutting: each iteration replaces every interior
    corner with two points at 1/4 and 3/4 of the adjoining segments —
    bounds the heading rate of the resampled trajectory (a raw polyline
    turns 90 degrees in a single step, which no odometry-free tracker can
    follow)."""
    pts = waypoints
    for _ in range(iters):
        q = 0.75 * pts[:-1] + 0.25 * pts[1:]
        r = 0.25 * pts[:-1] + 0.75 * pts[1:]
        mid = np.empty((2 * (len(pts) - 1), 2))
        mid[0::2] = q
        mid[1::2] = r
        pts = np.concatenate([pts[:1], mid, pts[-1:]])
    return pts


def _poly_trajectory(waypoints: np.ndarray, n_steps: int) -> np.ndarray:
    """Resample a polyline into [N, 3] poses with tangent headings."""
    d = np.linalg.norm(np.diff(waypoints, axis=0), axis=1)
    s = np.concatenate([[0], np.cumsum(d)])
    t = np.linspace(0, s[-1], n_steps)
    xy = np.stack([np.interp(t, s, waypoints[:, i]) for i in (0, 1)], -1)
    heading = np.arctan2(*np.diff(xy, axis=0, append=xy[-1:] + 1e-9).T[::-1])
    heading[-1] = heading[-2]
    return np.concatenate([xy, heading[:, None]], -1)


def loop_trajectory(n_steps: int = 400, laps: int = 1,
                    smooth: int = 0) -> np.ndarray:
    """Ground-truth poses [N, 3] around the office loop.

    ``laps`` repeats the (closed) loop — scale n_steps with it to keep
    the per-step stride unchanged (longer timed regions for benches
    without changing the relative odometry noise per update).
    ``smooth`` applies that many Chaikin corner-cutting rounds (bounded
    heading rate — required for odometry-free tracking benches)."""
    waypoints = np.array([
        [2.0, 2.0], [13.0, 2.0], [15.0, 8.0], [15.0, 10.5], [17.0, 11.0],
        [28.0, 10.5], [28.0, 18.0], [17.0, 18.0], [15.0, 12.0], [13.0, 10.5],
        [2.0, 10.0], [2.0, 2.5],
    ])
    if laps > 1:
        waypoints = np.concatenate([waypoints] * laps)
    if smooth > 0:
        waypoints = _chaikin(waypoints, smooth)
    return _poly_trajectory(waypoints, n_steps)


def corridor_world(seed: int = 0, width: float = 120.0, height: float = 60.0,
                   cw: float = 3.0) -> np.ndarray:
    """Long-corridor figure-8 world (the MIT-Killian-court regime: hundreds
    of meters of near-featureless corridor, two nested loops sharing a
    middle leg). ``cw`` is the corridor width; small wall alcoves and
    pillars every few meters provide the longitudinal texture real
    buildings have (doorways, radiators) — without them a corridor is
    unobservable along its axis for any scan matcher."""
    segs: List[Tuple[float, float, float, float]] = []

    def box(x0, y0, x1, y1):
        segs.extend([(x0, y0, x1, y0), (x1, y0, x1, y1),
                     (x1, y1, x0, y1), (x0, y1, x0, y0)])

    mid = width / 2.0
    box(0, 0, width, height)                                   # outer shell
    box(cw, cw, mid - cw / 2, height - cw)                     # left block
    box(mid + cw / 2, cw, width - cw, height - cw)             # right block

    rng = np.random.default_rng(seed)
    # pillars along the outer ring + the middle corridor (alternating sides)
    def pillars_along(x0, y0, x1, y1, spacing=7.0):
        n = int(np.hypot(x1 - x0, y1 - y0) / spacing)
        ux, uy = (x1 - x0), (y1 - y0)
        L = np.hypot(ux, uy)
        ux, uy = ux / L, uy / L
        nx, ny = -uy, ux
        for i in range(1, n):
            t = i * spacing + rng.uniform(-1.0, 1.0)
            side = 1.0 if i % 2 == 0 else -1.0
            cx = x0 + ux * t + nx * side * (cw / 2 - 0.35)
            cy = y0 + uy * t + ny * side * (cw / 2 - 0.35)
            s = rng.uniform(0.15, 0.3)
            box(cx, cy, cx + s, cy + s)

    h = cw / 2
    pillars_along(h, h, width - h, h)
    pillars_along(width - h, h, width - h, height - h)
    pillars_along(width - h, height - h, h, height - h)
    pillars_along(h, height - h, h, h)
    pillars_along(mid, h, mid, height - h, spacing=6.0)
    return np.asarray(segs, np.float64)


def corridor_trajectory(n_steps: int = 3000, width: float = 120.0,
                        height: float = 60.0, cw: float = 3.0) -> np.ndarray:
    """Figure-8 route over :func:`corridor_world`: right loop, left loop,
    then a partial revisit — multiple large loop closures, ~550 m total."""
    h = cw / 2
    mid = width / 2.0
    w_, h_ = width - h, height - h
    waypoints = np.array([
        [2.0, h], [mid, h], [w_, h], [w_, h_], [mid, h_], [mid, h],
        [h, h], [h, h_], [mid, h_], [mid, h], [w_ * 0.75, h],
    ])
    return _poly_trajectory(waypoints, n_steps)


def cast_scan(segments: np.ndarray, pose_xyr: np.ndarray,
              spec: LaserSpec) -> np.ndarray:
    """Exact ranges [n_beams] from pose; inf where nothing within max_range."""
    angles = np.linspace(-spec.fov / 2, spec.fov / 2, spec.n_beams) \
        + pose_xyr[2]
    o = pose_xyr[:2]
    d = np.stack([np.cos(angles), np.sin(angles)], -1)       # [B, 2]
    p1 = segments[:, 0:2]                                     # [K, 2]
    e = segments[:, 2:4] - p1                                 # [K, 2]
    # solve o + t d = p1 + u e ; 0<=u<=1, t>0
    # cross products, broadcast [B, K]
    dxe = d[:, None, 0] * e[None, :, 1] - d[:, None, 1] * e[None, :, 0]
    rel = p1[None, :, :] - o[None, None, :]
    t_num = rel[..., 0] * e[None, :, 1] - rel[..., 1] * e[None, :, 0]
    u_num = rel[..., 0] * d[:, None, 1] - rel[..., 1] * d[:, None, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = t_num / dxe
        u = u_num / dxe
    ok = (np.abs(dxe) > 1e-12) & (u >= 0) & (u <= 1) & (t > 1e-6)
    t = np.where(ok, t, np.inf)
    r = t.min(axis=1)
    return np.where(r <= spec.max_range, r, np.inf)


@dataclasses.dataclass
class SimConfig:
    n_steps: int = 400
    seed: int = 0
    laser: LaserSpec = dataclasses.field(default_factory=LaserSpec)
    odom_trans_noise: float = 0.01   # per-step sigma (m)
    odom_rot_noise: float = 0.002    # per-step sigma (rad)
    range_noise: float = 0.01        # lidar range sigma (m)
    world: str = "office"            # "office" | "corridor"
    laps: int = 1                    # office loop repeats (same stride)
    smooth: int = 0                  # Chaikin rounds on the office loop


@dataclasses.dataclass
class SimData:
    poses_gt: np.ndarray            # [N, 3]
    odometry: List[Pose2D]
    clouds: List[PointCloudXYZ]
    timestamps: np.ndarray


def simulate(cfg: SimConfig = SimConfig()) -> SimData:
    rng = np.random.default_rng(cfg.seed)
    if cfg.world == "corridor":
        segs = corridor_world(cfg.seed)
        gt = corridor_trajectory(cfg.n_steps)
    else:
        segs = office_world(cfg.seed)
        gt = loop_trajectory(cfg.n_steps, cfg.laps, cfg.smooth)
    spec = cfg.laser
    beam_angles = np.linspace(-spec.fov / 2, spec.fov / 2, spec.n_beams)

    odom = Pose2D(0.0, 0.0, 0.0)
    odometry, clouds = [], []
    prev_gt = Pose2D.from_xyr(gt[0])
    for k in range(cfg.n_steps):
        cur_gt = Pose2D.from_xyr(gt[k])
        delta = prev_gt - cur_gt
        noisy = Pose2D(
            delta.x() + rng.normal(0, cfg.odom_trans_noise),
            delta.y() + rng.normal(0, cfg.odom_trans_noise),
            delta.rotation() + rng.normal(0, cfg.odom_rot_noise))
        odom = odom + noisy
        prev_gt = cur_gt
        odometry.append(odom)

        r = cast_scan(segs, gt[k], spec)
        r = r + rng.normal(0, cfg.range_noise, r.shape)
        clouds.append(PointCloudXYZ.from_ranges(r, beam_angles,
                                                spec.max_range))
    return SimData(gt, odometry, clouds,
                   np.arange(cfg.n_steps, dtype=np.float64) * 0.1)

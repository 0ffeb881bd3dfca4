"""Point-cloud container and host-side scan preprocessing.

reference: include/lama/types.h:105-121 ``PointCloudXYZ`` — points plus
sensor origin/orientation (the "moving frame").

The device kernels receive scans as fixed-shape padded arrays with the
sensor (moving) transform pre-applied on host (it is constant per scan,
reference slam2d.cpp:249-258 computes ``moving_tf`` once per update).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class PointCloudXYZ:
    """points: f64[N, 3] in the sensor frame; sensor pose in the base frame."""

    points: np.ndarray
    sensor_origin: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    sensor_orientation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0, 0.0]))  # quat wxyz

    @staticmethod
    def from_ranges(ranges, angles, max_range: float,
                    sensor_origin=None) -> "PointCloudXYZ":
        """Build a 2D cloud from a laser sweep, dropping invalid returns."""
        ranges = np.asarray(ranges, np.float64)
        angles = np.asarray(angles, np.float64)
        ok = np.isfinite(ranges) & (ranges > 0.0) & (ranges < max_range)
        r, a = ranges[ok], angles[ok]
        pts = np.stack([r * np.cos(a), r * np.sin(a), np.zeros_like(r)], -1)
        origin = np.zeros(3) if sensor_origin is None else np.asarray(sensor_origin)
        return PointCloudXYZ(pts, origin)

    def _rot(self) -> np.ndarray:
        w, x, y, z = self.sensor_orientation
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    def base_frame_points(self) -> np.ndarray:
        """moving_tf * points (f64[N, 3])."""
        return self.points @ self._rot().T + self.sensor_origin


def pad_scan(cloud: PointCloudXYZ, max_beams: int):
    """-> (points f32[max_beams, 3], mask bool[max_beams], origin f32[3]).

    Points beyond max_beams are dropped (callers size max_beams statically
    from the sensor's beam count).
    """
    pm = cloud.base_frame_points().astype(np.float32)
    n = min(len(pm), max_beams)
    points = np.zeros((max_beams, 3), np.float32)
    points[:n] = pm[:n]
    mask = np.zeros(max_beams, bool)
    mask[:n] = True
    return points, mask, cloud.sensor_origin.astype(np.float32)


def beam_bucket(n: int, quantum: int = 256) -> int:
    """Static padded size for n beams (limits jit recompiles)."""
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)

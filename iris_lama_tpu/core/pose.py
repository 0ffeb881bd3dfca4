"""Host-side Pose2D/Pose3D with the reference's composition semantics.

reference: include/lama/pose2d.h:42-77, src/pose2d.cpp:76-86 and pose3d.{h,cpp}.
Operators: ``a + b = a.state * b.state`` and ``a - b = a.state^-1 * b.state``.

These run on the host driver loop in float64 numpy (poses are tiny; keeping
them in f64 on host avoids drift over long trajectories), and convert to the
f32 JAX SE(2)/SE(3) array representation (see core/lie.py) at device
boundaries.
"""

from __future__ import annotations

import numpy as np


def _wrap_angle(a: float) -> float:
    return float(np.arctan2(np.sin(a), np.cos(a)))


class Pose2D:
    """SE(2) pose; mirrors the reference Pose2D API (pose2d.h:42-77)."""

    __slots__ = ("_x", "_y", "_theta")

    def __init__(self, x: float = 0.0, y: float = 0.0, rotation: float = 0.0):
        self._x = float(x)
        self._y = float(y)
        self._theta = _wrap_angle(rotation)

    # -- factory -----------------------------------------------------------
    @staticmethod
    def from_xyr(xyr) -> "Pose2D":
        return Pose2D(xyr[0], xyr[1], xyr[2])

    @staticmethod
    def from_se2_array(g) -> "Pose2D":
        """From a JAX/numpy (tx, ty, cos, sin) array (core/lie.py layout)."""
        g = np.asarray(g, np.float64)
        return Pose2D(g[0], g[1], np.arctan2(g[3], g[2]))

    # -- accessors (pose2d.h x()/y()/rotation()/xy()/xyr()) ----------------
    def x(self) -> float:
        return self._x

    def y(self) -> float:
        return self._y

    def rotation(self) -> float:
        return self._theta

    def xy(self) -> np.ndarray:
        return np.array([self._x, self._y])

    def xyr(self) -> np.ndarray:
        return np.array([self._x, self._y, self._theta])

    def se2_array(self) -> np.ndarray:
        """(tx, ty, cos, sin) f32 array for device code."""
        return np.array([self._x, self._y,
                         np.cos(self._theta), np.sin(self._theta)], np.float32)

    # -- group ops (src/pose2d.cpp:76-97) ----------------------------------
    def __add__(self, other: "Pose2D") -> "Pose2D":
        c, s = np.cos(self._theta), np.sin(self._theta)
        nx = self._x + c * other._x - s * other._y
        ny = self._y + s * other._x + c * other._y
        return Pose2D(nx, ny, self._theta + other._theta)

    def __sub__(self, other: "Pose2D") -> "Pose2D":
        # self^-1 * other
        c, s = np.cos(self._theta), np.sin(self._theta)
        dx = other._x - self._x
        dy = other._y - self._y
        return Pose2D(c * dx + s * dy, -s * dx + c * dy,
                      other._theta - self._theta)

    def inverse(self) -> "Pose2D":
        """Group inverse (== SE2d::inverse; note ``Pose2D() - p`` is p
        itself under the reference's operator-, NOT the inverse)."""
        c, s = np.cos(self._theta), np.sin(self._theta)
        return Pose2D(-(c * self._x + s * self._y),
                      -(-s * self._x + c * self._y), -self._theta)

    def transform(self, point) -> np.ndarray:
        """Apply pose to a 2D point (operator*, src/pose2d.cpp:98-101)."""
        c, s = np.cos(self._theta), np.sin(self._theta)
        p = np.asarray(point, np.float64)
        return np.array([self._x + c * p[0] - s * p[1],
                         self._y + s * p[0] + c * p[1]])

    def __repr__(self) -> str:
        return f"Pose2D(x={self._x:.6f}, y={self._y:.6f}, r={self._theta:.6f})"


class Pose3D:
    """SE(3) pose stored as translation + unit quaternion (w, x, y, z).

    reference: include/lama/pose3d.h, src/pose3d.cpp.
    """

    __slots__ = ("t", "q")

    def __init__(self, t=(0.0, 0.0, 0.0), q=(1.0, 0.0, 0.0, 0.0)):
        self.t = np.asarray(t, np.float64).copy()
        q = np.asarray(q, np.float64)
        self.q = q / np.linalg.norm(q)

    @staticmethod
    def from_xyzrpy(x, y, z, roll, pitch, yaw) -> "Pose3D":
        cr, sr = np.cos(roll / 2), np.sin(roll / 2)
        cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
        cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
        q = np.array([
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ])
        return Pose3D((x, y, z), q)

    @staticmethod
    def _qmul(a, b):
        aw, ax, ay, az = a
        bw, bx, by, bz = b
        return np.array([
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ])

    def _qapply(self, v):
        qv = self.q[1:]
        t = 2.0 * np.cross(qv, v)
        return v + self.q[0] * t + np.cross(qv, t)

    def __add__(self, other: "Pose3D") -> "Pose3D":
        return Pose3D(self.t + self._qapply(other.t),
                      self._qmul(self.q, other.q))

    def __sub__(self, other: "Pose3D") -> "Pose3D":
        inv_q = self.q * np.array([1.0, -1.0, -1.0, -1.0])
        inv = Pose3D(-Pose3D((0, 0, 0), inv_q)._qapply(self.t), inv_q)
        return inv + other

    def transform(self, point) -> np.ndarray:
        return self.t + self._qapply(np.asarray(point, np.float64))

    def se3_array(self) -> np.ndarray:
        return np.concatenate([self.t, self.q]).astype(np.float32)

    def __repr__(self) -> str:
        return f"Pose3D(t={self.t}, q={self.q})"

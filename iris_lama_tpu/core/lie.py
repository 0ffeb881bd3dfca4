"""Lie groups for TPU: SO(2)/SE(2)/SO(3)/SE(3) as vectorized functional ops.

TPU-native replacement for the reference's bundled Sophus headers
(reference: include/lama/sophus/se2.hpp:82,178,389; so2.hpp; se3.hpp; so3.hpp).
Instead of C++ classes, every group element is a plain JAX array (or tuple of
arrays) and every operation is a pure function that broadcasts over leading
batch dimensions — so `vmap`/`jit` compose freely and the math runs on the VPU.

Representations
---------------
SE(2): array [..., 4] = (tx, ty, cos(theta), sin(theta)).
       Storing the unit complex number instead of the angle avoids
       trig in `compose` (mirrors Sophus' SO2 complex storage).
SO(3): quaternion [..., 4] = (w, x, y, z), unit norm.
SE(3): array [..., 7] = (tx, ty, tz, qw, qx, qy, qz).

Tangent (twist) conventions match Sophus:
SE(2) tangent = (v1, v2, omega)    (se2.hpp:389 `exp`)
SE(3) tangent = (v, omega) in R^6  (se3.hpp `exp`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# SO(2)
# ---------------------------------------------------------------------------

def so2_from_angle(theta):
    """Angle -> unit complex (cos, sin)."""
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def so2_log(cs):
    """Unit complex -> angle in (-pi, pi]. (reference: sophus/so2.hpp log)."""
    return jnp.arctan2(cs[..., 1], cs[..., 0])


def so2_mul(a, b):
    """Complex multiplication (rotation composition)."""
    ca, sa = a[..., 0], a[..., 1]
    cb, sb = b[..., 0], b[..., 1]
    return jnp.stack([ca * cb - sa * sb, ca * sb + sa * cb], axis=-1)


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------

def se2(tx, ty, theta):
    """Build SE(2) element(s) from scalars/arrays."""
    tx, ty, theta = jnp.broadcast_arrays(
        jnp.asarray(tx, jnp.float32),
        jnp.asarray(ty, jnp.float32),
        jnp.asarray(theta, jnp.float32))
    return jnp.stack([tx, ty, jnp.cos(theta), jnp.sin(theta)], axis=-1)


def se2_identity(shape=()):
    out = jnp.zeros(shape + (4,), jnp.float32)
    return out.at[..., 2].set(1.0)


def se2_translation(g):
    return g[..., 0:2]


def se2_angle(g):
    return jnp.arctan2(g[..., 3], g[..., 2])


def se2_compose(a, b):
    """a * b (group product). reference: sophus/se2.hpp operator*."""
    ta, ca, sa = a[..., 0:2], a[..., 2], a[..., 3]
    tb = b[..., 0:2]
    cb, sb = b[..., 2], b[..., 3]
    tx = ta[..., 0] + ca * tb[..., 0] - sa * tb[..., 1]
    ty = ta[..., 1] + sa * tb[..., 0] + ca * tb[..., 1]
    c = ca * cb - sa * sb
    s = sa * cb + ca * sb
    return jnp.stack([tx, ty, c, s], axis=-1)


def se2_inverse(g):
    """g^-1. reference: sophus/se2.hpp inverse."""
    c, s = g[..., 2], g[..., 3]
    tx, ty = g[..., 0], g[..., 1]
    itx = -(c * tx + s * ty)
    ity = -(-s * tx + c * ty)
    return jnp.stack([itx, ity, c, -s], axis=-1)


def se2_apply(g, p):
    """Transform 2D point(s) p [..., 2] by g."""
    c, s = g[..., 2], g[..., 3]
    x, y = p[..., 0], p[..., 1]
    return jnp.stack([
        g[..., 0] + c * x - s * y,
        g[..., 1] + s * x + c * y,
    ], axis=-1)


def _sinc_cosc(theta):
    """Return (sin t / t, (1 - cos t) / t) with Taylor fallback near 0.

    These are the entries of the SE(2) left Jacobian V used by exp
    (reference: sophus/se2.hpp:389-417).
    """
    small = jnp.abs(theta) < 1e-4
    t2 = theta * theta
    # sin(t)/t ~ 1 - t^2/6;  (1-cos t)/t ~ t/2 - t^3/24
    safe = jnp.where(small, jnp.float32(1.0), theta)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)
    cosc = jnp.where(small, theta / 2.0 - t2 * theta / 24.0,
                     (1.0 - jnp.cos(safe)) / safe)
    return sinc, cosc


def se2_exp(xi):
    """Exponential map: twist (v1, v2, omega) -> SE(2).

    reference: sophus/se2.hpp:389 — t = V(omega) @ v, R = exp(omega).
    """
    v1, v2, w = xi[..., 0], xi[..., 1], xi[..., 2]
    sinc, cosc = _sinc_cosc(w)
    tx = sinc * v1 - cosc * v2
    ty = cosc * v1 + sinc * v2
    return jnp.stack([tx, ty, jnp.cos(w), jnp.sin(w)], axis=-1)


def se2_log(g):
    """Logarithm map: SE(2) -> twist (v1, v2, omega).

    reference: sophus/se2.hpp:178 — v = V(theta)^-1 @ t.
    """
    theta = se2_angle(g)
    tx, ty = g[..., 0], g[..., 1]
    sinc, cosc = _sinc_cosc(theta)
    # V = [[sinc, -cosc], [cosc, sinc]]; det = sinc^2 + cosc^2
    det = sinc * sinc + cosc * cosc
    v1 = (sinc * tx + cosc * ty) / det
    v2 = (-cosc * tx + sinc * ty) / det
    return jnp.stack([v1, v2, theta], axis=-1)


def se2_adjoint(g):
    """Adjoint matrix [..., 3, 3]. reference: sophus/se2.hpp:125."""
    c, s = g[..., 2], g[..., 3]
    tx, ty = g[..., 0], g[..., 1]
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = [
        jnp.stack([c, -s, ty], axis=-1),
        jnp.stack([s, c, -tx], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


# ---------------------------------------------------------------------------
# SO(3) — quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(shape=()):
    out = jnp.zeros(shape + (4,), jnp.float32)
    return out.at[..., 0].set(1.0)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q):
    return jnp.stack([q[..., 0], -q[..., 1], -q[..., 2], -q[..., 3]], axis=-1)


def quat_apply(q, v):
    """Rotate vector(s) v [..., 3] by quaternion q."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def so3_exp(w):
    """Rotation vector -> quaternion. reference: sophus/so3.hpp exp."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < 1e-5
    half = 0.5 * theta
    # sin(t/2)/t ~ 0.5 - t^2/48
    safe = jnp.where(small, jnp.float32(1.0), theta)
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / safe)
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([qw[..., None], k[..., None] * w], axis=-1)


def so3_log(q):
    """Quaternion -> rotation vector. reference: sophus/so3.hpp log."""
    qw = q[..., 0]
    qv = q[..., 1:4]
    n = jnp.linalg.norm(qv, axis=-1)
    small = n < 1e-7
    safe_n = jnp.where(small, jnp.float32(1.0), n)
    # guard sign so angle is in (-pi, pi]
    angle = 2.0 * jnp.arctan2(n, qw)
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    k = jnp.where(small, 2.0 / jnp.where(qw == 0, 1.0, qw), angle / safe_n)
    return k[..., None] * qv


# ---------------------------------------------------------------------------
# SE(3) — (t[3], q[4])
# ---------------------------------------------------------------------------

def se3(t, q):
    return jnp.concatenate([jnp.asarray(t, jnp.float32),
                            jnp.asarray(q, jnp.float32)], axis=-1)


def se3_identity(shape=()):
    out = jnp.zeros(shape + (7,), jnp.float32)
    return out.at[..., 3].set(1.0)


def se3_translation(g):
    return g[..., 0:3]


def se3_quat(g):
    return g[..., 3:7]


def se3_compose(a, b):
    t = se3_translation(a) + quat_apply(se3_quat(a), se3_translation(b))
    q = quat_mul(se3_quat(a), se3_quat(b))
    return jnp.concatenate([t, q], axis=-1)


def se3_inverse(g):
    qc = quat_conj(se3_quat(g))
    return jnp.concatenate([-quat_apply(qc, se3_translation(g)), qc], axis=-1)


def se3_apply(g, p):
    return se3_translation(g) + quat_apply(se3_quat(g), p)


def se3_exp(xi):
    """Twist (v, w) in R^6 -> SE(3). reference: sophus/se3.hpp exp."""
    v, w = xi[..., 0:3], xi[..., 3:6]
    q = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < 1e-5
    safe2 = jnp.where(small, jnp.float32(1.0), theta2)
    safe3 = jnp.where(small, jnp.float32(1.0), theta2 * theta)
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / safe3)
    wxv = jnp.cross(w, v)
    wxwxv = jnp.cross(w, wxv)
    t = v + A[..., None] * wxv + B[..., None] * wxwxv
    return jnp.concatenate([t, q], axis=-1)


def se3_log(g):
    """SE(3) -> twist (v, w)."""
    w = so3_log(se3_quat(g))
    t = se3_translation(g)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < 1e-5
    safe2 = jnp.where(small, jnp.float32(1.0), theta2)
    half = 0.5 * theta
    # coefficient of w x (w x t) in V^{-1}: (1 - A/(2B)) / theta^2 form
    cot = jnp.where(small, jnp.float32(0.0),
                    (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))) / safe2)
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, cot)
    wxt = jnp.cross(w, t)
    wxwxt = jnp.cross(w, wxt)
    v = t - 0.5 * wxt + cot[..., None] * wxwxt
    return jnp.concatenate([v, w], axis=-1)

"""Property tests for the Lie-group module against closed forms.

Oracle: direct rotation-matrix / quaternion algebra in float64 numpy.
reference semantics: include/lama/sophus/{so2,se2,so3,se3}.hpp.
"""

import numpy as np
import pytest

from iris_lama_tpu.core import lie
from iris_lama_tpu.core.pose import Pose2D, Pose3D

rng = np.random.default_rng(0)


def random_se2(n):
    return lie.se2(rng.uniform(-5, 5, n).astype(np.float32),
                   rng.uniform(-5, 5, n).astype(np.float32),
                   rng.uniform(-np.pi, np.pi, n).astype(np.float32))


def test_se2_compose_matches_matrix_form():
    a = random_se2(64)
    b = random_se2(64)
    c = np.asarray(lie.se2_compose(a, b))
    for i in range(64):
        ta, ca, sa = a[i, :2], a[i, 2], a[i, 3]
        Ra = np.array([[ca, -sa], [sa, ca]])
        tb, cb, sb = b[i, :2], b[i, 2], b[i, 3]
        Rb = np.array([[cb, -sb], [sb, cb]])
        Rc = Ra @ Rb
        tc = np.asarray(ta) + Ra @ np.asarray(tb)
        np.testing.assert_allclose(c[i, :2], tc, atol=1e-5)
        np.testing.assert_allclose(c[i, 2:], [Rc[0, 0], Rc[1, 0]], atol=1e-6)


def test_se2_inverse_roundtrip():
    g = random_se2(64)
    gi = lie.se2_inverse(g)
    ident = np.asarray(lie.se2_compose(g, gi))
    np.testing.assert_allclose(ident[:, :2], 0, atol=1e-5)
    np.testing.assert_allclose(ident[:, 2], 1, atol=1e-6)
    np.testing.assert_allclose(ident[:, 3], 0, atol=1e-6)


def test_se2_exp_log_roundtrip():
    xi = rng.uniform(-2, 2, (128, 3)).astype(np.float32)
    back = np.asarray(lie.se2_log(lie.se2_exp(xi)))
    np.testing.assert_allclose(back, xi, atol=1e-4)


def test_se2_exp_small_angle():
    xi = np.array([[0.3, -0.2, 1e-7], [0.3, -0.2, 0.0]], np.float32)
    g = np.asarray(lie.se2_exp(xi))
    np.testing.assert_allclose(g[0], g[1], atol=1e-6)
    np.testing.assert_allclose(g[1, :2], [0.3, -0.2], atol=1e-6)


def test_se2_exp_matches_closed_form():
    # t = V(w) v with V = [[s/w, -(1-c)/w], [(1-c)/w, s/w]]  (se2.hpp:389)
    xi = np.array([[1.0, 2.0, 0.5]], np.float32)
    g = np.asarray(lie.se2_exp(xi))[0]
    w = 0.5
    V = np.array([[np.sin(w) / w, -(1 - np.cos(w)) / w],
                  [(1 - np.cos(w)) / w, np.sin(w) / w]])
    t = V @ np.array([1.0, 2.0])
    np.testing.assert_allclose(g[:2], t, atol=1e-5)
    np.testing.assert_allclose(g[2:], [np.cos(w), np.sin(w)], atol=1e-6)


def test_se2_apply():
    g = lie.se2(1.0, 2.0, np.pi / 2)
    p = np.asarray(lie.se2_apply(g, np.array([1.0, 0.0], np.float32)))
    np.testing.assert_allclose(p, [1.0, 3.0], atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    back = np.asarray(lie.so3_log(lie.so3_exp(w)))
    np.testing.assert_allclose(back, w, atol=1e-4)


def test_se3_compose_apply():
    xi = rng.uniform(-1, 1, (32, 6)).astype(np.float32)
    g = lie.se3_exp(xi)
    gi = lie.se3_inverse(g)
    p = rng.uniform(-3, 3, (32, 3)).astype(np.float32)
    q = np.asarray(lie.se3_apply(gi, lie.se3_apply(g, p)))
    np.testing.assert_allclose(q, p, atol=1e-4)


def test_se3_exp_log_roundtrip():
    xi = rng.uniform(-1.5, 1.5, (64, 6)).astype(np.float32)
    back = np.asarray(lie.se3_log(lie.se3_exp(xi)))
    np.testing.assert_allclose(back, xi, atol=5e-4)


# ---------------------------------------------------------------------------
# Pose2D host semantics (src/pose2d.cpp:76-97)
# ---------------------------------------------------------------------------

def test_pose2d_add_sub():
    a = Pose2D(1.0, 2.0, 0.3)
    b = Pose2D(-0.5, 0.25, -0.1)
    c = a + b
    # a + b == a.state * b.state
    ca, sa = np.cos(0.3), np.sin(0.3)
    np.testing.assert_allclose(c.x(), 1.0 + ca * -0.5 - sa * 0.25, atol=1e-12)
    np.testing.assert_allclose(c.y(), 2.0 + sa * -0.5 + ca * 0.25, atol=1e-12)
    np.testing.assert_allclose(c.rotation(), 0.2, atol=1e-12)
    # (a + b) - a == ... b  since a-b = a^-1 * b
    d = a - c
    np.testing.assert_allclose(d.xyr(), b.xyr(), atol=1e-12)


def test_pose2d_se2_array_roundtrip():
    p = Pose2D(3.0, -1.0, 2.0)
    q = Pose2D.from_se2_array(p.se2_array())
    np.testing.assert_allclose(q.xyr(), p.xyr(), atol=1e-6)


def test_pose3d_add_sub():
    a = Pose3D.from_xyzrpy(1, 2, 3, 0.1, -0.2, 0.3)
    b = Pose3D.from_xyzrpy(-1, 0.5, 0, 0.2, 0.1, -0.4)
    c = a + b
    d = a - c
    np.testing.assert_allclose(d.t, b.t, atol=1e-12)
    np.testing.assert_allclose(np.abs(np.dot(d.q, b.q)), 1.0, atol=1e-12)


def test_pose2d_inverse():
    p = Pose2D(1.5, -0.7, 0.9)
    ident = p + p.inverse()
    np.testing.assert_allclose(ident.xyr(), 0.0, atol=1e-12)
    ident2 = p.inverse() + p
    np.testing.assert_allclose(ident2.xyr(), 0.0, atol=1e-12)
    # the trap this guards: Pose2D() - p is p, NOT the inverse
    np.testing.assert_allclose((Pose2D() - p).xyr(), p.xyr(), atol=1e-12)

"""PointCloudXYZ / scan packing tests (types.h:105-121 semantics)."""

import numpy as np

from iris_lama_tpu.utils.cloud import PointCloudXYZ, pad_scan, beam_bucket


def test_from_ranges_filters_invalid():
    angles = np.linspace(-np.pi / 2, np.pi / 2, 7)
    ranges = np.array([1.0, np.inf, 2.0, np.nan, 0.0, 80.0, 3.0])
    c = PointCloudXYZ.from_ranges(ranges, angles, max_range=10.0)
    assert len(c.points) == 3        # 1.0, 2.0, 3.0 survive
    np.testing.assert_allclose(np.linalg.norm(c.points[:, :2], axis=1),
                               [1.0, 2.0, 3.0], atol=1e-9)


def test_base_frame_points_applies_sensor_pose():
    c = PointCloudXYZ(points=np.array([[1.0, 0.0, 0.0]]),
                      sensor_origin=np.array([0.5, 0.0, 0.2]))
    # yaw 90 degrees
    th = np.pi / 2
    c.sensor_orientation = np.array([np.cos(th / 2), 0, 0, np.sin(th / 2)])
    p = c.base_frame_points()[0]
    np.testing.assert_allclose(p, [0.5, 1.0, 0.2], atol=1e-9)


def test_pad_scan_shapes_and_mask():
    c = PointCloudXYZ(points=np.ones((10, 3)))
    pts, mask, origin = pad_scan(c, 16)
    assert pts.shape == (16, 3) and mask.shape == (16,)
    assert mask[:10].all() and not mask[10:].any()
    assert (pts[10:] == 0).all()


def test_pad_scan_truncates():
    c = PointCloudXYZ(points=np.ones((20, 3)))
    pts, mask, _ = pad_scan(c, 16)
    assert mask.all()


def test_beam_bucket():
    assert beam_bucket(1) == 256
    assert beam_bucket(256) == 256
    assert beam_bucket(257) == 512
    assert beam_bucket(720) == 768

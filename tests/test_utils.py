"""Tests for dataset reader, checkpointing, summary/timers, AABB-ish utils."""

import io

import numpy as np

from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import dataset as ds
from iris_lama_tpu.utils import checkpoint as ckpt
from iris_lama_tpu.utils.summary import Summary, TimerRegistry, Welford


def test_carmen_flaser_roundtrip(tmp_path):
    recs = []
    for k in range(3):
        angles = np.linspace(-np.pi / 2, np.pi / 2, 181)
        r = np.full(181, 4.0 + k)
        cloud = ds.PointCloudXYZ.from_ranges(r, angles, 80.0)
        recs.append(ds.LaserScanRecord(cloud, Pose2D(k, -k, 0.1 * k),
                                       float(k)))
    p = str(tmp_path / "log.clf")
    ds.write_carmen_flaser(p, recs)
    back = list(ds.read_carmen_log(p))
    assert len(back) == 3
    for k, rec in enumerate(back):
        assert abs(rec.odometry.x() - k) < 1e-5
        assert abs(rec.timestamp - k) < 1e-6
        r = np.linalg.norm(rec.cloud.points[:, :2], axis=1)
        np.testing.assert_allclose(r, 4.0 + k, atol=1e-2)


def test_carmen_robotlaser_parse():
    n = 5
    ranges = "1.0 2.0 3.0 4.0 5.0"
    line = (f"ROBOTLASER1 0 -1.5708 3.14159 0.785398 30.0 0.01 0 {n} "
            f"{ranges} 0 1.0 2.0 0.5 1.0 2.0 0.5 0 0 0 0 0 123.456 host 123.5\n")
    recs = list(ds.read_carmen_log(io.StringIO(line)))
    assert len(recs) == 1
    rec = recs[0]
    assert abs(rec.odometry.x() - 1.0) < 1e-9
    assert abs(rec.timestamp - 123.456) < 1e-6
    assert len(rec.cloud.points) == 5


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from iris_lama_tpu.sdm import mapping
    from iris_lama_tpu.sdm.geometry import MapGeometry

    cfg = mapping.MappingConfig(geometry=MapGeometry(0.1, 4), capacity=64)
    state = mapping.slam_map_init(cfg)
    state = state._replace(dist=state.dist.at[3, 2, 1].set(0.123))

    p = str(tmp_path / "state.ckpt")
    ckpt.save_state(p, state)
    loaded = ckpt.load_state(p, state)
    assert abs(float(loaded.dist[3, 2, 1]) - 0.123) < 1e-6
    np.testing.assert_array_equal(np.asarray(loaded.table.keys),
                                  np.asarray(state.table.keys))


def test_checkpoint_compressed(tmp_path):
    import jax.numpy as jnp
    tree = {"a": jnp.zeros((64, 64)), "b": jnp.arange(10)}
    p = str(tmp_path / "c.ckpt")
    ckpt.save_state(p, tree, compress=True)
    loaded = ckpt.load_state(p, tree)
    np.testing.assert_array_equal(np.asarray(loaded["b"]), np.arange(10))


def test_welford_matches_numpy():
    xs = np.random.default_rng(1).normal(3.0, 2.0, 100)
    w = Welford()
    for x in xs:
        w.add(float(x))
    assert abs(w.mean - xs.mean()) < 1e-9
    assert abs(w.std - xs.std(ddof=1)) < 1e-9


def test_summary_report():
    s = Summary()
    for k in range(5):
        s.probe(timestamp=k * 0.1, total=0.01, solving=0.004, mapping=0.005,
                memory=1024)
    rep = s.report()
    assert "updates: 5" in rep
    assert "Hz" in rep


def test_timer_registry():
    import time
    reg = TimerRegistry()
    with reg.scoped("phase"):
        time.sleep(0.01)
    assert "phase" in reg.report()
    assert reg.timers["phase"].mean >= 0.008

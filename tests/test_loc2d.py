"""Loc2D tests: localization against a prebuilt map, covariance, and global
localization (kidnapped-robot recovery)."""

import numpy as np

from iris_lama_tpu.algos.loc2d import (Loc2D, Loc2DOptions, maps_from_slam)
from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator


def build_map(data, n_steps):
    opts = Slam2DOptions(resolution=0.1, patch_size=16, max_range=8.0,
                         trans_thresh=0.2, rot_thresh=0.2, capacity=4096)
    slam = Slam2D(opts)
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_steps):
        slam.update(data.clouds[k], data.odometry[k], data.timestamps[k])
    return slam


def _sim(n=120, seed=4):
    cfg = simulator.SimConfig(
        n_steps=n, seed=seed,
        laser=simulator.LaserSpec(n_beams=120, max_range=8.0))
    return simulator.simulate(cfg)


def test_loc2d_tracks_on_prebuilt_map():
    data = _sim()
    n_map = 60
    slam = build_map(data, n_map)
    maps = maps_from_slam(slam.map, slam.cfg)

    loc = Loc2D(Loc2DOptions(resolution=0.1, patch_size=16, l2_max=0.5,
                             trans_thresh=0.2, rot_thresh=0.2,
                             max_range=8.0), maps=maps)
    # start localization from the ground truth at step 0, replay the odometry
    loc.set_prior(Pose2D(*data.poses_gt[0]))
    errs = []
    for k in range(n_map):
        if loc.update(data.clouds[k], data.odometry[k], data.timestamps[k]):
            err = np.linalg.norm(loc.pose().xy() - data.poses_gt[k][:2])
            errs.append(err)
    assert len(errs) > 5
    assert np.mean(errs) < 0.15, errs
    # covariance is SPD-ish and small
    cov = loc.covariance()
    assert cov.shape == (3, 3)
    assert np.all(np.linalg.eigvalsh(cov[:2, :2]) > 0)


def test_loc2d_update_many_matches_sequential():
    """The chunked offline-log replay (one lax.scan dispatch per chunk)
    must match the per-scan driver exactly: same accepted scans, same
    trajectory, same final pose/cov/rmse."""
    import jax.numpy as jnp
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    data = _sim()
    n_map = 60
    slam = build_map(data, n_map)
    maps = maps_from_slam(slam.map, slam.cfg)
    opts = Loc2DOptions(resolution=0.1, patch_size=16, l2_max=0.5,
                        trans_thresh=0.2, rot_thresh=0.2, max_range=8.0)

    nb = beam_bucket(120)
    staged = []
    for k in range(n_map):
        p, m, _ = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p[:, :2]), jnp.asarray(m)))

    a = Loc2D(opts, maps=maps)
    a.set_prior(Pose2D(*data.poses_gt[0]))
    n_seq = 0
    for k in range(n_map):
        n_seq += bool(a.update(data.clouds[k], data.odometry[k],
                               data.timestamps[k]))

    b = Loc2D(opts, maps=maps)
    b.set_prior(Pose2D(*data.poses_gt[0]))
    accepted = b.update_many_prepadded(staged, list(data.odometry),
                                       chunk=8)

    # sequential counts the first scan as handled (returns True, no solve)
    assert n_seq == len(accepted) + 1
    np.testing.assert_allclose(a.trajectory(), b.trajectory(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a._pose_dev),
                               np.asarray(b._pose_dev), atol=1e-6)
    np.testing.assert_allclose(a.covariance(), b.covariance(), atol=1e-8)
    assert abs(a.rmse() - b.rmse()) < 1e-6


def test_loc2d_global_localization_recovers():
    data = _sim()
    n_map = 100
    slam = build_map(data, n_map)
    maps = maps_from_slam(slam.map, slam.cfg)

    loc = Loc2D(Loc2DOptions(resolution=0.1, patch_size=16, l2_max=0.5,
                             max_range=8.0, gloc_particles=2000,
                             gloc_thresh=0.25), maps=maps, seed=9)
    # kidnapped: prior far from the truth
    k = 40
    loc.set_prior(Pose2D(25.0, 3.0, 1.0))
    loc.trigger_global_localization()
    loc.update(data.clouds[k], data.odometry[k], 0.0, force_update=True)
    # a couple more forced updates to converge
    for j in (k + 1, k + 2, k + 3):
        loc.update(data.clouds[j], data.odometry[j], 0.0, force_update=True)
    err = np.linalg.norm(loc.pose().xy() - data.poses_gt[k + 3][:2])
    assert err < 0.5, (err, loc.pose().xyr(), data.poses_gt[k + 3])


def test_loc2d_sampling_covariance_blend():
    data = _sim(n=30)
    slam = build_map(data, 30)
    maps = maps_from_slam(slam.map, slam.cfg)
    loc = Loc2D(Loc2DOptions(resolution=0.1, patch_size=16, max_range=8.0,
                             cov_blend=0.5), maps=maps)
    loc.set_prior(Pose2D(*data.poses_gt[0]))
    loc.update(data.clouds[0], data.odometry[0], 0.0, force_update=True)
    loc.update(data.clouds[5], data.odometry[5], 0.0, force_update=True)
    cov = loc.covariance()
    assert np.isfinite(cov).all()
    assert np.all(np.diag(cov)[:2] >= 0)


def test_sampling_covariance_matches_numpy_oracle():
    """Olson sampled covariance vs a literal numpy port of
    loc2d.cpp:199-247 (steps cache, subsampling, exp weighting)."""
    import jax.numpy as jnp
    from iris_lama_tpu.algos.loc2d import sampling_covariance_kernel
    from iris_lama_tpu.sdm import distance as dmod

    data = _sim(n=20)
    slam = build_map(data, 20)
    from iris_lama_tpu.algos.loc2d import maps_from_slam
    maps = maps_from_slam(slam.map, slam.cfg)
    geo = slam.cfg.geometry
    max_dist = slam.cfg.distance.max_dist

    from iris_lama_tpu.utils.cloud import pad_scan
    pts, mask, _ = pad_scan(data.clouds[5], 128)
    pose = Pose2D(*data.poses_gt[5])
    n_step = max(int(mask.sum()) // 100, 1)

    got = np.asarray(sampling_covariance_kernel(
        maps, geo, max_dist, jnp.asarray(pts[:, :2]), jnp.asarray(mask),
        jnp.asarray(pose.se2_array()), geo.resolution, n_step))

    # numpy oracle
    steps = [(0.0, 0.0)]
    for i in range(1, 21):
        s = i * geo.resolution
        steps += [(s, 0), (0, s), (-s, 0), (0, -s),
                  (s, s), (-s, s), (s, -s), (-s, -s)]
    sub = pts[::n_step][:, :2]
    submask = mask[::n_step]
    K = np.zeros((2, 2)); u = np.zeros(2); ssum = 0.0
    c, s_ = np.cos(pose.rotation()), np.sin(pose.rotation())
    R = np.array([[c, -s_], [s_, c]])
    dist_pool = np.asarray(maps.distance.dist)
    from iris_lama_tpu.sdm import pool as pool_mod
    for ox, oy in steps:
        trans = np.array([pose.x() + ox, pose.y() + oy])
        hits = sub @ R.T + trans
        cells = geo.np_w2m(hits)
        d = np.asarray(dmod.cell_distance(
            maps.distance.table, maps.distance.dist, geo,
            jnp.asarray(cells.astype(np.int32)), max_dist))
        e = np.exp(-(d * d) / 0.01) * submask
        l = float(np.sum(e ** 3))
        K += np.outer(trans, trans) * l
        u += trans * l
        ssum += l
    expect = K / ssum - np.outer(u, u) / (ssum * ssum)
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_full_file_workflow_slam_to_loc(tmp_path):
    """The production workflow through files: slam2d builds maps, writes
    reference-format .smd, a fresh Loc2D loads them and localizes
    (SURVEY §3.5: 'how Loc2D consumes SLAM-built maps offline')."""
    from iris_lama_tpu.sdm import io as sdm_io
    from iris_lama_tpu.algos.loc2d import LocMaps, maps_from_slam

    data = _sim(n=50)
    slam = build_map(data, 50)

    occ_path = str(tmp_path / "world_occ.smd")
    dm_path = str(tmp_path / "world_dm.smd")
    maps0 = maps_from_slam(slam.map, slam.cfg)
    sdm_io.write_simple_occupancy(maps0.occupancy, slam.cfg.geometry,
                                  occ_path)
    sdm_io.write_distance_map(slam.map, slam.cfg.geometry, slam.cfg.l2_max,
                              dm_path)

    occ_loaded, geo = sdm_io.read_simple_occupancy(occ_path, capacity=4096)
    dm_loaded, dcfg = sdm_io.read_distance_map(dm_path, capacity=4096)

    loc = Loc2D(Loc2DOptions(resolution=0.1, patch_size=16,
                             l2_max=float(dcfg.l2_max), max_range=8.0,
                             trans_thresh=0.2, rot_thresh=0.2),
                maps=LocMaps(occ_loaded, dm_loaded))
    loc.set_prior(Pose2D(*data.poses_gt[0]))
    errs = []
    for k in range(50):
        if loc.update(data.clouds[k], data.odometry[k], data.timestamps[k]):
            errs.append(np.linalg.norm(loc.pose().xy() - data.poses_gt[k][:2]))
    assert len(errs) > 3
    assert np.mean(errs) < 0.2, errs


def test_loc2d_adopts_map_patch_size():
    """r3 verify-probe find: a patch_size option mismatching the maps'
    actual patch length produced a deep shape error inside the fused
    step. The maps are the authority (the reference reads patch_length
    from the .smd header) — Loc2D must adopt it."""
    data = _sim(n=30)
    slam = build_map(data, 30)          # patch_size 16 maps
    maps = maps_from_slam(slam.map, slam.cfg)
    loc = Loc2D(Loc2DOptions(resolution=0.1, max_range=8.0),  # default 32
                maps=maps)
    assert loc.options.patch_size == 16
    loc.set_prior(Pose2D(*data.poses_gt[0]))
    loc.update(data.clouds[0], data.odometry[0], 0.0, force_update=True)
    loc.update(data.clouds[5], data.odometry[5], 0.0, force_update=True)
    assert np.isfinite(loc.pose().xyr()).all()

"""End-to-end Slam2D on the synthetic office world.

Property: SLAM trajectory beats raw (noisy) odometry and stays within a tight
ATE bound of ground truth — the parity property BASELINE.md tracks on the
real logs.
"""

import numpy as np
import pytest

from iris_lama_tpu.algos.slam2d import Slam2D, Slam2DOptions
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.evaluation import ate_rmse


def run_sim_slam(n_steps=150, seed=1, **opt_kw):
    cfg = simulator.SimConfig(
        n_steps=n_steps, seed=seed,
        laser=simulator.LaserSpec(n_beams=180, max_range=8.0))
    data = simulator.simulate(cfg)

    opts = Slam2DOptions(resolution=0.05, max_range=8.0, trans_thresh=0.25,
                         rot_thresh=0.25, capacity=8192, **opt_kw)
    slam = Slam2D(opts)
    slam.set_prior(__import__("iris_lama_tpu.core.pose",
                              fromlist=["Pose2D"]).Pose2D(*data.poses_gt[0]))

    est, gt_used, odom_used = [], [], []
    for k in range(n_steps):
        updated = slam.update(data.clouds[k], data.odometry[k],
                              data.timestamps[k])
        if updated:
            est.append(slam.pose().xyr())
            gt_used.append(data.poses_gt[k])
            odom_used.append(data.odometry[k].xyr())
    return (np.asarray(est), np.asarray(gt_used), np.asarray(odom_used), slam)


def test_slam2d_tracks_ground_truth():
    est, gt, odom, slam = run_sim_slam()
    assert len(est) > 20
    ate_slam = ate_rmse(est, gt)
    ate_odom = ate_rmse(odom, gt)
    # SLAM must be accurate in absolute terms and no worse than odometry
    assert ate_slam < 0.08, (ate_slam, ate_odom)
    assert ate_slam <= ate_odom * 1.5, (ate_slam, ate_odom)
    assert slam._last_info["overflow"] == 0


def test_slam2d_motion_gate():
    cfg = simulator.SimConfig(n_steps=400, seed=0)  # ~0.2 m between steps
    data = simulator.simulate(cfg)
    slam = Slam2D(Slam2DOptions(max_range=8.0))
    assert slam.update(data.clouds[0], data.odometry[0], 0.0)
    # consecutive poses are ~0.08 m apart: under the 0.5 m gate
    assert not slam.update(data.clouds[1], data.odometry[1], 0.1)
    assert slam.enough_motion(data.odometry[1]) is False


def test_transient_slam_long_run_bounded_memory():
    """Endurance: 300 scans with a transient map — pool stays bounded, no
    overflow, and tracking holds (slam2d.cpp:323-373 behavior)."""
    cfg = simulator.SimConfig(
        n_steps=300, seed=3,
        laser=simulator.LaserSpec(n_beams=120, max_range=8.0))
    data = simulator.simulate(cfg)
    from iris_lama_tpu.core.pose import Pose2D
    opts = Slam2DOptions(resolution=0.1, patch_size=16, max_range=8.0,
                         trans_thresh=0.25, rot_thresh=0.25,
                         capacity=2048, transient_map=True)
    slam = Slam2D(opts)
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    counts = []
    est, gt = [], []
    for k in range(cfg.n_steps):
        if slam.update(data.clouds[k], data.odometry[k], data.timestamps[k]):
            est.append(slam.pose().xyr())
            gt.append(data.poses_gt[k])
        if k % 50 == 49:
            counts.append(int(slam.map.table.num_patches()))
    assert slam._last_info["overflow"] == 0
    # pruning keeps the pool bounded well below the visited-world total
    assert max(counts) < 1200, counts
    # local tracking stays sane even though old areas are forgotten
    err = np.linalg.norm(np.asarray(est)[-1, :2] - np.asarray(gt)[-1, :2])
    assert err < 1.0, err


def test_summary_report_path():
    cfg = simulator.SimConfig(n_steps=30, seed=2,
                              laser=simulator.LaserSpec(n_beams=120,
                                                        max_range=8.0))
    data = simulator.simulate(cfg)
    from iris_lama_tpu.core.pose import Pose2D
    slam = Slam2D(Slam2DOptions(resolution=0.1, patch_size=16, max_range=8.0,
                                trans_thresh=0.2, rot_thresh=0.2,
                                capacity=1024, create_summary=True))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(30):
        slam.update(data.clouds[k], data.odometry[k], data.timestamps[k])
    rep = slam.summary.report()
    assert "updates:" in rep and "Hz" in rep and "MiB" in rep
    assert slam.memory_usage() > 0


def test_update_paths_equivalent():
    """update() and update_prepadded() produce identical trajectories."""
    import jax.numpy as jnp
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    cfg = simulator.SimConfig(n_steps=40, seed=6,
                              laser=simulator.LaserSpec(n_beams=120,
                                                        max_range=8.0))
    data = simulator.simulate(cfg)
    opts = Slam2DOptions(resolution=0.1, patch_size=16, max_range=8.0,
                         trans_thresh=0.2, rot_thresh=0.2, capacity=1024)

    a = Slam2D(opts)
    a.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(40):
        a.update(data.clouds[k], data.odometry[k], data.timestamps[k])

    b = Slam2D(opts)
    b.set_prior(Pose2D(*data.poses_gt[0]))
    nb = beam_bucket(120)
    for k in range(40):
        p, m, o = pad_scan(data.clouds[k], nb)
        b.update_prepadded(jnp.asarray(p), jnp.asarray(m), jnp.asarray(o),
                           data.odometry[k], data.timestamps[k])

    np.testing.assert_allclose(a.trajectory(), b.trajectory(), atol=1e-6)


@pytest.mark.parametrize("mode", ["unroll", "scan"])
def test_update_many_matches_sequential(mode, monkeypatch):
    """Both chunked offline-log paths (straight-line unroll with a
    per-scan remainder, and one lax.scan dispatch per chunk of accepted
    scans) must produce the same trajectory and map as the per-scan
    driver — including across chunk boundaries with a padded/remainder
    tail and with the motion gate rejecting some scans."""
    import jax.numpy as jnp
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    monkeypatch.setenv("IRIS_SLAM_CHUNK_MODE", mode)
    cfg = simulator.SimConfig(n_steps=50, seed=6,
                              laser=simulator.LaserSpec(n_beams=120,
                                                        max_range=8.0))
    data = simulator.simulate(cfg)
    opts = Slam2DOptions(resolution=0.1, patch_size=16, max_range=8.0,
                         trans_thresh=0.2, rot_thresh=0.2, capacity=1024)
    nb = beam_bucket(120)
    staged = []
    for k in range(50):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))

    a = Slam2D(opts)
    a.set_prior(Pose2D(*data.poses_gt[0]))
    n_seq = 0
    for k in range(50):
        n_seq += bool(a.update_prepadded(*staged[k], data.odometry[k]))

    b = Slam2D(opts)
    b.set_prior(Pose2D(*data.poses_gt[0]))
    accepted = b.update_many_prepadded(staged, list(data.odometry), chunk=8)

    assert n_seq == len(accepted)
    np.testing.assert_allclose(a.trajectory(), b.trajectory(), atol=1e-6)
    # content-based map comparison: re-org TIMING differs between the
    # host-gated per-scan path and the device-cond scan chunk, so pool
    # slot assignment differs while per-key content must not
    ca, cb = _patch_content(a), _patch_content(b)
    assert set(ca) == set(cb)
    for key in ca:
        for x, y in zip(ca[key], cb[key]):
            np.testing.assert_array_equal(x, y)


def test_resident_matches_pool_path():
    """The resident sliding-window step is bit-equal to the pool path:
    identical trajectories and identical dense map content (the match
    sub-window provably contains every probe the pool window serves, and
    resident values equal pool values between exchanges)."""
    from iris_lama_tpu.sdm import export

    est_r, _, _, slam_r = run_sim_slam(n_steps=80, resident_window=True,
                                       resident_extra_patches=1)
    est_p, _, _, slam_p = run_sim_slam(n_steps=80, resident_window=False)

    np.testing.assert_array_equal(est_r, est_p)

    def dense(slam):
        m = slam.map   # flushes the resident grids on the resident path
        geo = slam.cfg.geometry
        occ, _ = export._dense_from_pool(m.table, np.asarray(m.occupied),
                                         geo, np.uint16(0))
        vis, _ = export._dense_from_pool(m.table, np.asarray(m.visited),
                                         geo, np.uint16(0))
        dist, _ = export._dense_from_pool(
            m.table, np.asarray(m.dist), geo,
            np.float32(slam.cfg.distance.max_dist))
        return occ, vis, dist

    occ_r, vis_r, dist_r = dense(slam_r)
    occ_p, vis_p, dist_p = dense(slam_p)
    np.testing.assert_array_equal(occ_r, occ_p)
    np.testing.assert_array_equal(vis_r, vis_p)
    np.testing.assert_array_equal(dist_r, dist_p)


def _patch_content(slam):
    """{patch_key: (occ, vis, dist) blocks} for all non-default patches —
    pool-membership-order independent map content."""
    import jax.numpy as jnp
    from iris_lama_tpu.sdm import pool as pool_mod

    m = slam.map   # flushes the resident grids on the resident path
    keys, active = (np.asarray(a) for a in pool_mod.active_keys(m.table))
    occ = np.asarray(m.occupied)
    vis = np.asarray(m.visited)
    dist = np.asarray(m.dist)
    max_dist = np.float32(slam.cfg.distance.max_dist)
    out = {}
    for s in np.nonzero(active)[0]:
        blk = (occ[s], vis[s], dist[s])
        if blk[0].any() or blk[1].any() or (blk[2] != max_dist).any():
            out[int(keys[s])] = blk
    return out


def test_resident_transient_matches_pool_path():
    """r3: transient maps on the resident window are bit-equal to the pool
    path — identical trajectories and identical per-patch map content
    (transient pruning = in-window patch resets + per-scan pool prunes;
    reference semantics slam2d.cpp:323-373)."""
    kw = dict(n_steps=120, seed=3, transient_map=True)
    est_r, _, _, slam_r = run_sim_slam(resident_window=True,
                                       resident_extra_patches=1, **kw)
    est_p, _, _, slam_p = run_sim_slam(resident_window=False, **kw)

    np.testing.assert_array_equal(est_r, est_p)

    cr, cp = _patch_content(slam_r), _patch_content(slam_p)
    assert set(cr) == set(cp)
    for k in cr:
        for a, b in zip(cr[k], cp[k]):
            np.testing.assert_array_equal(a, b)
    # the run must actually exercise pruning (pool stays far below the
    # visited-world patch total) and at least one resident re-org
    assert len(cr) < 700, len(cr)


def test_detailed_summary_phase_split():
    """Opt-in two-program mode restores real solving-vs-mapping rows
    (VERDICT r2 #8; reference Summary split src/slam2d.cpp:61-87)."""
    cfg = simulator.SimConfig(n_steps=25, seed=2,
                              laser=simulator.LaserSpec(n_beams=120,
                                                        max_range=8.0))
    data = simulator.simulate(cfg)
    from iris_lama_tpu.core.pose import Pose2D
    slam = Slam2D(Slam2DOptions(resolution=0.1, patch_size=16,
                                max_range=8.0, trans_thresh=0.2,
                                rot_thresh=0.2, capacity=1024,
                                create_summary=True,
                                detailed_summary=True))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    est = []
    for k in range(cfg.n_steps):
        if slam.update(data.clouds[k], data.odometry[k],
                       data.timestamps[k]):
            est.append(slam.pose().xyr())
    s = slam.summary
    n = len(s.time_total)
    assert n > 5
    # phases measured separately and both nonzero (not the fused copy)
    assert sum(s.time_solving[1:]) > 0 and sum(s.time_mapping[1:]) > 0
    assert any(abs(a - b) > 1e-9 for a, b in
               zip(s.time_solving[1:], s.time_mapping[1:]))
    assert "solving" in s.report() and "mapping" in s.report()
    # and the trajectory still tracks (split == fused math)
    gt = np.asarray(data.poses_gt[:len(est)])
    assert np.linalg.norm(np.asarray(est)[-1][:2] - gt[-1][:2]) < 0.5


def test_host_reorg_matches_device_cond():
    """r3 host-gated re-orgs (pool-free hot step): bitwise-equal
    trajectory and map content vs the device-cond step, with zero escaped
    updates, on a run long enough to re-org several times."""
    kw = dict(n_steps=150, seed=1)
    est_h, _, _, slam_h = run_sim_slam(resident_extra_patches=1,
                                       host_reorg=True, **kw)
    est_d, _, _, slam_d = run_sim_slam(resident_extra_patches=1,
                                       host_reorg=False, **kw)
    assert slam_h._host_reorg and not slam_d._host_reorg
    assert slam_h.escaped_count() == 0
    np.testing.assert_array_equal(est_h, est_d)
    ch, cd = _patch_content(slam_h), _patch_content(slam_d)
    assert set(ch) == set(cd)
    for key in ch:
        for x, y in zip(ch[key], cd[key]):
            np.testing.assert_array_equal(x, y)

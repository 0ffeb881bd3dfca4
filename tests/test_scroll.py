"""resident_scroll (band re-org) vs the full flush+regather re-org.

The scroll must produce bit-identical resident window grids: surviving
cells ride a roll (and the full re-org's flush->gather round trip is an
exact bijection), entering cells read the same pool content, and the
trailing-band flush is a superset of the exiting patches. The pool
itself may differ (stale interior copies, different slot assignment), so
map content is compared via a full flush + canonical cell probes.
"""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos.pf_slam2d import PFSlam2DOptions
from iris_lama_tpu.core import lie
from iris_lama_tpu.sdm import mapping
from iris_lama_tpu.sdm import pool as pool_mod


def _cfg():
    return PFSlam2DOptions(resolution=0.1, patch_size=16, max_range=3.0,
                           capacity=512, l2_max=0.4).mapping_config()


def _scan(pose_xy):
    """A ring of hit points around the pose (world frame handled by
    resident_update's pose argument; these are sensor-frame points)."""
    ang = np.linspace(0, 2 * np.pi, 90, endpoint=False)
    pts = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang),
                    np.zeros_like(ang)], axis=-1).astype(np.float32)
    mask = np.ones(90, bool)
    origin = np.zeros(3, np.float32)
    return jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(origin)


def _build_state(cfg, poses):
    geo = cfg.geometry
    m = mapping.slam_map_init(cfg)
    anchor = geo.w2m(jnp.asarray(poses[0][:2]))
    org = mapping.resident_org(cfg, anchor)
    occ, vis, dist = mapping.resident_gather(m, cfg, org)
    for p in poses:
        pose = jnp.asarray([np.cos(p[2]), np.sin(p[2]), p[0], p[1]],
                           jnp.float32)
        pts, mask, o = _scan(p)
        occ, vis, dist, _ = mapping.resident_update(cfg, org, occ, vis,
                                                    dist, pose, pts, mask, o)
    return m, org, occ, vis, dist


def _probe(m, cfg, cells):
    geo = cfg.geometry
    keys = geo.m2p(cells)
    slots = pool_mod.table_lookup(m.table, keys)
    local = geo.m2local(cells)
    safe = jnp.where(slots >= 0, slots, m.occupied.shape[0] - 1)
    pick = lambda a, d: jnp.where(
        slots >= 0, a[safe, local[..., 1], local[..., 0]], d)
    return (pick(m.occupied, 0), pick(m.visited, 0),
            pick(m.dist, jnp.float32(cfg.distance.max_dist)))


def test_scroll_matches_full_reorg():
    cfg = _cfg()
    geo = cfg.geometry
    poses = [(0.0, 0.0, 0.1), (0.8, 0.3, 0.2), (1.6, 0.7, 0.3)]
    m, org, occ, vis, dist = _build_state(cfg, poses)

    # move the window ~1-2 patches toward the traveled direction
    anchor = geo.w2m(jnp.asarray([2.4, 1.1], jnp.float32))
    new_org = mapping.resident_org(cfg, anchor)
    kp = 3
    shift_p = np.asarray(new_org - org) >> geo.log2dim
    assert 0 < np.max(np.abs(shift_p)) <= kp, shift_p

    # full re-org
    m_full = mapping.resident_flush(m, cfg, org, occ, vis, dist)
    occ_f, vis_f, dist_f = mapping.resident_gather(m_full, cfg, new_org)

    # scroll
    m_s, occ_s, vis_s, dist_s = mapping.resident_scroll(
        m, cfg, org, occ, vis, dist, new_org, kp)

    assert occ_s.dtype == occ_f.dtype and dist_s.dtype == dist_f.dtype
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_s))
    np.testing.assert_array_equal(np.asarray(vis_f), np.asarray(vis_s))
    np.testing.assert_array_equal(np.asarray(dist_f), np.asarray(dist_s))

    # map content parity after settling both (probe a grid of cells
    # covering everything ever touched; slot assignment may differ)
    m_s2 = mapping.resident_flush(m_s, cfg, new_org, occ_s, vis_s, dist_s)
    m_f2 = mapping.resident_flush(m_full, cfg, new_org, occ_f, vis_f,
                                  dist_f)
    xs = np.arange(-60, 100, dtype=np.int32)
    cells = jnp.asarray(np.stack(np.meshgrid(xs, xs), axis=-1)
                        .reshape(-1, 2))
    for a, b in zip(_probe(m_f2, cfg, cells), _probe(m_s2, cfg, cells)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_driver_scroll_parity():
    """PFSlam2D with scroll re-orgs must be bit-identical to full
    re-orgs: both recenter at the same deadline and a re-org (either
    kind) is a semantic no-op on window content."""
    import jax

    from iris_lama_tpu.algos import pf_slam2d as pf
    from iris_lama_tpu.core.pose import Pose2D
    from iris_lama_tpu.utils import simulator

    data = simulator.simulate(simulator.SimConfig(
        n_steps=80, seed=3,
        laser=simulator.LaserSpec(n_beams=120, max_range=8.0),
        odom_trans_noise=0.02, odom_rot_noise=0.004))

    def run(scroll):
        opts = pf.PFSlam2DOptions(
            particles=6, resolution=0.1, patch_size=16, max_range=8.0,
            capacity=1024, trans_thresh=0.3, rot_thresh=0.3, max_iter=30,
            seed=7, resident_extra_patches=2, scroll_reorg=scroll)
        slam = pf.PFSlam2D(opts)
        slam.set_prior(Pose2D(*data.poses_gt[0]))
        est = []
        for k in range(len(data.clouds)):
            if slam.update(data.clouds[k], data.odometry[k],
                           data.timestamps[k]):
                est.append(np.asarray(slam.pset.pose))
        return np.asarray(est), slam

    e_full, s_full = run(False)
    e_scroll, s_scroll = run(True)
    assert s_scroll.options.scroll_kp > 0 and s_scroll._pf_scroll_m > 0
    assert s_scroll._n_reorgs > 0
    np.testing.assert_array_equal(e_full, e_scroll)

    m_f = s_full.particle_map(0)
    m_s = s_scroll.particle_map(0)
    geo = s_full.options.mapping_config().geometry
    xs = np.arange(-80, 120, dtype=np.int32)
    cells = jnp.asarray(np.stack(np.meshgrid(xs, xs), axis=-1)
                        .reshape(-1, 2))

    def probe(m):
        keys = geo.m2p(cells)
        slots = pool_mod.table_lookup(m.table, keys)
        local = geo.m2local(cells)
        safe = jnp.where(slots >= 0, slots, m.occupied.shape[0] - 1)
        pick = lambda a: jnp.where(
            slots >= 0, a[safe, local[..., 1], local[..., 0]], 0)
        return np.asarray(pick(m.occupied)), np.asarray(pick(m.visited))

    for a, b in zip(probe(m_f), probe(m_s)):
        np.testing.assert_array_equal(a, b)


def test_scroll_zero_and_negative_shift():
    cfg = _cfg()
    geo = cfg.geometry
    poses = [(0.0, 0.0, 0.0), (-0.9, -0.5, -0.2)]
    m, org, occ, vis, dist = _build_state(cfg, poses)
    anchor = geo.w2m(jnp.asarray([-2.2, -1.8], jnp.float32))
    new_org = mapping.resident_org(cfg, anchor)
    kp = 3
    shift_p = np.asarray(new_org - org) >> geo.log2dim
    assert np.max(np.abs(shift_p)) <= kp, shift_p

    m_full = mapping.resident_flush(m, cfg, org, occ, vis, dist)
    occ_f, vis_f, dist_f = mapping.resident_gather(m_full, cfg, new_org)
    m_s, occ_s, vis_s, dist_s = mapping.resident_scroll(
        m, cfg, org, occ, vis, dist, new_org, kp)
    np.testing.assert_array_equal(np.asarray(occ_f), np.asarray(occ_s))
    np.testing.assert_array_equal(np.asarray(vis_f), np.asarray(vis_s))
    np.testing.assert_array_equal(np.asarray(dist_f), np.asarray(dist_s))

    # shift = 0 must be the identity on the window
    m_s0, occ0, vis0, dist0 = mapping.resident_scroll(
        m, cfg, org, occ, vis, dist, org, kp)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ))
    np.testing.assert_array_equal(np.asarray(vis0), np.asarray(vis))
    np.testing.assert_array_equal(np.asarray(dist0), np.asarray(dist))

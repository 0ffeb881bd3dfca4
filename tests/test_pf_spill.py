"""PF per-particle spill tier (use_compression): bounded live pool with
bit-exact output vs the unbounded run (VERDICT r2 #4; reference parity:
src/pf_slam2d.cpp:201-204 wires the compressor into every particle's maps).
"""

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket


def _corridor(n_steps):
    return simulator.simulate(simulator.SimConfig(
        n_steps=n_steps, seed=4, world="corridor",
        laser=simulator.LaserSpec(n_beams=120, max_range=8.0),
        odom_trans_noise=0.005, odom_rot_noise=0.001))


def _opts(**kw):
    base = dict(particles=4, resolution=0.1, patch_size=16, max_range=8.0,
                trans_thresh=0.5, rot_thresh=0.5, max_iter=50, seed=77,
                resident_extra_patches=1)
    base.update(kw)
    return pf.PFSlam2DOptions(**base)


def _run(data, staged, opts, n_use):
    f = pf.PFSlam2D(opts)
    f.set_prior(Pose2D(*data.poses_gt[0]))
    for k in range(n_use):
        f.update_prepadded(*staged[k], data.odometry[k])
    f._flush_motion()
    return f


def _map_content(state, cfg):
    """{key: blocks} of non-default patches (slot-order independent)."""
    from iris_lama_tpu.sdm import pool as pool_mod
    keys, active = (np.asarray(a) for a in pool_mod.active_keys(state.table))
    occ, vis, dist = (np.asarray(state.occupied), np.asarray(state.visited),
                      np.asarray(state.dist))
    max_dist = np.float32(cfg.distance.max_dist)
    out = {}
    for s in np.nonzero(active)[0]:
        blk = (occ[s], vis[s], dist[s])
        if blk[0].any() or blk[1].any() or (blk[2] != max_dist).any():
            out[int(keys[s])] = blk
    return out


def test_pf_spill_bounded_bit_exact():
    """use_compression=True with a pool too small for the whole corridor:
    spills + refills fire, the pool stays bounded (no overflow), and poses,
    weights, AND the best particle's full merged map are bit-equal to the
    unbounded run."""
    n_use = 260
    data = _corridor(400)
    nb = beam_bucket(120)
    staged = []
    for k in range(n_use):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))

    a = _run(data, staged, _opts(capacity=4096), n_use)
    b = _run(data, staged, _opts(capacity=768, use_compression=True), n_use)

    sp = b._pf_spill
    assert sp is not None and sp.spills >= 1, "pool pressure never spilled"
    assert int(np.asarray(pf.pf_patch_counts(b.pset.maps.table)).max()) \
        <= sp.high
    assert int(np.asarray(b.pset.maps.table.overflow).max()) == 0

    pa, pb = jax.device_get(a.pset), jax.device_get(b.pset)
    np.testing.assert_array_equal(pb.pose, pa.pose)
    np.testing.assert_array_equal(pb.weight, pa.weight)
    np.testing.assert_array_equal(np.asarray(pb.res_dist),
                                  np.asarray(pa.res_dist))

    # full merged map of the best particle == unbounded particle map
    i = a.best_particle_idx()
    assert i == b.best_particle_idx()
    cfg = _opts(capacity=4096).mapping_config()
    ca = _map_content(a.particle_map(i), cfg)
    mb, cfg_b = b.full_particle_map(i)
    cb = _map_content(mb, cfg_b)
    assert set(ca) == set(cb)
    for k in ca:
        for x, y in zip(ca[k], cb[k]):
            np.testing.assert_array_equal(x, y)


def test_pf_spill_smd_roundtrip(tmp_path):
    """.smd export of the merged device+store map works (VERDICT r2 #4)."""
    from iris_lama_tpu.sdm import io as sdm_io

    n_use = 260
    data = _corridor(400)
    nb = beam_bucket(120)
    staged = []
    for k in range(n_use):
        p, m, o = pad_scan(data.clouds[k], nb)
        staged.append((jnp.asarray(p), jnp.asarray(m), jnp.asarray(o)))
    b = _run(data, staged, _opts(capacity=768, use_compression=True), n_use)
    assert b._pf_spill.spills >= 1
    state, cfg = b.full_particle_map()
    path = str(tmp_path / "pf_merged.smd")
    sdm_io.write_distance_map(state, cfg.geometry, cfg.l2_max, path)
    state2, dcfg2 = sdm_io.read_distance_map(path)
    # the merged map (device + spilled patches) made it through the file:
    # more patches than live on the (bounded) device pool alone
    n_live = int(np.asarray(
        b.particle_map(b.best_particle_idx()).table.num_patches()))
    n2 = int(np.asarray(state2.table.num_patches()))
    assert n2 > n_live, (n2, n_live)

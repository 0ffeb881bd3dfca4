"""PFSlam2D tests: end-to-end tracking, determinism, and sharded execution
on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core.pose import Pose2D
from iris_lama_tpu.utils import simulator
from iris_lama_tpu.utils.evaluation import ate_rmse


def _sim(n_steps=100, seed=2):
    cfg = simulator.SimConfig(
        n_steps=n_steps, seed=seed,
        laser=simulator.LaserSpec(n_beams=120, max_range=8.0),
        odom_trans_noise=0.02, odom_rot_noise=0.004)
    return simulator.simulate(cfg)


def _opts(**kw):
    base = dict(particles=8, resolution=0.1, patch_size=16, max_range=8.0,
                capacity=1024, trans_thresh=0.3, rot_thresh=0.3,
                max_iter=30, seed=7)
    base.update(kw)
    return pf.PFSlam2DOptions(**base)


def run_pf(data, opts):
    slam = pf.PFSlam2D(opts)
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    est, gt, odom = [], [], []
    for k in range(len(data.clouds)):
        if slam.update(data.clouds[k], data.odometry[k], data.timestamps[k]):
            est.append(slam.pose().xyr())
            gt.append(data.poses_gt[k])
            odom.append(data.odometry[k].xyr())
    return np.asarray(est), np.asarray(gt), np.asarray(odom), slam


def test_pf_tracks_ground_truth():
    data = _sim()
    est, gt, odom, slam = run_pf(data, _opts())
    assert len(est) > 10
    ate = ate_rmse(est, gt)
    ate_odom = ate_rmse(odom, gt)
    # coarse settings (0.1 m cells, 8 particles): bound is ~3 cells — the
    # realization depends on the PRNG stream, which shifts whenever key
    # handling is refactored (the filter is stochastic; determinism and the
    # unit oracles pin the semantics, this pins gross tracking quality)
    assert ate < 0.30, (ate, ate_odom)
    assert slam._last_info["overflow"] == 0


def test_pf_deterministic_with_seed():
    data = _sim(n_steps=40)
    est1, _, _, _ = run_pf(data, _opts(seed=123))
    est2, _, _, _ = run_pf(data, _opts(seed=123))
    np.testing.assert_allclose(est1, est2, atol=1e-6)


def test_pf_resampling_happens():
    data = _sim(n_steps=80)
    slam = pf.PFSlam2D(_opts(meas_sigma_gain=1.0))
    slam.set_prior(Pose2D(*data.poses_gt[0]))
    resampled = False
    for k in range(len(data.clouds)):
        if slam.update(data.clouds[k], data.odometry[k], 0.0):
            if slam._last_info.get("resampled"):
                resampled = True
    # weights diverge eventually with a sharp likelihood -> resample fired
    assert resampled


def test_pf_sharded_step_runs_on_mesh():
    from iris_lama_tpu.parallel import pf_sharding

    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    data = _sim(n_steps=6)
    opts = _opts(particles=8, capacity=512)
    mesh = pf_sharding.particle_mesh()

    pset = pf.particles_init(opts, jnp.asarray(
        Pose2D(*data.poses_gt[0]).se2_array()))
    pset = pf_sharding.shard_particles(pset, mesh)

    from iris_lama_tpu.utils.cloud import pad_scan
    points, mask, origin = pad_scan(data.clouds[0], 128)

    first = jax.jit(lambda ps, p, m, o: pf.pf_first_step(opts, ps, p, m, o))
    pset = first(pset, jnp.asarray(points), jnp.asarray(mask),
                 jnp.asarray(origin))

    update = pf_sharding.make_sharded_update(opts, mesh)
    key = jax.random.PRNGKey(0)
    points, mask, origin = pad_scan(data.clouds[3], 128)
    pset2, info = update(pset, key, jnp.asarray(points), jnp.asarray(mask),
                         jnp.asarray(origin))
    jax.block_until_ready(pset2.pose)
    assert pset2.pose.shape == (8, 4)
    assert np.isfinite(np.asarray(pset2.pose)).all()
    # particle axis is actually sharded over the mesh
    shard_devs = {s.device for s in pset2.pose.addressable_shards}
    assert len(shard_devs) == 8

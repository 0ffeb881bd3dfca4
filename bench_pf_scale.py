"""Scaling curve: sharded 512-particle PF update over a 1/2/4/8-device
virtual CPU mesh (VERDICT r3 #2 — the in-image stand-in for multi-chip
scaling efficiency; real multi-chip hardware is not exposed here).

Strong scaling on a FIXED 512-particle filter: efficiency(N) =
t(1) / (N * t(N)). The sharded step is the legacy pool-per-update PF
step (`pf_update_step`) — the same program the driver dry run compiles
across the mesh (__graft_entry__.dryrun_multichip); particle state stays
sharded across updates, normalize/Neff ride psum, resampling gathers
lineage over the mesh axis.

Prints one JSON line like bench.py. CPU times are NOT TPU times — only
the relative efficiency is the result here.
"""

import json
import os
import sys
import time

import numpy as np

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")


def main():
    import jax
    # the ambient env pins JAX_PLATFORMS=axon and a sitecustomize imports
    # jax first — override via config (env vars are too late; conftest.py
    # has the same note)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from iris_lama_tpu.algos import pf_slam2d as pf
    from iris_lama_tpu.parallel import pf_sharding
    from iris_lama_tpu.utils import simulator
    from iris_lama_tpu.utils.cloud import pad_scan, beam_bucket

    # 512 is the BASELINE #5 scale but costs ~10+ min/mesh-size on the
    # CPU stand-in; IRIS_PF_SCALE_PARTICLES=128 gives the same strong-
    # scaling curve in ~1/4 the time
    n_particles = int(os.environ.get("IRIS_PF_SCALE_PARTICLES", "512"))
    n_updates = 3
    data = simulator.simulate(simulator.SimConfig(
        n_steps=n_updates + 1, seed=5,
        laser=simulator.LaserSpec(n_beams=720, max_range=10.0)))
    nb = beam_bucket(720)
    staged = [pad_scan(c, nb) for c in data.clouds]

    opts = pf.PFSlam2DOptions(particles=n_particles, resolution=0.05,
                              max_range=10.0, capacity=512,
                              max_iter=16, seed=11,
                              resident_window=False)
    prior = jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32)

    times = {}
    for nd in (1, 2, 4, 8):
        mesh = pf_sharding.particle_mesh(jax.devices()[:nd])
        # the PINNED factories matter: an unconstrained jit lets GSPMD
        # replicate outputs and all-gather the particle maps every update
        # (measured: mesh 2 ran 2.5x SLOWER than mesh 1)
        step = pf_sharding.make_sharded_update(opts, mesh)
        motion = pf_sharding.make_sharded_motion(opts, mesh)
        key = jax.random.PRNGKey(7)

        def run_once():
            pset = pf.particles_init(opts, prior)
            pset = pf.pf_first_step(opts, pset, jnp.asarray(staged[0][0]),
                                    jnp.asarray(staged[0][1]),
                                    jnp.asarray(staged[0][2]))
            # shard AFTER the (unsharded) first-scan init so placements
            # match the pinned in_shardings of the sharded step
            pset = pf_sharding.shard_particles(pset, mesh)
            k = key
            t0 = None
            for i in range(1, n_updates + 1):
                if i == 2:           # first sharded update carries compile
                    jax.block_until_ready(pset.pose)
                    t0 = time.perf_counter()
                k, k1, k2 = jax.random.split(k, 3)
                odelta = jnp.asarray(
                    (data.odometry[i - 1] - data.odometry[i]).se2_array())
                pose = motion(pset.pose, k1, odelta)
                pset = pset._replace(pose=pose)
                pset, _ = step(pset, k2, jnp.asarray(staged[i][0]),
                               jnp.asarray(staged[i][1]),
                               jnp.asarray(staged[i][2]))
            jax.block_until_ready(pset.pose)
            return (time.perf_counter() - t0) / (n_updates - 1)

        run_once()                       # compile pass
        times[nd] = run_once()
        print(f"# mesh {nd}: {times[nd]:.3f} s/update", file=sys.stderr)

    eff = {nd: times[1] / (nd * times[nd]) for nd in times}
    print(json.dumps({
        "metric": "pf512_scaling_efficiency_8dev",
        "value": round(eff[8], 3),
        "unit": "t1/(N*tN)",
        "vs_baseline": round(eff[8] / 0.8, 2),   # target >= 0.8
        "extra": {"per_update_s": {str(k): round(v, 3)
                                   for k, v in times.items()},
                  "efficiency": {str(k): round(v, 3)
                                 for k, v in eff.items()},
                  "particles": n_particles,
                  "platform": jax.default_backend()},
    }))


if __name__ == "__main__":
    sys.exit(main())

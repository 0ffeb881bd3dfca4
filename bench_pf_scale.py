"""Sharded-PF overhead on a 1/2/4/8-device virtual CPU mesh (VERDICT
r3 #2 — the in-image stand-in; real multi-chip hardware is not exposed
here).

WHAT THIS CAN AND CANNOT MEASURE: the 8 "devices" are one host CPU —
XLA's single-device CPU executable already uses every physical core, so
wall-clock can NOT improve with mesh size and a strong-scaling
"efficiency" number would be meaningless by construction (measured:
per-update times are flat, 17.6/15.5/15.8/16.2 s at mesh 1/2/4/8).
What the virtual mesh DOES measure is the **overhead of the partitioned
program**: GSPMD sharding of every particle-axis array, the psum
weight/Neff reductions, and the resample lineage gathers, at identical
physical compute. t(N)/t(1) ~ 1 means the sharded program + collectives
cost nothing over the unsharded one — which is what transfers to real
chips, where the per-device particle count then drops N-fold.

The step is the pinned-sharding factory (parallel/pf_sharding.py), the
same path `__graft_entry__.dryrun_multichip` compiles and
tests/test_pf_slam2d proves bit-equal to the unsharded filter.

Prints one JSON line like bench.py.
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

    # 512 is the BASELINE #5 scale but costs ~15+ min/mesh-size on the
    # CPU stand-in; 128 gives the same overhead readout in ~1/4 the time
    n_particles = int(os.environ.get("IRIS_PF_SCALE_PARTICLES", "128"))
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

    overhead = {nd: times[nd] / times[1] for nd in times}
    print(json.dumps({
        "metric": "pf_sharding_overhead_8dev",
        "value": round(overhead[8], 3),
        "unit": "t8/t1 (1.0 = free sharding)",
        "vs_baseline": round(1.0 / max(overhead[8], 1e-9), 2),
        "extra": {"per_update_s": {str(k): round(v, 3)
                                   for k, v in times.items()},
                  "overhead": {str(k): round(v, 3)
                               for k, v in overhead.items()},
                  "particles": n_particles,
                  "platform": jax.default_backend(),
                  "note": "virtual devices share one host CPU; this "
                          "measures partitioned-program overhead, not "
                          "parallel speedup"},
    }))


if __name__ == "__main__":
    sys.exit(main())

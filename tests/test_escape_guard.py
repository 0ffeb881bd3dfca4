"""Escape-guard reaction ladder (r5 calibration).

The guard's failure modes were measured on the TPU: absolute tolerances
let lone diverged particles walk the re-org trigger into the
device-cond collapse (corridor ~24 vs ~60 scans/s; 512p 1.45 vs 4.4
up/s), so the reaction is now: tolerate a <=25% diverged tail, absorb
up to two bursty harvests (a harvest always precedes a re-org dispatch,
which already recenters), escalate on the third, and recover the
trigger after four clean harvests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core.pose import Pose2D


def _driver():
    opts = pf.PFSlam2DOptions(particles=30, resolution=0.1, patch_size=16,
                              max_range=8.0, capacity=1024, seed=7,
                              resident_extra_patches=2)
    slam = pf.PFSlam2D(opts)
    slam.set_prior(Pose2D(0.0, 0.0, 0.0))
    assert slam._pf_trigger_m > 0.5     # host-gated re-orgs active
    return slam


def _harvest(slam, esc):
    slam._esc_stash = jnp.int32(esc)
    slam._pf_harvest_escapes()


def test_tolerated_tail_changes_nothing():
    slam = _driver()
    t0 = slam._pf_trigger_m
    for _ in range(10):
        _harvest(slam, max(1, int(0.25 * slam.options.particles)))
    assert slam._pf_trigger_m == t0
    assert slam.options.host_reorg


def test_burst_strikes_then_escalation():
    slam = _driver()
    t0 = slam._pf_trigger_m
    with pytest.warns(UserWarning, match="strike 1/3"):
        _harvest(slam, 20)
    with pytest.warns(UserWarning, match="strike 2/3"):
        _harvest(slam, 20)
    assert slam._pf_trigger_m == t0      # first two bursts only recenter
    with pytest.warns(UserWarning, match="tightening"):
        _harvest(slam, 20)
    assert slam._pf_trigger_m < t0


def test_clean_harvests_recover_trigger():
    slam = _driver()
    t0 = slam._pf_trigger_m
    for _ in range(3):
        with pytest.warns(UserWarning):
            _harvest(slam, 20)
    assert slam._pf_trigger_m < t0
    tightened = slam._pf_trigger_m
    for _ in range(4):
        _harvest(slam, 0)
    assert slam._pf_trigger_m > tightened
    assert slam._pf_trigger_m <= t0


def test_scroll_deadline_tracks_trigger():
    slam = _driver()
    if slam._pf_scroll_m == 0:
        pytest.skip("scroll not eligible at this config")
    for _ in range(3):
        with pytest.warns(UserWarning):
            _harvest(slam, 20)
    assert slam._pf_scroll_m == slam._pf_trigger_m


def test_persistent_bursts_reach_device_cond_fallback():
    slam = _driver()
    with pytest.warns(UserWarning):
        for _ in range(40):
            if not slam.options.host_reorg:
                break
            _harvest(slam, 20)
    assert not slam.options.host_reorg   # final safety net engaged

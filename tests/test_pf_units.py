"""PF unit oracles: motion noise statistics, normalize/Neff, systematic
resampling vs a literal numpy port of the reference loops
(pf_slam2d.cpp:365-391, 511-574)."""

import jax
import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos import pf_slam2d as pf
from iris_lama_tpu.core import lie

rng = np.random.default_rng(44)


def test_draw_from_motion_statistics():
    opts = pf.PFSlam2DOptions(particles=20000, srr=0.1, str_=0.2, stt=0.1,
                              srt=0.2)
    odelta = jnp.asarray(lie.se2(0.3, 0.1, 0.2))
    poses = jnp.broadcast_to(jnp.asarray([0, 0, 1, 0], jnp.float32),
                             (20000, 4))
    out = np.asarray(pf.draw_from_motion(opts, jax.random.PRNGKey(0),
                                         odelta, poses))
    # composed pose = identity * noisy delta -> translation == noisy (x, y)
    dx, dy, drot = 0.3, 0.1, 0.2
    sxy = 0.3 * opts.stt
    sig_x = opts.stt * abs(dx) + opts.str_ * abs(drot) + sxy * abs(dy)
    sig_y = opts.stt * abs(dy) + opts.str_ * abs(drot) + sxy * abs(dx)
    sig_r = opts.srr * abs(drot) + opts.srt * np.hypot(dx, dy)
    assert abs(out[:, 0].mean() - dx) < 4 * sig_x / np.sqrt(20000) + 1e-3
    assert abs(out[:, 0].std() - sig_x) < 0.1 * sig_x + 1e-3
    assert abs(out[:, 1].mean() - dy) < 4 * sig_y / np.sqrt(20000) + 1e-3
    assert abs(out[:, 1].std() - sig_y) < 0.1 * sig_y + 1e-3
    theta = np.arctan2(out[:, 3], out[:, 2])
    assert abs(theta.mean() - drot) < 4 * sig_r / np.sqrt(20000) + 1e-3
    assert abs(theta.std() - sig_r) < 0.1 * sig_r + 1e-3


def reference_normalize(weights, gain_sigma, n):
    """numpy port of PFSlam2D::normalize (pf_slam2d.cpp:511-535)."""
    gain = 1.0 / (gain_sigma * n)
    max_l = max(weights)
    nw = np.exp(gain * (np.asarray(weights) - max_l))
    nw = nw / nw.sum()
    neff = 1.0 / np.sum(nw * nw)
    return nw, neff


def reference_resample(normalized, u):
    """numpy port of PFSlam2D::resample (pf_slam2d.cpp:537-554)."""
    n = len(normalized)
    interval = 1.0 / n
    target = interval * u
    cw = 0.0
    out = np.zeros(n, np.int64)
    k = 0
    for i, w in enumerate(normalized):
        cw += w
        while cw > target and k < n:
            out[k] = i
            k += 1
            target += interval
    return out


def test_normalize_and_neff_match_reference():
    w = rng.normal(-50, 10, 32)
    nw_ref, neff_ref = reference_normalize(w, 3.0, 32)
    gain = 1.0 / (3.0 * 32)
    wj = jnp.asarray(w, jnp.float32)
    nw = jnp.exp(gain * (wj - jnp.max(wj)))
    nw = nw / jnp.sum(nw)
    neff = 1.0 / jnp.sum(nw * nw)
    np.testing.assert_allclose(np.asarray(nw), nw_ref, rtol=1e-5)
    np.testing.assert_allclose(float(neff), neff_ref, rtol=1e-5)


def test_systematic_resample_matches_reference():
    for trial in range(5):
        n = 16
        nw = rng.random(n)
        nw = nw / nw.sum()
        u = float(rng.random())
        expect = reference_resample(nw, u)
        # the vectorized searchsorted formulation from pf_update_step
        targets = (np.arange(n) + u) / n
        cumw = np.cumsum(nw)
        got = np.searchsorted(cumw, targets, side="right")
        got = np.clip(got, 0, n - 1)
        np.testing.assert_array_equal(got, expect, err_msg=f"trial {trial}")

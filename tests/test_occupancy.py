"""Standalone occupancy map tests vs sequential ports of the reference
set/is semantics (simple/frequency/probabilistic _occupancy_map.cpp)."""

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.sdm import occupancy as occ
from iris_lama_tpu.sdm.geometry import MapGeometry

rng = np.random.default_rng(55)
GEO = MapGeometry(resolution=0.1, log2dim=4)


def cells_of(points):
    return GEO.w2m(jnp.asarray(np.asarray(points, np.float32)))


def test_simple_set_and_query():
    state = occ.simple_init(occ.OccupancyConfig(GEO, 64))
    free_pts = [[0.0, 0.0], [1.0, 1.0]]
    occ_pts = [[2.0, 2.0]]
    state = occ.simple_set(state, GEO, cells_of(free_pts), -1)
    state = occ.simple_set(state, GEO, cells_of(occ_pts), 1)
    assert bool(occ.simple_is_free(state, GEO, cells_of([[0.0, 0.0]]))[0])
    assert bool(occ.simple_is_occupied(state, GEO, cells_of([[2.0, 2.0]]))[0])
    assert bool(occ.simple_is_unknown(state, GEO, cells_of([[5.0, 5.0]]))[0])
    # unknown for unallocated patches too (const get -> null, map.cpp:414)
    assert not bool(occ.simple_is_free(state, GEO, cells_of([[9.0, 9.0]]))[0])


def test_frequency_counts_and_threshold():
    state = occ.frequency_init(occ.OccupancyConfig(GEO, 64))
    c = cells_of([[1.0, 1.0]])
    # 1 hit -> occupied (1/1 > 0.25)
    state = occ.frequency_apply_counts(state, GEO, c, jnp.asarray([1]),
                                       jnp.asarray([1]))
    assert bool(occ.frequency_is_occupied(state, GEO, c)[0])
    # +4 free visits -> 1/5 < 0.25 -> free
    state = occ.frequency_apply_counts(state, GEO, c, jnp.asarray([0]),
                                       jnp.asarray([4]))
    assert bool(occ.frequency_is_free(state, GEO, c)[0])
    np.testing.assert_allclose(float(occ.frequency_prob(state, GEO, c)[0]),
                               1.0 / 5.0)
    # boundary: occ/vis == 0.25 exactly -> neither free nor occupied
    state2 = occ.frequency_init(occ.OccupancyConfig(GEO, 64))
    state2 = occ.frequency_apply_counts(state2, GEO, c, jnp.asarray([1]),
                                        jnp.asarray([4]))
    assert not bool(occ.frequency_is_occupied(state2, GEO, c)[0])
    assert not bool(occ.frequency_is_free(state2, GEO, c)[0])


def test_frequency_prune():
    state = occ.frequency_init(occ.OccupancyConfig(GEO, 64))
    c = cells_of([[1.0, 1.0], [2.0, 2.0]])
    state = occ.frequency_apply_counts(state, GEO, c, jnp.asarray([1, 2]),
                                       jnp.asarray([1, 2]))
    state = occ.frequency_prune(state)
    # single-visit cell dropped; double-visit kept
    assert bool(occ.frequency_is_unknown(state, GEO, cells_of([[1.0, 1.0]]))[0])
    assert bool(occ.frequency_is_occupied(state, GEO, cells_of([[2.0, 2.0]]))[0])


def test_probabilistic_logodds():
    state = occ.probabilistic_init(occ.OccupancyConfig(GEO, 64))
    c = cells_of([[1.0, 1.0]])
    state = occ.probabilistic_apply(state, GEO, c, jnp.asarray([1]),
                                    jnp.asarray([0]))
    # one hit: logodds = log(0.7/0.3) -> prob 0.7
    np.testing.assert_allclose(float(occ.probabilistic_prob(state, GEO, c)[0]),
                               0.7, atol=1e-5)
    assert bool(occ.probabilistic_is_occupied(state, GEO, c)[0])
    # many misses clamp at logodds(0.12)
    state = occ.probabilistic_apply(state, GEO, c, jnp.asarray([0]),
                                    jnp.asarray([50]))
    np.testing.assert_allclose(float(occ.probabilistic_prob(state, GEO, c)[0]),
                               0.12, atol=1e-5)
    assert bool(occ.probabilistic_is_free(state, GEO, c)[0])


def _seq_per_visit(lo0, hits, misses):
    """Sequential per-visit oracle (probabilistic_occupancy_map.cpp:82-107),
    canonical order: all hits then all misses (see probabilistic_saturate)."""
    lo = float(lo0)
    for _ in range(int(hits)):
        lo = min(lo + occ.PROB_HIT, occ.PROB_CLAMP_MAX)
    for _ in range(int(misses)):
        lo = max(lo + occ.PROB_MISS, occ.PROB_CLAMP_MIN)
    return lo


def test_probabilistic_per_visit_clamp_oracle():
    """Saturating closed form == per-visit sequential clamping, including
    saturated cells receiving mixed evidence over many scans."""
    r = np.random.default_rng(7)
    lo = np.zeros(64, np.float32)
    for _ in range(40):
        hits = r.integers(0, 8, size=64)
        misses = r.integers(0, 8, size=64)
        got = np.asarray(occ.probabilistic_saturate(
            jnp.asarray(lo), jnp.asarray(hits), jnp.asarray(misses)))
        want = np.array([_seq_per_visit(lo[i], hits[i], misses[i])
                         for i in range(64)], np.float32)
        np.testing.assert_allclose(got, want, atol=1e-5)
        lo = got


def test_probabilistic_saturated_mixed_desaturates():
    """A cell pinned at clamp_max that receives 1 hit + 1 miss in one scan
    must land BELOW clamp_max (per-visit clamp absorbs the hit at the rail);
    the old end-of-sum clamp incorrectly kept it saturated."""
    lo = jnp.asarray([occ.PROB_CLAMP_MAX])
    got = float(occ.probabilistic_saturate(lo, jnp.asarray([1]),
                                           jnp.asarray([1]))[0])
    np.testing.assert_allclose(got, occ.PROB_CLAMP_MAX + occ.PROB_MISS,
                               atol=1e-6)


def test_probabilistic_apply_duplicate_cells():
    """Duplicate cells in one apply() accumulate counts before saturating."""
    state = occ.probabilistic_init(occ.OccupancyConfig(GEO, 64))
    c = cells_of([[1.0, 1.0], [1.0, 1.0]])
    state = occ.probabilistic_apply(state, GEO, c, jnp.asarray([1, 2]),
                                    jnp.asarray([0, 1]))
    want = _seq_per_visit(0.0, 3, 1)
    one = cells_of([[1.0, 1.0]])
    lo = float(np.log(1.0 / (1.0 / float(
        occ.probabilistic_prob(state, GEO, one)[0]) - 1.0)))
    np.testing.assert_allclose(lo, want, atol=1e-5)

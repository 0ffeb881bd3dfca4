"""Raycast closed form vs a direct Python port of the reference walk.

Oracle: literal re-execution of the error-accumulation loop in
src/sdm/map.cpp:198-227.
"""

import numpy as np

from iris_lama_tpu.sdm.raycast import ray_cells

rng = np.random.default_rng(7)


def reference_ray(start, end):
    """Python port of lama::Map::computeRay (src/sdm/map.cpp:198-227)."""
    start = np.asarray(start, np.int64)
    end = np.asarray(end, np.int64)
    if np.array_equal(start, end):
        return []
    error = np.zeros(2, np.int64)
    coord = start.copy()
    delta = end - coord
    step = np.where(delta < 0, -1, 1)
    delta = np.abs(delta)
    n = delta.max()
    out = []
    for _ in range(n - 1):
        error += delta
        for j in range(2):
            if (error[j] << 1) < n:
                continue
            coord[j] += step[j]
            error[j] -= n
        out.append(coord.copy())
    return out


def check_batch(starts, ends, T):
    cells, mask = ray_cells(starts, ends, T)
    cells, mask = np.asarray(cells), np.asarray(mask)
    for b in range(len(starts)):
        expect = reference_ray(starts[b], ends[b])
        got = cells[b][mask[b]]
        assert len(got) == len(expect), (starts[b], ends[b], len(got), len(expect))
        if expect:
            np.testing.assert_array_equal(got, np.stack(expect))


def test_axis_aligned_and_diagonal():
    starts = np.array([[10, 10]] * 6, np.int32)
    ends = np.array([[20, 10], [10, 20], [0, 10], [10, 0],
                     [20, 20], [0, 0]], np.int32)
    check_batch(starts, ends, 32)


def test_degenerate_same_cell():
    cells, mask = ray_cells(np.array([[5, 5]], np.int32),
                            np.array([[5, 5]], np.int32), 8)
    assert not np.asarray(mask).any()


def test_adjacent_cells_empty():
    # n = 1 -> no intermediate cells
    cells, mask = ray_cells(np.array([[5, 5]], np.int32),
                            np.array([[6, 5]], np.int32), 8)
    assert not np.asarray(mask).any()


def test_random_rays_match_reference():
    starts = rng.integers(100, 200, (64, 2)).astype(np.int32)
    ends = rng.integers(100, 200, (64, 2)).astype(np.int32)
    check_batch(starts, ends, 128)


def test_long_shallow_rays():
    starts = np.tile(np.array([[1000, 1000]], np.int32), (5, 1))
    ends = np.array([[1200, 1003], [1200, 1001], [1003, 1200],
                     [800, 997], [1200, 1199]], np.int32)
    check_batch(starts, ends, 256)


def test_truncation_bound():
    # max_steps shorter than the ray: mask covers exactly max_steps cells
    cells, mask = ray_cells(np.array([[0, 0]], np.int32),
                            np.array([[100, 0]], np.int32), 16)
    assert np.asarray(mask).sum() == 16
    np.testing.assert_array_equal(np.asarray(cells)[0, :, 1], 0)

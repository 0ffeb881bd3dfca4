"""Map IO round-trip tests + byte-level header format checks vs the
reference's .smd layout (map.h:95-103, map.cpp:490-575)."""

import struct

import jax.numpy as jnp
import numpy as np

from iris_lama_tpu.algos.loc2d import maps_from_slam
from iris_lama_tpu.core import lie
from iris_lama_tpu.sdm import io as sdm_io
from iris_lama_tpu.sdm import mapping, occupancy as occ_mod
from iris_lama_tpu.sdm import export as export_mod
from iris_lama_tpu.sdm.geometry import MapGeometry

from test_mapping import make_cfg, simulate_scan


def build_small_map():
    cfg = make_cfg()
    state = mapping.slam_map_init(cfg)
    pts = simulate_scan(80)
    pose = lie.se2(0.5, -0.25, 0.3)
    state, _ = mapping.update_maps(state, cfg, pose, jnp.asarray(pts),
                                   jnp.ones(len(pts), bool), jnp.zeros(3))
    return cfg, state


def test_header_layout(tmp_path):
    cfg, state = build_small_map()
    path = str(tmp_path / "m.smd")
    sdm_io.write_frequency_occupancy(state, cfg.geometry, path)
    raw = open(path, "rb").read()
    magic, version = struct.unpack_from("<IH", raw, 0)
    assert magic == 0x6D64732E
    assert version == 0x0103
    cell_size, patch_length = struct.unpack_from("<II", raw, 8)
    assert cell_size == 4           # sizeof(frequency)
    assert patch_length == cfg.geometry.patch_length
    (n,) = struct.unpack_from("<Q", raw, 16)
    assert n == int(state.table.num_patches())
    (res,) = struct.unpack_from("<f", raw, 24)
    assert abs(res - cfg.geometry.resolution) < 1e-7
    # total size: header + n * (8 + volume*cell + words*8)
    vol = cfg.geometry.patch_volume
    words = max(vol >> 6, 1)
    assert len(raw) == 32 + n * (8 + vol * 4 + words * 8)


def test_frequency_roundtrip(tmp_path):
    cfg, state = build_small_map()
    path = str(tmp_path / "freq.smd")
    sdm_io.write_frequency_occupancy(state, cfg.geometry, path)
    loaded, geo = sdm_io.read_frequency_occupancy(path, capacity=512)
    assert abs(geo.resolution - cfg.geometry.resolution) < 1e-6
    # every active cell matches
    occ0 = np.asarray(state.occupied)
    vis0 = np.asarray(state.visited)
    from iris_lama_tpu.sdm import pool as pool_mod
    keys = np.asarray(pool_mod.active_keys(state.table)[0])
    mask = np.asarray(pool_mod.active_slot_mask(state.table))
    for slot in np.nonzero(mask)[0]:
        key = int(keys[slot])
        s2 = int(np.asarray(pool_mod.table_lookup(
            loaded.table, jnp.asarray([key], jnp.int32)))[0])
        assert s2 >= 0
        np.testing.assert_array_equal(np.asarray(loaded.occupied)[s2],
                                      occ0[slot])
        np.testing.assert_array_equal(np.asarray(loaded.visited)[s2],
                                      vis0[slot])


def test_distance_roundtrip(tmp_path):
    cfg, state = build_small_map()
    path = str(tmp_path / "dm.smd")
    sdm_io.write_distance_map(state, cfg.geometry, cfg.l2_max, path)
    loaded, dcfg = sdm_io.read_distance_map(path, capacity=512)
    assert abs(dcfg.max_sqdist - cfg.distance.max_sqdist) < 1
    from iris_lama_tpu.sdm import pool as pool_mod
    keys = np.asarray(pool_mod.active_keys(state.table)[0])
    mask = np.asarray(pool_mod.active_slot_mask(state.table))
    d0 = np.asarray(state.dist)
    for slot in np.nonzero(mask)[0]:
        key = int(keys[slot])
        s2 = int(np.asarray(pool_mod.table_lookup(
            loaded.table, jnp.asarray([key], jnp.int32)))[0])
        assert s2 >= 0
        np.testing.assert_allclose(np.asarray(loaded.dist)[s2], d0[slot],
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(loaded.obstacle)[s2],
                                      np.asarray(state.obstacle)[slot])


def test_simple_roundtrip(tmp_path):
    cfg, state = build_small_map()
    maps = maps_from_slam(state, cfg)
    path = str(tmp_path / "simple.smd")
    sdm_io.write_simple_occupancy(maps.occupancy, cfg.geometry, path)
    loaded, geo = sdm_io.read_simple_occupancy(path, capacity=512)
    img0 = export_mod.simple_occupancy_to_image(maps.occupancy, cfg.geometry)
    img1 = export_mod.simple_occupancy_to_image(loaded, geo)
    np.testing.assert_array_equal(img0, img1)


def test_png_export(tmp_path):
    cfg, state = build_small_map()
    img = export_mod.occupancy_to_image(state, cfg.geometry)
    assert (img == 0).any() and (img == 255).any()
    p = str(tmp_path / "map.png")
    export_mod.export_to_png(img, p)
    from PIL import Image
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img[::-1])
    dimg = export_mod.distance_to_image(state, cfg.geometry,
                                        cfg.distance.max_dist)
    assert dimg.min() == 0 and dimg.max() == 255


def test_ply_export(tmp_path):
    from iris_lama_tpu.sdm.export import export_mesh_to_ply
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    tris = np.array([[0, 1, 2]], np.int64)
    p = str(tmp_path / "m.ply")
    export_mesh_to_ply(verts, tris, p)
    txt = open(p).read()
    assert "element vertex 3" in txt and "element face 1" in txt
    assert txt.strip().endswith("3 0 1 2")


def test_package_lazy_imports():
    import iris_lama_tpu as lama
    assert lama.Pose2D(1, 2, 0.5).x() == 1
    assert lama.Slam2DOptions().resolution == 0.05
    assert lama.PFSlam2DOptions().particles == 30
    assert lama.SimplePGO is not None

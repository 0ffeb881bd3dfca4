"""Map export: occupancy/distance -> PNG, mesh -> PLY.

reference: include/lama/sdm/export.h:44-47, src/sdm/export.cpp —
occupancy gray levels: free=255 white? No: the reference writes
occupied=0 (black), free=255 (white? see export.cpp:45-77: it writes
0 for occupied, 255 for free... actually 127 unknown background) and
distance maps scaled to 0-255; TSDF -> ASCII PLY (export.cpp:135-176).

Host-side (PIL); export is not a hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from . import pool as pool_mod
from .geometry import MapGeometry


class PolygonMesh(NamedTuple):
    """Vertices + triangle indices (reference: types.h PolygonMesh)."""

    vertices: np.ndarray    # f64[V, 3]
    triangles: np.ndarray   # i64[T, 3]


def read_image(path: str) -> np.ndarray:
    """Read any PIL-supported image as uint8 (reference: image_io.h
    PNG/any-format read via stb, src/image_io.cpp:45-56)."""
    from PIL import Image
    return np.asarray(Image.open(path))


def _dense_from_pool(table, arr, geo: MapGeometry, default):
    """Pool -> dense [H, W] numpy grid over the active bounding box.

    Returns (grid, origin_cell_xy).
    """
    keys = np.asarray(pool_mod.active_keys(table)[0])
    mask = np.asarray(pool_mod.active_slot_mask(table))
    arr = np.asarray(arr)
    length = geo.patch_length
    slots = np.nonzero(mask)[0]
    if len(slots) == 0:
        return np.full((length, length), default, arr.dtype), (0, 0)
    px = (keys[slots] >> 15)
    py = (keys[slots] & 0x7FFF)
    ox, oy = px.min(), py.min()
    nx, ny = px.max() - ox + 1, py.max() - oy + 1
    grid = np.full((ny * length, nx * length), default, arr.dtype)
    for s, x, y in zip(slots, px - ox, py - oy):
        grid[y * length:(y + 1) * length, x * length:(x + 1) * length] = arr[s]
    return grid, (int(ox) << geo.log2dim, int(oy) << geo.log2dim)


def occupancy_to_image(state, geo: MapGeometry) -> np.ndarray:
    """Fused/frequency map -> uint8 image (export.cpp:45-77 gray levels:
    occupied 0, free 255, unknown 127). Row 0 is min-y (flip for display)."""
    occ, _ = _dense_from_pool(state.table, np.asarray(state.occupied), geo, 0)
    vis, _ = _dense_from_pool(state.table, np.asarray(state.visited), geo, 0)
    occ = occ.astype(np.int64)
    vis = vis.astype(np.int64)
    img = np.full(occ.shape, 127, np.uint8)
    img[(vis > 0) & (4 * occ <= vis)] = 255
    img[4 * occ > vis] = 0
    return img


def simple_occupancy_to_image(state, geo: MapGeometry) -> np.ndarray:
    cells, _ = _dense_from_pool(state.table, np.asarray(state.cells), geo, 0)
    img = np.full(cells.shape, 127, np.uint8)
    img[cells == -1] = 255
    img[cells == 1] = 0
    return img


def distance_to_image(state, geo: MapGeometry, max_dist: float) -> np.ndarray:
    """Distance field scaled to 0-255 (export.cpp:80-99)."""
    dist, _ = _dense_from_pool(state.table, np.asarray(state.dist), geo,
                               np.float32(max_dist))
    return np.clip(dist / max_dist * 255.0, 0, 255).astype(np.uint8)


def export_to_png(img: np.ndarray, path: str) -> None:
    """PNG write via PIL (reference uses stb, src/image_io.cpp:45-68)."""
    from PIL import Image
    Image.fromarray(img[::-1]).save(path)   # flip so +y is up


def export_mesh_to_ply(vertices: np.ndarray, triangles: np.ndarray,
                       path: str) -> None:
    """ASCII PLY (export.cpp:135-176)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(triangles)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")

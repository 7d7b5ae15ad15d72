"""Vectorized planar geometry — point-in-polygon, bbox ops, cell covers.

Plays the role of OGR geometry intersection in the reference
(ref: src/asf_tools/vector.py:9-29 ``get_features`` /
``intersects_feature`` / ``get_property_values_for_intersecting_features``)
without GDAL: polygons are plain numpy rings, points are numpy columns, and
the test is an even-odd crossing-number count vectorized over the points
(polygon layers are the small/broadcast side, SURVEY §2.3 J1/J2).
"""

from __future__ import annotations

import numpy as np

from . import cells


def points_in_ring(lat: np.ndarray, lon: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd point-in-polygon. ``ring``: (k, 2) array of (lon, lat)
    vertices, open or closed. Vectorized over points; loops over the (few)
    edges. Points exactly on an edge follow the half-open convention."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    vx = np.asarray(ring, dtype=np.float64)[:, 0]
    vy = np.asarray(ring, dtype=np.float64)[:, 1]
    if vx[0] != vx[-1] or vy[0] != vy[-1]:
        vx = np.append(vx, vx[0])
        vy = np.append(vy, vy[0])
    inside = np.zeros(x.shape, dtype=bool)
    for i in range(len(vx) - 1):
        x1, y1, x2, y2 = vx[i], vy[i], vx[i + 1], vy[i + 1]
        crosses = (y1 > y) != (y2 > y)
        if not crosses.any():
            continue
        x_at_y = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        inside ^= crosses & (x < x_at_y)
    return inside


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(min_lat, min_lon, max_lat, max_lon) of a (k,2) lon/lat ring."""
    r = np.asarray(ring, dtype=np.float64)
    return float(r[:, 1].min()), float(r[:, 0].min()), float(r[:, 1].max()), float(r[:, 0].max())


def polygon_cover_cells(ring: np.ndarray, res: int) -> np.ndarray:
    """Cells at ``res`` intersecting the polygon: bbox cover refined by a
    center/corner containment test (cells whose bbox intersects any edge are
    kept conservatively). This is the partition-pruning cover used for the
    broadcast join build side (ref dem.py:39-45's catalog-intersection role).
    """
    min_lat, min_lon, max_lat, max_lon = ring_bbox(ring)
    cover = cells.cover_bbox(min_lat, min_lon, max_lat, max_lon, res)
    if cover.size <= 4:
        return cover
    # refine: keep cells whose center is inside OR that touch the bbox edge
    # band of the polygon (conservative: corners inside OR edge-crossing)
    lat_c, lon_c = cells.cell_center(cover)
    x, y, r = cells.decode_xy(cover)
    n = float(1 << res)
    half_w = 360.0 / n / 2.0
    half_h = 180.0 / n / 2.0
    keep = points_in_ring(lat_c, lon_c, ring)
    for dlon, dlat in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        keep |= points_in_ring(lat_c + dlat * half_h, lon_c + dlon * half_w, ring)
    # cells containing any polygon vertex
    ring_arr = np.asarray(ring, dtype=np.float64)
    vert_cells = cells.encode(ring_arr[:, 1], ring_arr[:, 0], res)
    keep |= np.isin(cover, vert_cells)
    return cover[keep]


def bbox_intersects(
    a: tuple[float, float, float, float], b: tuple[float, float, float, float]
) -> bool:
    """(min_lat, min_lon, max_lat, max_lon) bbox intersection test."""
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])

"""Synthetic watershed / flood polygon layers (the small broadcast side).

Plays the role of the reference's remote GeoJSON tile/watershed catalogs
(ref: src/asf_tools/dem.py:12, src/asf_tools/hydrosar/hand/prepare.py:15,
loaded via vector.get_features ref vector.py:9-12). Deterministic from an
integer seed; two flavors:

- ``watershed_boxes``: axis-aligned boxes -> SQL-expressible, used by the
  DuckDB-oracle join queries;
- ``watershed_polygons``: 12-gon rings -> exercises the exact
  point-in-polygon refine stage.
"""

from __future__ import annotations

import numpy as np


def watershed_boxes(n: int = 24, seed: int = 42) -> list[dict]:
    """Deterministic lat/lon boxes: [{poly_id, min_lat, min_lon, max_lat,
    max_lon, file_path}]. Sized 2-10 degrees, mid-latitudes."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        clat = float(rng.uniform(-55, 55))
        clon = float(rng.uniform(-170, 170))
        h = float(rng.uniform(1.0, 5.0))
        w = float(rng.uniform(1.0, 5.0))
        out.append(
            {
                "poly_id": i,
                "min_lat": clat - h,
                "min_lon": clon - w,
                "max_lat": clat + h,
                "max_lon": clon + w,
                "file_path": f"s3://watersheds/tile_{i:04d}.tif",
            }
        )
    return out


def boxes_values_sql(boxes: list[dict]) -> str:
    """A VALUES subquery for the boxes — identical text for Spark & DuckDB."""
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    rows = ", ".join(
        f"({b['poly_id']}, {d(b['min_lat'])}, {d(b['min_lon'])}, {d(b['max_lat'])}, {d(b['max_lon'])})"
        for b in boxes
    )
    return f"(SELECT * FROM (VALUES {rows}) AS t(poly_id, min_lat, min_lon, max_lat, max_lon))"


def watershed_polygons(n: int = 24, seed: int = 42, n_vertices: int = 12) -> list[dict]:
    """Deterministic star-convex 12-gon rings:
    [{poly_id, ring: (k,2) ndarray of (lon,lat), file_path}]."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        clat = float(rng.uniform(-55, 55))
        clon = float(rng.uniform(-170, 170))
        angles = np.linspace(0, 2 * np.pi, n_vertices, endpoint=False)
        radii = rng.uniform(1.0, 4.0, n_vertices)
        ring = np.stack([clon + radii * np.cos(angles), clat + radii * np.sin(angles)], axis=1)
        out.append({"poly_id": i, "ring": ring, "file_path": f"s3://watersheds/poly_{i:04d}.geojson"})
    return out


def polygon_vertices_df(spark, polys: list[dict]):
    """Exploded (poly_id, idx, lon, lat) vertex table for the ring list —
    the DataFrame twin of :func:`vertices_values_sql` (identical float
    literals both ways: repr round-trips the exact double)."""
    rows = [
        (p["poly_id"], i, float(v[0]), float(v[1]))
        for p in polys
        for i, v in enumerate(p["ring"])
    ]
    return spark.createDataFrame(rows, "poly_id int, idx int, lon double, lat double")


def vertices_values_sql(polys: list[dict]) -> str:
    """DuckDB VALUES emitter for the same vertex table."""
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    rows = ", ".join(
        f"({p['poly_id']}, {i}, {d(float(v[0]))}, {d(float(v[1]))})"
        for p in polys
        for i, v in enumerate(p["ring"])
    )
    return f"(SELECT * FROM (VALUES {rows}) AS t(poly_id, idx, lon, lat))"


def polygon_edges_df(spark, polys: list[dict]):
    """Exploded (poly_id, x1, y1, x2, y2) RING-EDGE table (closing edge
    included) — the broadcast build side of the pure-Catalyst
    crossing-number PIP join; float literals identical to
    :func:`edges_values_sql` (repr round-trips the exact double)."""
    rows = []
    for p in polys:
        ring = p["ring"]
        k = len(ring)
        for i in range(k):
            a, b = ring[i], ring[(i + 1) % k]
            rows.append(
                (p["poly_id"], float(a[0]), float(a[1]), float(b[0]), float(b[1]))
            )
    return spark.createDataFrame(
        rows, "poly_id int, x1 double, y1 double, x2 double, y2 double"
    )


def edges_values_sql(polys: list[dict]) -> str:
    """DuckDB VALUES emitter for the same ring-edge table."""
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    parts = []
    for p in polys:
        ring = p["ring"]
        k = len(ring)
        for i in range(k):
            a, b = ring[i], ring[(i + 1) % k]
            parts.append(
                f"({p['poly_id']}, {d(float(a[0]))}, {d(float(a[1]))},"
                f" {d(float(b[0]))}, {d(float(b[1]))})"
            )
    return (
        "(SELECT * FROM (VALUES "
        + ", ".join(parts)
        + ") AS t(poly_id, x1, y1, x2, y2))"
    )

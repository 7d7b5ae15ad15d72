"""polygon_stats: closed-form pins (unit square, triangle, CW vs CCW
orientation, degenerate ring) plus registry-vs-source consistency."""

import math

from asf_tools_spark.operators.geometry import polygon_stats


def _verts(spark, rings):
    rows = [
        (pid, i, float(x), float(y))
        for pid, ring in rings.items()
        for i, (x, y) in enumerate(ring)
    ]
    return spark.createDataFrame(rows, "poly_id int, idx int, lon double, lat double")


def test_unit_square_ccw(spark):
    v = _verts(spark, {0: [(0, 0), (1, 0), (1, 1), (0, 1)]})
    r = polygon_stats(v).collect()[0]
    assert (r.n_vertices, r.area, r.cx, r.cy, r.perimeter) == (4, 1.0, 0.5, 0.5, 4.0)


def test_cw_orientation_same_area_and_centroid(spark):
    # clockwise ring: signed area flips, |area| and centroid are unchanged
    v = _verts(spark, {0: [(0, 0), (0, 1), (1, 1), (1, 0)]})
    r = polygon_stats(v).collect()[0]
    assert (r.area, r.cx, r.cy) == (1.0, 0.5, 0.5)


def test_right_triangle(spark):
    v = _verts(spark, {7: [(0, 0), (3, 0), (0, 4)]})
    r = polygon_stats(v).collect()[0]
    assert r.area == 6.0
    assert (r.cx, r.cy) == (1.0, round(4.0 / 3.0, 6))
    assert r.perimeter == 12.0  # 3 + 4 + 5


def test_degenerate_ring_null_centroid(spark):
    # all vertices collinear: area 0, centroid NULL, perimeter = 2 * length
    v = _verts(spark, {1: [(0, 0), (1, 0), (2, 0)]})
    r = polygon_stats(v).collect()[0]
    assert r.area == 0.0 and r.cx is None and r.cy is None
    assert r.perimeter == 4.0


def test_multiple_polygons_grouped(spark):
    v = _verts(
        spark,
        {0: [(0, 0), (1, 0), (1, 1), (0, 1)], 1: [(0, 0), (2, 0), (2, 2), (0, 2)]},
    )
    got = {r.poly_id: r.area for r in polygon_stats(v).collect()}
    assert got == {0: 1.0, 1: 4.0}


def test_watershed_source_matches_shoelace_numpy(spark):
    import numpy as np

    from asf_tools_spark.sources.polygons import (
        polygon_vertices_df,
        watershed_polygons,
    )

    polys = watershed_polygons(n=4)
    got = {r.poly_id: r for r in polygon_stats(polygon_vertices_df(spark, polys)).collect()}
    for p in polys:
        ring = p["ring"]
        x, y = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cross = x * y2 - x2 * y
        sa = cross.sum() / 2.0
        r = got[p["poly_id"]]
        assert r.area == round(abs(sa), 6)
        assert r.cx == round(((x + x2) * cross).sum() / (6.0 * sa), 6)
        assert r.perimeter == round(
            float(np.hypot(x2 - x, y2 - y).sum()), 6
        )
        assert math.isfinite(r.cy)


def test_hotspot_cluster_semantics(spark):
    # two blobs: a 2x2 block and a diagonal-touching cell (8-conn merges
    # them); a far cell is its own cluster. Rollup = the registry query's.
    from pyspark.sql import functions as F

    from asf_tools_spark.operators.labeling import label_connected

    dense = spark.createDataFrame(
        [(1, 1, 5), (1, 2, 3), (2, 1, 4), (2, 2, 3), (3, 3, 7), (10, 10, 3)],
        "row long, col long, n_pages long",
    )
    labeled = label_connected(dense.withColumn("flag", F.lit(True)), "flag", (8, 8))
    stride = F.lit(32).cast("long")
    got = {
        r.cluster_id: (r.n_cells, r.n_pages)
        for r in labeled.join(dense, ["row", "col"])
        .groupBy("label")
        .agg(
            F.min(F.col("row") * stride + F.col("col")).alias("cluster_id"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_pages").alias("n_pages"),
        )
        .collect()
    }
    assert got == {33: (5, 22), 330: (1, 3)}


def _edges_df(spark, rings):
    rows = []
    for pid, ring in rings.items():
        k = len(ring)
        for i in range(k):
            a, b = ring[i], ring[(i + 1) % k]
            rows.append((pid, float(a[0]), float(a[1]), float(b[0]), float(b[1])))
    return spark.createDataFrame(
        rows, "poly_id int, x1 double, y1 double, x2 double, y2 double"
    )


def test_pip_concave_polygon(spark):
    # C-shape: bbox [0,3]x[0,3]; the notch (1,1)-(3,2) open to the right
    # is INSIDE the bbox but OUTSIDE the ring
    from asf_tools_spark.operators.geometry import pip_candidates

    ring = [(0, 0), (3, 0), (3, 1), (1, 1), (1, 2), (3, 2), (3, 3), (0, 3)]
    edges = _edges_df(spark, {0: ring})
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 1.5, 2.0), (3, 2.5, 0.5), (4, 1.5, 5.0)],
        "doc_id long, lat double, lon double",
    )
    got = {r.doc_id: r.inside for r in pip_candidates(pts, edges).collect()}
    # (lon, lat): doc1 (0.5, 0.5) inside; doc2 (2.0, 1.5) in the notch ->
    # bbox candidate but OUTSIDE; doc3 (0.5, 2.5) inside; doc4 lon 5 -> no row
    assert got == {1: True, 2: False, 3: True}


def test_pip_differential_vs_python_raycast(spark):
    import random

    from asf_tools_spark.operators.geometry import pip_candidates
    from asf_tools_spark.sources.polygons import polygon_edges_df, watershed_polygons

    polys = watershed_polygons(n=6)
    rng = random.Random(3)
    pts = []
    for i in range(400):
        p = polys[rng.randrange(len(polys))]
        clat = float(p["ring"][:, 1].mean())
        clon = float(p["ring"][:, 0].mean())
        pts.append((i, clat + rng.uniform(-3, 3), clon + rng.uniform(-3, 3)))
    pdf = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    got = {
        (r.poly_id, r.doc_id): r.inside
        for r in pip_candidates(pdf, polygon_edges_df(spark, polys)).collect()
    }

    def raycast(ring, x, y):
        n, c = len(ring), False
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                c = not c
        return c

    checked = 0
    for p in polys:
        ring = [(float(a), float(b)) for a, b in p["ring"]]
        xs = [v[0] for v in ring]
        ys = [v[1] for v in ring]
        for i, lat, lon in pts:
            in_bbox = min(xs) <= lon <= max(xs) and min(ys) <= lat <= max(ys)
            key = (p["poly_id"], i)
            if in_bbox:
                assert got[key] == raycast(ring, lon, lat)
                checked += 1
            else:
                assert key not in got
    assert checked > 50  # the differential actually exercised candidates


def test_idw_single_point_recovers_value(spark):
    # one point: sole contributor to all 9 ring cells -> idw == value
    from asf_tools_spark.operators.geometry import idw_interpolate

    pts = spark.createDataFrame([(10.0, 20.0, 7.5)], "lat double, lon double, value double")
    got = idw_interpolate(pts, 5).collect()
    assert len(got) == 9
    assert all(r.idw_value == 7.5 and r.n_contrib == 1 for r in got)


def test_idw_weighting_and_edge_clamp(spark):
    import math

    from asf_tools_spark.operators.geometry import idw_interpolate

    # two points in different cells sharing a ring cell; the closer point
    # dominates. Also: a corner point's out-of-grid neighbors are dropped.
    n = 32
    # cell (row 16, col 16) center:
    cy = -90.0 + (16 + 0.5) * (180.0 / n)
    cx = -180.0 + (16 + 0.5) * (360.0 / n)
    pts = spark.createDataFrame(
        [(cy + 0.1, cx + 0.1, 10.0), (cy + 5.0, cx + 5.0, 0.0), (-89.9, -179.9, 1.0)],
        "lat double, lon double, value double",
    )
    got = {(r.row, r.col): r for r in idw_interpolate(pts, 5).collect()}
    r = got[(16, 16)]
    w1 = 1.0 / (0.1 * 0.1 + 0.1 * 0.1 + 1e-6)
    d2b = (cy + 5.0 - cy) ** 2 + (cx + 5.0 - cx) ** 2
    w2 = 1.0 / (d2b + 1e-6)
    assert r.n_contrib == 2
    assert math.isclose(r.idw_value, round(w1 * 10.0 / (w1 + w2), 6), abs_tol=1e-6)
    # corner point (row 0, col 0): only the 4 in-grid neighbors exist
    corner_cells = {(rr, cc) for (rr, cc), v in got.items() if v.idw_value == 1.0}
    assert corner_cells == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_simplify_drops_collinear_keeps_spike(spark):
    from asf_tools_spark.operators.geometry import simplify_rings

    # square with collinear midpoints on each side + one spike at idx 2
    ring = [
        (0, 0), (1, 0), (1.5, 0.8), (2, 0),  # spike at (1.5, 0.8)
        (2, 1), (2, 2), (1, 2), (0, 2), (0, 1),
    ]
    rows = [(0, i, float(x), float(y)) for i, (x, y) in enumerate(ring)]
    v = spark.createDataFrame(rows, "poly_id int, idx int, lon double, lat double")
    kept = {r.idx for r in simplify_rings(v, 0.3).collect()}
    assert 2 in kept  # spike (0.8 off the chord) survives tol 0.3
    # collinear side midpoints (idx 5 is a corner; 1,4,8 are on-segment)
    assert 4 not in kept and 8 not in kept
    kept_hi = {r.idx for r in simplify_rings(v, 1.0).collect()}
    assert 2 not in kept_hi  # higher tolerance flattens the spike
    assert kept_hi <= kept  # monotone: raising tol never adds vertices


def test_simplify_matches_pure_python_replay(spark):
    from asf_tools_spark.operators.geometry import simplify_rings
    from asf_tools_spark.sources.polygons import (
        polygon_vertices_df,
        simplify_rings_py,
        watershed_polygons,
    )

    for tol in (0.1, 0.35, 1.0):
        polys = watershed_polygons(n=8)
        got = sorted(
            (r.poly_id, r.idx, r.lon, r.lat)
            for r in simplify_rings(polygon_vertices_df(spark, polys), tol).collect()
        )
        assert got == sorted(simplify_rings_py(polys, tol))

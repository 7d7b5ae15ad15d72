"""Vector polygon metrics — shoelace area, centroid, perimeter over an
exploded (poly_id, idx, lon, lat) vertex table.

The vector side of the engine's raster<->vector boundary ops: the
reference manipulates watershed/flood polygons as OGR geometries
(ref: src/asf_tools/vector.py get_features/intersect — driver-side,
library-backed); at 10^12-page scale the polygon LAYER itself can be
large (per-tile flood outlines, one ring per label), so the metrics run
as DataFrame aggregates over the vertex table instead of per-feature
driver loops.

Formulas (Gauss shoelace, planar lon/lat units — the same convention the
cell index uses; public textbook material):

    A_signed = 1/2 * sum_i (x_i * y_{i+1} - x_{i+1} * y_i)
    C_x      = 1/(6 A_signed) * sum_i (x_i + x_{i+1}) * cross_i
    C_y      = 1/(6 A_signed) * sum_i (y_i + y_{i+1}) * cross_i

Spark-first shape: the ring-closing successor (idx + 1 mod k) comes from
ONE co-partitioned self-join on (poly_id, idx) — both sides shuffle on
the same key, and every per-polygon reduction is a partial/final hash
aggregate. No window (vertex order is an explicit column, not an implied
sort), no driver loop over features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def polygon_stats(verts: DataFrame, key: str = "poly_id") -> DataFrame:
    """(key, n_vertices, area, cx, cy, perimeter) per ring. ``verts``
    needs columns (key, idx, lon, lat) with idx = 0..k-1 in ring order;
    degenerate rings (|A| = 0) return NULL centroids."""
    k = verts.groupBy(key).agg(F.count(F.lit(1)).alias("_k"))
    a = verts.join(k, key).select(
        key,
        ((F.col("idx") + 1) % F.col("_k")).alias("_nxt"),
        F.col("lon").alias("_x1"),
        F.col("lat").alias("_y1"),
        F.col("_k"),
    )
    b = verts.select(
        F.col(key).alias("_kb"),
        F.col("idx").alias("_ib"),
        F.col("lon").alias("_x2"),
        F.col("lat").alias("_y2"),
    )
    edges = a.join(
        b, (a[key] == b["_kb"]) & (a["_nxt"] == b["_ib"])
    ).select(
        key, "_k", "_x1", "_y1", "_x2", "_y2",
        (F.col("_x1") * F.col("_y2") - F.col("_x2") * F.col("_y1")).alias("_cross"),
    )
    agg = edges.groupBy(key).agg(
        F.max("_k").alias("n_vertices"),
        (F.sum("_cross") / 2.0).alias("_sa"),
        F.sum((F.col("_x1") + F.col("_x2")) * F.col("_cross")).alias("_sx"),
        F.sum((F.col("_y1") + F.col("_y2")) * F.col("_cross")).alias("_sy"),
        F.sum(
            F.sqrt(
                (F.col("_x2") - F.col("_x1")) * (F.col("_x2") - F.col("_x1"))
                + (F.col("_y2") - F.col("_y1")) * (F.col("_y2") - F.col("_y1"))
            )
        ).alias("_per"),
    )
    return agg.select(
        key,
        F.col("n_vertices").cast("long").alias("n_vertices"),
        F.round(F.abs(F.col("_sa")), 6).alias("area"),
        F.round(
            F.when(F.col("_sa") != 0, F.col("_sx") / (6.0 * F.col("_sa"))), 6
        ).alias("cx"),
        F.round(
            F.when(F.col("_sa") != 0, F.col("_sy") / (6.0 * F.col("_sa"))), 6
        ).alias("cy"),
        F.round("_per", 6).alias("perimeter"),
    )


def pip_candidates(
    points: DataFrame, edges: DataFrame,
    key: str = "doc_id", lat: str = "lat", lon: str = "lon",
    cover: DataFrame | None = None, cell_col: str = "cell_id",
) -> DataFrame:
    """(poly_id, key, lat, lon, inside) — exact crossing-number
    point-in-polygon over TRUE rings, entirely in whole-stage codegen
    (the UDF-free twin of spatial_join's Pandas-UDF refine; ref
    vector.py get_features + the driver-side OGR Contains loop).

    Shape for 10^12 points: per-polygon bboxes are DERIVED from the edge
    table (min/max only — exact, no float drift) and BROADCAST to prune
    candidates map-side; the surviving (point, poly) pairs join the
    broadcast edge table (|polys| x ring_len rows) and an upward-ray
    crossing is counted per edge with the standard strict-inequality
    rule; inside = odd crossing count per pair. Zero crossings never
    reach the parity aggregate — the left join restores those pairs as
    outside. Points exactly ON an edge are knife-edge by construction
    (both engines evaluate the identical IEEE expression, so the verdict
    matches bit-for-bit either way).

    With ``cover`` (a (poly_id, cell_col) bbox-cover table — build with
    cells.cover_bbox so cover SUPERSETS the bbox test), the prune is an
    EQUI BroadcastHashJoin on the cell key with the bbox test as a
    residual on the poly_id-keyed box join — the flagship cover-join
    shape; the page side never sees a nested-loop join. Without it the
    box prune is a BNLJ against the |polys|-row box table (fine for
    tests, not for 10^12 points)."""
    boxes = edges.groupBy("poly_id").agg(
        F.min(F.least("x1", "x2")).alias("_minx"),
        F.max(F.greatest("x1", "x2")).alias("_maxx"),
        F.min(F.least("y1", "y2")).alias("_miny"),
        F.max(F.greatest("y1", "y2")).alias("_maxy"),
    )
    in_box = (
        (F.col(lon) >= F.col("_minx")) & (F.col(lon) <= F.col("_maxx"))
        & (F.col(lat) >= F.col("_miny")) & (F.col(lat) <= F.col("_maxy"))
    )
    if cover is not None:
        cand = (
            points.select(key, lat, lon, cell_col)
            .join(F.broadcast(cover), cell_col)
            .join(F.broadcast(boxes), "poly_id")
            .where(in_box)
            .select("poly_id", key, lat, lon)
        )
    else:
        cand = points.select(key, lat, lon).join(
            F.broadcast(boxes), in_box
        ).select("poly_id", key, lat, lon)
    crossing = (
        (F.col("y1") > F.col(lat)) != (F.col("y2") > F.col(lat))
    ) & (
        F.col(lon)
        < F.col("x1")
        + (F.col(lat) - F.col("y1"))
        * (F.col("x2") - F.col("x1"))
        / (F.col("y2") - F.col("y1"))
    )
    parity = (
        cand.join(F.broadcast(edges), "poly_id")
        .where(crossing)
        .groupBy("poly_id", key)
        .agg(F.count(F.lit(1)).alias("_nc"))
    )
    return cand.join(parity, ["poly_id", key], "left").select(
        "poly_id", key, lat, lon,
        F.coalesce(F.pmod(F.col("_nc"), F.lit(2)) == 1, F.lit(False)).alias("inside"),
    )


def idw_interpolate(
    points: DataFrame, res: int,
    lat: str = "lat", lon: str = "lon", value_col: str = "value",
    ring: int = 1, eps: float = 1e-6,
) -> DataFrame:
    """(row, col, idw_value, n_contrib): inverse-distance-weighted
    interpolation of scattered point values onto the res-level cell grid
    (Shepard 1968; the scattered-point twin of the W2 grid infill). Each
    point contributes to its own cell and the ring-`ring` neighbors with
    weight 1/(d^2 + eps), d = planar distance to the neighbor's cell
    CENTER. ONE constant-fan-out explode ((2*ring+1)^2) + ONE
    partial/final hash aggregate — at 10^12 points the exchange carries
    one (sum_wv, sum_w) partial per (partition, cell). Edges clamp (no
    wraparound)."""
    from ..core import cells as C

    n = 1 << res
    span = range(-ring, ring + 1)
    offs = F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
        for dr in span for dc in span
    ])
    base = points.select(
        F.expr(C.grid_y_sql(lat, res)).alias("_py"),
        F.expr(C.grid_x_sql(lon, res)).alias("_px"),
        F.col(lat).alias("_lat"), F.col(lon).alias("_lon"),
        F.col(value_col).alias("_v"),
    )
    tgt = base.withColumn("_o", F.explode(offs)).select(
        (F.col("_py") + F.col("_o.dr")).alias("row"),
        (F.col("_px") + F.col("_o.dc")).alias("col"),
        "_lat", "_lon", "_v",
    ).where(
        (F.col("row") >= 0) & (F.col("row") < n)
        & (F.col("col") >= 0) & (F.col("col") < n)
    )
    clat = F.lit(-90.0) + (F.col("row").cast("double") + F.lit(0.5)) * (F.lit(180.0) / F.lit(float(n)))
    clon = F.lit(-180.0) + (F.col("col").cast("double") + F.lit(0.5)) * (F.lit(360.0) / F.lit(float(n)))
    d2 = (F.col("_lat") - clat) * (F.col("_lat") - clat) + (F.col("_lon") - clon) * (F.col("_lon") - clon)
    w = F.lit(1.0) / (d2 + F.lit(float(eps)))
    return tgt.groupBy("row", "col").agg(
        F.round(F.sum(w * F.col("_v")) / F.sum(w), 6).alias("idw_value"),
        F.count(F.lit(1)).alias("n_contrib"),
    )

"""Trajectory analytics over geotagged event streams: per-entity track
statistics and origin-destination flow matrices.

The movement-data face of the geospatial engine (the reference computes
per-tile statistics over static rasters, ref src/asf_tools/tile.py and
hydrosar/flood_map.py's per-label aggregates; a 10^12-row clickstream with
coordinates asks the moving-object versions of the same questions). Both
operators are one-shuffle shapes:

- :func:`track_stats` — consecutive-leg geometry per entity: ONE window
  shuffle keyed by the entity id (ts-ordered lag), haversine leg lengths
  as pure Catalyst expressions, then an entity-keyed hash aggregate that
  rides the SAME partitioning (no second exchange). At 100 TB the only
  data movement is the per-entity sort — entity keys are high-cardinality
  (users), so no hot partition; nothing is all-pairs.
- :func:`od_matrix` — first/last position per (entity, day) via one
  full-frame ordered window (again: the aggregate reuses the window's
  hash partitioning), then a low-cardinality (origin-cell, dest-cell)
  rollup. The O/D keys are res-4 Morton cells (core.cells), so the
  flow matrix is bounded by (4^res)^2, not by user count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.spatial import with_cell_col
from .spatial_join import haversine_km


def track_stats(
    pings: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-entity track statistics from a ping table.

    Returns one row per ``key``: ``n_pings``, ``total_km`` (sum of
    haversine leg lengths in (ts, tiebreak) order), ``max_leg_km``,
    ``span_hours`` (first→last ping, exact integer-microsecond
    arithmetic), and ``avg_kmh`` (NULL for single-ping or zero-span
    tracks — never a divide-by-zero Inf).
    """
    w = Window.partitionBy(key).orderBy("_ts", tiebreak)
    legs = pings.select(
        key,
        tiebreak,
        F.col(ts).cast("timestamp_ltz").alias("_ts"),
        F.col(lat).alias("_lat"),
        F.col(lon).alias("_lon"),
    ).select(
        key,
        "_ts",
        haversine_km(
            F.lag("_lat").over(w),
            F.lag("_lon").over(w),
            F.col("_lat"),
            F.col("_lon"),
        ).alias("_leg"),
    )
    span_us = F.max(F.unix_micros("_ts")) - F.min(F.unix_micros("_ts"))
    out = legs.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.round(F.coalesce(F.sum("_leg"), F.lit(0.0)), 4).alias("total_km"),
        F.round(F.coalesce(F.max("_leg"), F.lit(0.0)), 4).alias("max_leg_km"),
        F.round(span_us / F.lit(3600000000.0), 6).alias("span_hours"),
        F.round(
            F.when(
                span_us > 0,
                F.sum("_leg") / (span_us / F.lit(3600000000.0)),
            ),
            4,
        ).alias("avg_kmh"),
    )
    return out


def od_matrix(
    pings: DataFrame,
    res: int = 4,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Origin-destination flow matrix: per (entity, day), the day's first
    ping cell is the origin and the last is the destination; flows are
    counted per (o_cell, d_cell) with distinct-entity counts. Same-cell
    days are kept (the diagonal is the stay-home signal)."""
    tagged = with_cell_col(pings, lat, lon, res, "_cell")
    day = F.date_trunc("day", F.col(ts).cast("timestamp_ltz")).cast("date")
    w = (
        Window.partitionBy(key, "_day")
        .orderBy(ts, tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    trips = (
        tagged.withColumn("_day", day)
        .select(
            key,
            "_day",
            F.first("_cell").over(w).alias("o_cell"),
            F.last("_cell").over(w).alias("d_cell"),
        )
        .dropDuplicates([key, "_day"])
    )
    return trips.groupBy("o_cell", "d_cell").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.countDistinct(key).alias("n_users"),
    )

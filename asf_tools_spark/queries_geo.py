"""Geocode + trajectory registry queries: quadkey/geohash rollups over the
geotagged document corpus, and per-user track statistics / O-D flows over
the geotagged event stream.

The web-map serving face of the engine (quadkey/geohash are the public
interchange geocodes; the reference's equivalent is its own tile naming,
functions.spatial.tile_name_col, ref src/asf_tools/dem.py:12) plus the
moving-object face (tracks/flows) the static reference never needed.

Every row has a full-SQL DuckDB oracle. Geocode parity rests on pure
integer/bit arithmetic after one floor() per axis (the Mercator floor is
fenced by ROUND(.., 9) on both engines — functions/geocode.py); the
trajectory rows reuse the haversine/ASIN text already proven cross-engine
by distance_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import oracle
from .core import cells
from .functions import geocode
from .sources.pages import _with_geotag, geotagged_documents

_QK_Z = 8
_OD_RES = 4


def _geotagged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + md5-parity lat/lon keyed by event_id (the oracle-checked
    geotag path; value/hand are dropped — trajectory rows don't use them)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _with_geotag(ev, F.col("event_id")).drop("value", "hand")


def _geotagged_events_sql() -> str:
    """DuckDB subquery mirroring :func:`_geotagged_events` value-for-value
    (same staged-hash layering as oracle.geotagged_documents_sql)."""
    d = oracle.DUCKDB
    base = "event_id, ts, user_id, event_type"
    hashes = f"""(
      SELECT {base},
             {oracle.hash8_sql("event_id", d, salt="geo-a")} AS _ha,
             {oracle.hash8_sql("event_id", d, salt="geo-b")} AS _hb,
             {oracle.hash8_sql("event_id", d, salt="geo-c")} AS _hc,
             {oracle.hash8_sql("event_id", d, salt="geo-d")} AS _hd
      FROM events
    )"""
    return f"""(
      SELECT {base},
             {oracle.geotag_lat_from_hashes_sql()} AS lat,
             {oracle.geotag_lon_from_hashes_sql()} AS lon
      FROM {hashes} _ge0
    )"""


# ---------------------------------------------------------------------------
# quadkey rollup

def q_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quadkey page rollup at zoom 8 (the pre-aggregation a tile
    server keeps per map tile), carrying the zoom-4 parent prefix — the
    quadkey hierarchy IS string prefix, so parent rollups and prefix
    range scans need no geometry at all. Plan shape: geotag map stage +
    ONE hash aggregate; at 100 TB the aggregate is bounded by occupied
    tiles (<= 4^z), not page count."""
    pages = geotagged_documents(spark, sf_dir)
    qk = geocode.with_quadkey_col(pages, z=_QK_Z, out="quadkey")
    return (
        qk.groupBy("quadkey")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .withColumn("parent_qk", F.substring("quadkey", 1, 4))
    )


def _quadkey_oracle() -> str:
    docs = oracle.geotagged_documents_sql(8, oracle.DUCKDB)
    qk = geocode.quadkey_sql("lat", "lon", _QK_Z)
    return f"""
        SELECT quadkey, COUNT(*) AS n_pages,
               ROUND(SUM(value), 6) AS sum_value,
               SUBSTR(quadkey, 1, 4) AS parent_qk
        FROM (SELECT {qk} AS quadkey, value FROM {docs} _qk0) _qk1
        GROUP BY quadkey
    """


# ---------------------------------------------------------------------------
# geohash rollup

def q_geohash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-geohash-prefix density rollup: encode every page at precision
    6, aggregate at the 4-char prefix (geohash truncation = containment,
    so one encode serves every coarser rollup). Distinct-fine-cell count
    rides the same aggregate (exact — the per-prefix fine-cell set is
    <= 32^2)."""
    pages = geotagged_documents(spark, sf_dir)
    gh = geocode.with_geohash_col(pages, out="gh6")
    return (
        gh.withColumn("gh4", F.substring("gh6", 1, 4))
        .groupBy("gh4")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("gh6").alias("n_cells"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def _geohash_oracle() -> str:
    docs = oracle.geotagged_documents_sql(8, oracle.DUCKDB)
    gh = geocode.geohash_sql("lat", "lon")
    return f"""
        SELECT SUBSTR(gh6, 1, 4) AS gh4, COUNT(*) AS n_pages,
               COUNT(DISTINCT gh6) AS n_cells,
               ROUND(SUM(value), 6) AS sum_value
        FROM (SELECT {gh} AS gh6, value FROM {docs} _gh0) _gh1
        GROUP BY SUBSTR(gh6, 1, 4)
    """


# ---------------------------------------------------------------------------
# track stats

_HAV = (
    "2.0 * 6371.0088 * ASIN(SQRT(POWER(SIN(RADIANS(lat - _plat) / 2), 2) "
    "+ COS(RADIANS(_plat)) * COS(RADIANS(lat)) "
    "* POWER(SIN(RADIANS(lon - _plon) / 2), 2)))"
)


def q_track_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user track statistics over the geotagged event stream (ONE
    entity-keyed window shuffle; the final aggregate reuses its hash
    partitioning). avg_kmh is NULL for zero-span tracks — never an Inf.
    Oracle: the same LAG/haversine replay in DuckDB (ASIN text proven
    cross-engine by distance_pairs)."""
    from .operators.trajectory import track_stats

    return track_stats(_geotagged_events(spark, sf_dir))


def _track_stats_oracle() -> str:
    ev = _geotagged_events_sql()
    return f"""
        WITH legs AS (
          SELECT user_id, ts,
                 LAG(lat) OVER w AS _plat, LAG(lon) OVER w AS _plon,
                 lat, lon
          FROM {ev} _tr0
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        d AS (
          SELECT user_id, ts,
                 CASE WHEN _plat IS NULL THEN NULL ELSE {_HAV} END AS leg
          FROM legs
        )
        SELECT user_id, COUNT(*) AS n_pings,
               ROUND(COALESCE(SUM(leg), 0.0), 4) AS total_km,
               ROUND(COALESCE(MAX(leg), 0.0), 4) AS max_leg_km,
               ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
                     / CAST(3600000000.0 AS DOUBLE), 6) AS span_hours,
               ROUND(CASE WHEN epoch_us(MAX(ts)) > epoch_us(MIN(ts))
                          THEN SUM(leg) / ((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
                                           / CAST(3600000000.0 AS DOUBLE))
                     END, 4) AS avg_kmh
        FROM d GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# O-D matrix

def q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flows between res-4 Morton cells: per (user,
    day) the first/last ping cells, counted per cell pair. The flow
    matrix is bounded by occupied-cell pairs, independent of user count;
    the only wide exchange is the (user, day) window."""
    from .operators.trajectory import od_matrix

    return od_matrix(_geotagged_events(spark, sf_dir), res=_OD_RES)


def _od_matrix_oracle() -> str:
    ev = _geotagged_events_sql()
    celled = cells.cell_layered_select(
        ev, "lat", "lon", _OD_RES, carry=["event_id", "ts", "user_id"], out="cell"
    )
    return f"""
        WITH staged AS (
          SELECT user_id, event_id, ts,
                 CAST(date_trunc('day', ts) AS DATE) AS d, cell
          FROM {celled} _od0
        ),
        ends AS (
          SELECT user_id, d,
                 FIRST_VALUE(cell) OVER w AS o_cell,
                 LAST_VALUE(cell) OVER w AS d_cell
          FROM staged
          WINDOW w AS (PARTITION BY user_id, d ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ),
        trips AS (SELECT DISTINCT user_id, d, o_cell, d_cell FROM ends)
        SELECT o_cell, d_cell, COUNT(*) AS n_trips,
               COUNT(DISTINCT user_id) AS n_users
        FROM trips GROUP BY o_cell, d_cell
    """


def queries() -> dict:
    return {
        "quadkey_rollup": q_quadkey_rollup,
        "geohash_rollup": q_geohash_rollup,
        "track_stats": q_track_stats,
        "od_matrix": q_od_matrix,
    }


def oracle_sql() -> dict:
    return {
        "quadkey_rollup": _quadkey_oracle(),
        "geohash_rollup": _geohash_oracle(),
        "track_stats": _track_stats_oracle(),
        "od_matrix": _od_matrix_oracle(),
    }

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


# ---------------------------------------------------------------------------
# trip segmentation

_GAP_MIN = 30.0


def q_trip_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based trajectory segmentation (>30 min off-radar splits a
    trip): ONE entity-keyed window computes lag, running boundary count
    AND leg lengths; cross-gap legs are excluded from trip_km. Timestamps
    exported as exact integer epoch-micros (the repo's cross-engine
    timestamp rule)."""
    from .operators.trajectory import trip_segments

    out = trip_segments(_geotagged_events(spark, sf_dir), gap_minutes=_GAP_MIN)
    return out.select(
        "user_id",
        F.col("trip_id").cast("long").alias("trip_id"),
        "n_pings",
        F.unix_micros("start_ts").alias("start_us"),
        F.unix_micros("end_ts").alias("end_us"),
        "trip_km",
    )


def _trip_segments_oracle() -> str:
    ev = _geotagged_events_sql()
    gap_us = int(_GAP_MIN * 60_000_000)
    return f"""
        WITH s AS (
          SELECT user_id, ts, event_id, lat, lon,
                 LAG(lat) OVER w AS _plat, LAG(lon) OVER w AS _plon,
                 LAG(ts) OVER w AS _pts
          FROM {ev} _ts0
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        g AS (
          SELECT user_id, ts,
                 epoch_us(ts) - epoch_us(_pts) AS _gap,
                 CASE WHEN _plat IS NULL THEN NULL ELSE {_HAV} END AS _leg,
                 CAST(SUM(CASE WHEN _pts IS NULL
                                    OR epoch_us(ts) - epoch_us(_pts) > {gap_us}
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS BIGINT) AS trip_id
          FROM s
        )
        SELECT user_id, trip_id, COUNT(*) AS n_pings,
               epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us,
               ROUND(COALESCE(SUM(CASE WHEN _gap <= {gap_us} THEN _leg END),
                              0.0), 4) AS trip_km
        FROM g GROUP BY user_id, trip_id
    """


# ---------------------------------------------------------------------------
# co-location pairs

_COLOC_RES = 6
_COLOC_HOURS = 1


def q_colocation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-cell same-hour entity pairs (contact-graph primitive) —
    distinct space-time occupancy then a bucket-keyed self-join; never
    all-pairs."""
    from .operators.trajectory import colocation_pairs

    return colocation_pairs(
        _geotagged_events(spark, sf_dir), res=_COLOC_RES, bucket_hours=_COLOC_HOURS
    )


def _colocation_oracle() -> str:
    ev = _geotagged_events_sql()
    celled = cells.cell_layered_select(
        ev, "lat", "lon", _COLOC_RES, carry=["event_id", "ts", "user_id"], out="cell"
    )
    bucket_us = _COLOC_HOURS * 3_600_000_000
    return f"""
        WITH occ AS (
          SELECT DISTINCT user_id, cell,
                 CAST(FLOOR(epoch_us(ts) / CAST({float(bucket_us)!r} AS DOUBLE))
                      AS BIGINT) AS bucket
          FROM {celled} _cl0
        )
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               COUNT(*) AS n_windows, COUNT(DISTINCT a.cell) AS n_cells
        FROM occ a JOIN occ b
          ON a.cell = b.cell AND a.bucket = b.bucket AND a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
    """


# ---------------------------------------------------------------------------
# bearing rose

def q_bearing_rose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bin compass rose of leg bearings over all user tracks (movement
    anisotropy screen). ATAN2/DEGREES algebra identical on both engines;
    bin arithmetic is exact integer floor/mod on the shifted angle."""
    from .operators.trajectory import bearing_rose

    return bearing_rose(_geotagged_events(spark, sf_dir))


def _bearing_oracle() -> str:
    ev = _geotagged_events_sql()
    deg = (
        "DEGREES(ATAN2(SIN(RADIANS(lon) - RADIANS(_plon)) * COS(RADIANS(lat)), "
        "COS(RADIANS(_plat)) * SIN(RADIANS(lat)) "
        "- SIN(RADIANS(_plat)) * COS(RADIANS(lat)) * COS(RADIANS(lon) - RADIANS(_plon))))"
    )
    return f"""
        WITH legs AS (
          SELECT user_id, ts,
                 LAG(lat) OVER w AS _plat, LAG(lon) OVER w AS _plon,
                 lat, lon
          FROM {ev} _br0
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        d AS (
          SELECT {deg} AS deg, {_HAV} AS leg
          FROM legs WHERE _plat IS NOT NULL
        )
        SELECT CAST(FLOOR((deg + CAST(382.5 AS DOUBLE)) / CAST(45.0 AS DOUBLE))
                    AS BIGINT) % 8 AS bin,
               COUNT(*) AS n_legs, ROUND(AVG(leg), 4) AS avg_leg_km
        FROM d WHERE leg > 0.0
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# geofence entry/exit events

def q_geofence_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fence entry/exit transitions: exact PIP hits (the flagship
    cover-cell prune + crossing-parity refine, shared with
    pip_page_counts) against the watershed fences, then lag/lead over the
    per-(user, fence) hit sequence — the shuffle is bounded by HITS, not
    pings x fences. The ping timeline position (seq) is a per-user
    row_number computed before the spatial join and carried through."""
    from .core import cells as C
    from .operators.geometry import pip_candidates
    from .operators.trajectory import geofence_events
    from .sources.polygons import polygon_edges_df, watershed_polygons
    from pyspark.sql.window import Window

    polys = watershed_polygons()
    edges = polygon_edges_df(spark, polys)
    cover_rows = []
    for p in polys:
        ring = p["ring"]
        for c in C.cover_bbox(
            float(ring[:, 1].min()), float(ring[:, 0].min()),
            float(ring[:, 1].max()), float(ring[:, 0].max()), 8,
        ):
            cover_rows.append((int(p["poly_id"]), int(c)))
    cover = spark.createDataFrame(cover_rows, "poly_id int, cell_id long")

    ev = _geotagged_events(spark, sf_dir)
    from .functions.spatial import with_cell_col

    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = with_cell_col(ev, "lat", "lon", 8, "cell_id").withColumn(
        "seq", F.row_number().over(seq_w).cast("long")
    )
    flags = pip_candidates(ev, edges, key="event_id", cover=cover)
    hits = (
        flags.where("inside")
        .select("poly_id", "event_id")
        .join(ev.select("event_id", "user_id", "seq", "ts"), "event_id")
    )
    out = geofence_events(hits, key="user_id", seq="seq", ts="ts")
    return out.select(
        "user_id", "poly_id", "seq",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("ts_us"),
        "is_entry", "is_exit",
    )


def _geofence_oracle() -> str:
    from .sources.polygons import edges_values_sql, watershed_polygons

    ev = _geotagged_events_sql()
    edges = edges_values_sql(watershed_polygons())
    return f"""
        WITH seqd AS (
          SELECT user_id, event_id, ts, lat, lon,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS BIGINT) AS seq
          FROM {ev} _gf0
        ),
        edges AS (SELECT * FROM {edges} e),
        boxes AS (
          SELECT poly_id,
                 MIN(LEAST(x1, x2)) AS minx, MAX(GREATEST(x1, x2)) AS maxx,
                 MIN(LEAST(y1, y2)) AS miny, MAX(GREATEST(y1, y2)) AS maxy
          FROM edges GROUP BY poly_id
        ),
        cand AS (
          SELECT b.poly_id, p.user_id, p.event_id, p.seq, p.ts, p.lat, p.lon
          FROM seqd p JOIN boxes b
            ON p.lon >= b.minx AND p.lon <= b.maxx
           AND p.lat >= b.miny AND p.lat <= b.maxy
        ),
        par AS (
          SELECT c.poly_id, c.event_id, COUNT(*) AS nc
          FROM cand c JOIN edges e ON e.poly_id = c.poly_id
           AND ((e.y1 > c.lat) <> (e.y2 > c.lat))
           AND c.lon < e.x1 + (c.lat - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1)
          GROUP BY c.poly_id, c.event_id
        ),
        hits AS (
          SELECT c.user_id, c.poly_id, c.seq, c.ts
          FROM cand c JOIN par p
            ON p.poly_id = c.poly_id AND p.event_id = c.event_id
          WHERE p.nc % 2 = 1
        ),
        marked AS (
          SELECT user_id, poly_id, seq, ts,
                 (LAG(seq) OVER w IS NULL OR LAG(seq) OVER w <> seq - 1)
                   AS is_entry,
                 (LEAD(seq) OVER w IS NULL OR LEAD(seq) OVER w <> seq + 1)
                   AS is_exit
          FROM hits
          WINDOW w AS (PARTITION BY user_id, poly_id ORDER BY seq)
        )
        SELECT user_id, poly_id, seq, epoch_us(ts) AS ts_us,
               is_entry, is_exit
        FROM marked WHERE is_entry OR is_exit
    """


def queries() -> dict:
    return {
        "quadkey_rollup": q_quadkey_rollup,
        "geohash_rollup": q_geohash_rollup,
        "track_stats": q_track_stats,
        "od_matrix": q_od_matrix,
        "trip_segments": q_trip_segments,
        "colocation_pairs": q_colocation_pairs,
        "bearing_rose": q_bearing_rose,
        "geofence_events": q_geofence_events,
    }


def oracle_sql() -> dict:
    return {
        "quadkey_rollup": _quadkey_oracle(),
        "geohash_rollup": _geohash_oracle(),
        "track_stats": _track_stats_oracle(),
        "od_matrix": _od_matrix_oracle(),
        "trip_segments": _trip_segments_oracle(),
        "colocation_pairs": _colocation_oracle(),
        "bearing_rose": _bearing_oracle(),
        "geofence_events": _geofence_oracle(),
    }

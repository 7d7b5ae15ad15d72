"""Dialect-templated SQL builders shared by the engine and the DuckDB oracle.

Every derived quantity that must agree bit-for-bit between the Spark plan and
the DuckDB oracle (deterministic geotags, cell ids, tile ids, hashes) is
emitted from ONE generator here. The only dialect difference is the
hex->int idiom (Spark ``conv``; DuckDB ``CAST('0x…')``); everything else is
shared text using operators verified identical on both engines
(``% << & |``, FLOOR/LEAST/GREATEST/CAST, md5).
"""

from __future__ import annotations

from .core import cells

SPARK = "spark"
DUCKDB = "duckdb"


def dbl(x: float) -> str:
    """Literal forced to DOUBLE — Spark parses bare decimals as DECIMAL
    (exact decimal arithmetic), DuckDB as DOUBLE; casting keeps both engines
    in binary-float semantics so derived values match bit-for-bit."""
    return f"CAST({x!r} AS DOUBLE)"


def hash8_sql(expr: str, dialect: str, salt: str = "") -> str:
    """First 8 hex digits of md5(salt || expr) as a BIGINT in [0, 2^32)."""
    inner = f"CONCAT('{salt}', CAST({expr} AS STRING))" if dialect == SPARK else f"'{salt}' || CAST({expr} AS VARCHAR)"
    if dialect == SPARK:
        return f"CAST(conv(substr(md5({inner}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({inner}), 1, 8) AS BIGINT)"


# Five deterministic "mega-city" hotspot centers — the skew source the
# engine's salting has to handle (BASELINE.json north_star).
HOTSPOTS = [(40.71, -74.01), (51.51, -0.13), (35.68, 139.69), (-23.55, -46.63), (28.61, 77.21)]
HOTSPOT_PCT = 30  # percent of pages pinned to a hotspot


def geotag_lat_sql(key_expr: str, dialect: str) -> str:
    """Deterministic latitude for a page key (hash-derived; 30% hotspots)."""
    ha = hash8_sql(key_expr, dialect, salt="geo-a")
    hb = hash8_sql(key_expr, dialect, salt="geo-b")
    hc = hash8_sql(key_expr, dialect, salt="geo-c")
    hotspot_case = " ".join(
        f"WHEN ({hb}) % 5 = {i} THEN {dbl(lat)}" for i, (lat, _lon) in enumerate(HOTSPOTS)
    )
    jitter = f"(({hc}) % 1000) / {dbl(1000.0)} - {dbl(0.5)}"
    uniform = f"(({hc}) % 1700000) / {dbl(10000.0)} - {dbl(85.0)}"
    return f"CASE WHEN ({ha}) % 100 < {HOTSPOT_PCT} THEN (CASE {hotspot_case} END) + {jitter} ELSE {uniform} END"


def geotag_lon_sql(key_expr: str, dialect: str) -> str:
    ha = hash8_sql(key_expr, dialect, salt="geo-a")
    hb = hash8_sql(key_expr, dialect, salt="geo-b")
    hd = hash8_sql(key_expr, dialect, salt="geo-d")
    hotspot_case = " ".join(
        f"WHEN ({hb}) % 5 = {i} THEN {dbl(lon)}" for i, (_lat, lon) in enumerate(HOTSPOTS)
    )
    jitter = f"(({hd}) % 1000) / {dbl(1000.0)} - {dbl(0.5)}"
    uniform = f"(({hd}) % 3500000) / {dbl(10000.0)} - {dbl(175.0)}"
    return f"CASE WHEN ({ha}) % 100 < {HOTSPOT_PCT} THEN (CASE {hotspot_case} END) + {jitter} ELSE {uniform} END"


def synth_value_sql(key_expr: str, dialect: str) -> str:
    """Backscatter-power analogue: right-skewed positive double."""
    h = hash8_sql(key_expr, dialect, salt="val")
    u = f"(({h}) % 1000000) / {dbl(1000000.0)}"
    return f"POWER({u}, {dbl(3.0)}) * {dbl(2.0)} + {dbl(0.000001)}"


def synth_hand_sql(lat_expr: str, lon_expr: str, key_expr: str, dialect: str) -> str:
    """HAND analogue: smooth spatial field + hash noise (meters, >= 0)."""
    h = hash8_sql(key_expr, dialect, salt="hand")
    noise = f"(({h}) % 1000) / {dbl(200.0)}"
    return (
        f"GREATEST({dbl(15.0)} * ({dbl(1.0)} + SIN(({lat_expr}) * {dbl(0.2)})"
        f" * COS(({lon_expr}) * {dbl(0.2)})) + {noise} - {dbl(2.5)}, {dbl(0.0)})"
    )


def cell_sql(lat_expr: str, lon_expr: str, res: int) -> str:
    """Dialect-free Z-order cell id (core.cells emitter)."""
    return cells.morton_cell_sql(lat_expr, lon_expr, res)


def geotagged_documents_sql(res: int, dialect: str, table: str = "documents") -> str:
    """A subquery string turning the driver's ``documents`` table into a
    geotagged page table: (doc_id, text, lang, lat, lon, value, hand,
    cell_id). Identical values on Spark and DuckDB by construction."""
    lat = geotag_lat_sql("doc_id", dialect)
    lon = geotag_lon_sql("doc_id", dialect)
    return f"""(
      SELECT doc_id, text, lang, source, n_chars,
             lat, lon,
             {synth_value_sql("doc_id", dialect)} AS value,
             {synth_hand_sql("lat", "lon", "doc_id", dialect)} AS hand,
             {cell_sql("lat", "lon", res)} AS cell_id
      FROM (
        SELECT doc_id, text, lang, source, n_chars, {lat} AS lat, {lon} AS lon
        FROM {table}
      )
    )"""

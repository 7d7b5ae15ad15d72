"""Quadkey / geohash encodes: classic-algorithm differentials + engine parity.

The references here are INDEPENDENT re-implementations of the public
algorithms (Bing tile-system quadkey, Gustavo Niemeyer's bisection
geohash) — not replays of the repo's arithmetic — so agreement is a real
two-implementation proof, like tests/test_editsim.py's DP differential.
"""

import math

import duckdb
import numpy as np
import pytest

from asf_tools_spark.functions import geocode


# --- independent references -------------------------------------------------

def ref_quadkey(lat: float, lon: float, z: int) -> str:
    """Bing Maps tile-system quadkey (msdn 'Bing Maps Tile System' pseudo
    code: clip, scale, floor, digit = x_bit + 2*y_bit MSB-first)."""
    lat = min(max(lat, -85.05112878), 85.05112878)
    n = 1 << z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    s = math.sin(lat * math.pi / 180.0)
    y = int(math.floor((0.5 - math.log((1.0 + s) / (1.0 - s)) / (4.0 * math.pi)) * n))
    x = min(max(x, 0), n - 1)
    y = min(max(y, 0), n - 1)
    qk = []
    for i in range(z, 0, -1):
        digit = 0
        mask = 1 << (i - 1)
        if x & mask:
            digit += 1
        if y & mask:
            digit += 2
        qk.append(str(digit))
    return "".join(qk)


def ref_geohash(lat: float, lon: float, precision: int = 6) -> str:
    """Classic interval-bisection geohash (Niemeyer 2008) — while-loop
    halving, no integer-grid shortcut."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, bit, even, out = 0, 0, True, []
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = (bits << 1) | 1
                lon_lo = mid
            else:
                bits = bits << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits = bits << 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(alphabet[bits])
            bits, bit = 0, 0
    return "".join(out)


def _test_points() -> list[tuple[float, float]]:
    rng = np.random.default_rng(7)
    pts = [
        (40.71, -74.01), (51.51, -0.13), (35.68, 139.69),
        (-23.55, -46.63), (28.61, 77.21),           # the corpus hotspots
        (0.0, 0.0), (-84.9, -179.9), (84.9, 179.9),  # extremes in range
        (47.60357, -122.32945),                       # the msdn doc example
    ]
    pts += [(float(a), float(b)) for a, b in zip(
        rng.uniform(-84.9, 84.9, 40), rng.uniform(-179.9, 179.9, 40))]
    return pts


def osm_tile_xy(lat: float, lon: float, z: int) -> tuple[int, int]:
    """OSM slippy-map tile formula — algebraically equal to Bing's
    (ln((1+s)/(1-s)) = 2*ln(tan+sec)) but computed through tan/sec, an
    independent floating-point path."""
    n = 1 << z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    r = math.radians(min(max(lat, -85.05112878), 85.05112878))
    y = int(math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.pi) / 2.0 * n))
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


def test_quadkey_reference_matches_osm_formula_and_prefix():
    for lat, lon in _test_points():
        qk = ref_quadkey(lat, lon, 10)
        x, y = osm_tile_xy(lat, lon, 10)
        digits = [int((x >> k) & 1) + 2 * int((y >> k) & 1) for k in range(9, -1, -1)]
        assert qk == "".join(str(d) for d in digits), (lat, lon)
        # parent tile = quadkey prefix
        assert ref_quadkey(lat, lon, 6) == qk[:6]


@pytest.mark.parametrize("z", [3, 8, 10])
def test_quadkey_sql_matches_reference_duckdb(z):
    for lat, lon in _test_points():
        sql = geocode.quadkey_sql(repr(lat), repr(lon), z)
        got = duckdb.sql(f"SELECT {sql} AS qk").fetchone()[0]
        assert got == ref_quadkey(lat, lon, z), (lat, lon, z)


def test_geohash_sql_matches_bisection_reference_duckdb():
    for lat, lon in _test_points():
        sql = geocode.geohash_sql(repr(lat), repr(lon))
        got = duckdb.sql(f"SELECT {sql} AS gh").fetchone()[0]
        assert got == ref_geohash(lat, lon, 6), (lat, lon)


def test_geohash_known_values():
    # public reference values (geohash.org convention)
    assert ref_geohash(57.64911, 10.40744, 6) == "u4pruy"
    sql = geocode.geohash_sql("57.64911", "10.40744")
    assert duckdb.sql(f"SELECT {sql}").fetchone()[0] == "u4pruy"


def test_spark_columns_match_sql_emitters(spark):
    """The staged Column builders and the textual SQL emitters are two
    implementations — pin them equal on Spark, and pin Spark == DuckDB
    for the same emitter (the oracle contract)."""
    pts = _test_points()
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = geocode.with_quadkey_col(
        geocode.with_geohash_col(df), z=8, out="qk"
    ).selectExpr(
        "lat", "lon", "qk", "geohash",
        geocode.quadkey_sql("lat", "lon", 8) + " AS qk_sql",
        geocode.geohash_sql("lat", "lon") + " AS gh_sql",
    )
    for r in out.collect():
        assert r.qk == r.qk_sql == ref_quadkey(r.lat, r.lon, 8)
        assert r.geohash == r.gh_sql == ref_geohash(r.lat, r.lon, 6)


def test_hilbert_known_values_and_locality():
    from asf_tools_spark.functions.geocode import hilbert_xy2d_py as h

    assert [h(1, x, y) for x, y in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [0, 1, 2, 3]
    # the full order-4 walk visits every cell exactly once, each step
    # grid-adjacent (THE Hilbert property Morton lacks)
    order, n = 4, 16
    pos = {h(order, x, y): (x, y) for x in range(n) for y in range(n)}
    assert sorted(pos) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_spark_matches_scalar_replay(spark):
    import math

    from asf_tools_spark.functions.geocode import hilbert_xy2d_py, with_hilbert_col

    pts = _test_points()
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = with_hilbert_col(df, order=8, out="d").collect()
    n = 1 << 8
    for r in out:
        x = min(max(int(math.floor((r.lon + 180.0) / 360.0 * n)), 0), n - 1)
        y = min(max(int(math.floor((r.lat + 90.0) / 180.0 * n)), 0), n - 1)
        assert r.d == hilbert_xy2d_py(8, x, y), (r.lat, r.lon)

"""Cell index: encode/decode round-trips, hierarchy, rings, SQL parity."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from asf_tools_spark.core import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 1000)
    lon = rng.uniform(-179.9, 179.9, 1000)
    for res in (0, 4, 9, 16, 26):
        c = cells.encode(lat, lon, res)
        x, y, r = cells.decode_xy(c)
        assert (r == res).all()
        assert (cells.from_xy(x, y, res) == c).all()
        clat, clon = cells.cell_center(c)
        n = 1 << res
        assert np.all(np.abs(clat - lat) <= 180.0 / n)
        assert np.all(np.abs(clon - lon) <= 360.0 / n)


def test_parent_prefix_property():
    lat = np.array([12.34, -56.78, 0.0])
    lon = np.array([100.5, -3.25, 179.9])
    fine = cells.encode(lat, lon, 12)
    coarse = cells.encode(lat, lon, 8)
    assert (cells.parent(fine, 8) == coarse).all()


def test_k_ring_counts():
    c = int(cells.encode(np.array([45.0]), np.array([45.0]), 8)[0])
    assert len(cells.k_ring(c, 0)) == 1
    assert len(cells.k_ring(c, 1)) == 9
    assert len(cells.k_ring(c, 2)) == 25
    assert c in cells.k_ring(c, 1)


def test_k_ring_lon_wrap_lat_clamp():
    west = int(cells.encode(np.array([0.0]), np.array([-179.99]), 6)[0])
    ring = cells.k_ring(west, 1)
    assert len(ring) == 9  # wraps the antimeridian
    south = int(cells.encode(np.array([-89.99]), np.array([0.0]), 6)[0])
    assert len(cells.k_ring(south, 1)) == 6  # clamped at the pole


def test_cover_bbox():
    cover = cells.cover_bbox(10.0, 20.0, 11.5, 22.5, 8)
    lat, lon = cells.cell_center(cover)
    n = 1 << 8
    assert np.all(lat > 10.0 - 180.0 / n) and np.all(lat < 11.5 + 180.0 / n)
    assert len(np.unique(cover)) == len(cover)


@settings(max_examples=25, deadline=None)
@given(
    st.floats(min_value=-89.99, max_value=89.99),
    st.floats(min_value=-179.99, max_value=179.99),
    st.integers(min_value=0, max_value=16),
)
def test_sql_emitter_matches_numpy_via_duckdb(lat, lon, res):
    expected = int(cells.encode(np.array([lat]), np.array([lon]), res)[0])
    sql = cells.morton_cell_sql(repr(lat), repr(lon), res)
    got = duckdb.sql(f"SELECT {sql} AS cell").fetchone()[0]
    assert got == expected


def test_sql_emitter_matches_numpy_via_spark(spark):
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.9, 89.9, 200)
    lon = rng.uniform(-179.9, 179.9, 200)
    expected = cells.encode(lat, lon, 12)
    df = spark.createDataFrame([(float(a), float(o)) for a, o in zip(lat, lon)], "lat double, lon double")
    sql = cells.morton_cell_sql("lat", "lon", 12)
    got = np.array([r.cell for r in df.selectExpr(f"{sql} AS cell").collect()])
    assert (got == expected).all()

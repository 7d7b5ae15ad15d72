"""distance_band_join: closed-form pins + brute-force exactness differential."""

import math

import numpy as np

from asf_tools_spark.operators.spatial_join import distance_band_join


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, float(la), float(lo)) for i, la, lo in rows],
        "doc_id long, lat double, lon double",
    )


def _hav_np(la1, lo1, la2, lo2):
    r = math.pi / 180.0
    a = (
        math.sin((la2 - la1) * r / 2) ** 2
        + math.cos(la1 * r) * math.cos(la2 * r) * math.sin((lo2 - lo1) * r / 2) ** 2
    )
    return 2.0 * 6371.0088 * math.asin(math.sqrt(a))


def test_closed_form_pairs(spark):
    # 0-1 ~11.1 km apart; 2 is ~111 km away; 3 on another continent
    rows = [(0, 40.0, -74.0), (1, 40.1, -74.0), (2, 41.0, -74.0), (3, -20.0, 30.0)]
    got = {(r.key_a, r.key_b): r.dist_km
           for r in distance_band_join(_pts(spark, rows), 25.0, 6).collect()}
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - _hav_np(40.0, -74.0, 40.1, -74.0)) < 1e-3


def test_each_pair_exactly_once(spark):
    rows = [(i, 10.0 + 0.01 * i, 20.0) for i in range(5)]  # all within ~4.5 km
    out = distance_band_join(_pts(spark, rows), 25.0, 6).collect()
    pairs = [(r.key_a, r.key_b) for r in out]
    assert len(pairs) == len(set(pairs)) == 10  # C(5,2), no dupes
    assert all(a < b for a, b in pairs)


def test_cross_cell_pair_found(spark):
    # straddle a res-6 row boundary (lat cell edge at 0.0): prune must not lose it
    rows = [(0, -0.05, 7.0), (1, 0.05, 7.0)]
    out = distance_band_join(_pts(spark, rows), 25.0, 6).collect()
    assert [(r.key_a, r.key_b) for r in out] == [(0, 1)]


def test_brute_force_differential(spark):
    rng = np.random.RandomState(3)
    lats = 45.0 + rng.rand(60) * 0.6 - 0.3
    lons = 9.0 + rng.rand(60) * 0.6 - 0.3
    rows = [(i, float(lats[i]), float(lons[i])) for i in range(60)]
    want = {
        (i, j): _hav_np(lats[i], lons[i], lats[j], lons[j])
        for i in range(60) for j in range(i + 1, 60)
        if _hav_np(lats[i], lons[i], lats[j], lons[j]) <= 25.0
    }
    got = {(r.key_a, r.key_b): r.dist_km
           for r in distance_band_join(_pts(spark, rows), 25.0, 6).collect()}
    assert set(got) == set(want)
    for k, d in want.items():
        assert abs(got[k] - d) < 1e-3

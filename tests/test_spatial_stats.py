"""Moran's I / Getis-Ord Gi*: closed-form pins on tiny hand grids plus a
randomized differential against an independent pure-numpy replay."""

import math

import numpy as np
import pytest

from asf_tools_spark.operators.spatial_stats import (
    cell_value_grid, getis_ord_gi_star, morans_i,
)


def _cells(spark, rows):
    return spark.createDataFrame(
        [(int(r), int(c), float(x)) for r, c, x in rows],
        "row long, col long, x double",
    )


def _morans_np(rows):
    pts = [(r, c, x) for r, c, x in rows]
    xs = np.array([x for _, _, x in pts])
    n, m = len(pts), xs.mean()
    s = ((xs - m) ** 2).sum()
    cross = w = 0.0
    for i, (ri, ci, xi) in enumerate(pts):
        for j, (rj, cj, xj) in enumerate(pts):
            if i != j and abs(ri - rj) <= 1 and abs(ci - cj) <= 1:
                cross += (xi - m) * (xj - m)
                w += 1
    if n < 2 or w == 0 or s <= 0:
        return None, w
    return n * cross / (w * s), w


def _gi_np(rows):
    pts = [(r, c, x) for r, c, x in rows]
    xs = np.array([x for _, _, x in pts])
    n, m = len(pts), xs.mean()
    s = math.sqrt((xs * xs).mean() - m * m)
    out = {}
    for ri, ci, xi in pts:
        nb = [xj for rj, cj, xj in pts if abs(ri - rj) <= 1 and abs(ci - cj) <= 1]
        w = len(nb)
        var = (n * w - w * w) / (n - 1) if n > 1 else 0.0
        z = (sum(nb) - m * w) / (s * math.sqrt(var)) if s > 0 and var > 0 else None
        out[(ri, ci)] = (w, z)
    return out


def test_checkerboard_is_negative(spark):
    # 3x3 checkerboard: strong negative autocorrelation, I < E[I]
    rows = [(r, c, float((r + c) % 2)) for r in range(3) for c in range(3)]
    got = morans_i(_cells(spark, rows)).collect()[0]
    want, w = _morans_np(rows)
    assert got.n_cells == 9 and got.w_sum == w
    assert got.morans_i == pytest.approx(want, abs=2e-6)
    assert got.morans_i < got.expected_i < 0


def test_two_blocks_positive(spark):
    # left block of 2s, right block of 0s, separated: positive I
    rows = [(r, c, 2.0) for r in range(2) for c in range(2)]
    rows += [(r, c + 5, 0.0) for r in range(2) for c in range(2)]
    got = morans_i(_cells(spark, rows)).collect()[0]
    want, _ = _morans_np(rows)
    assert got.morans_i == pytest.approx(want, abs=2e-6)
    assert got.morans_i > 0


def test_degenerate_constant_surface_null(spark):
    rows = [(r, c, 1.5) for r in range(2) for c in range(2)]
    got = morans_i(_cells(spark, rows)).collect()[0]
    assert got.morans_i is None  # zero variance -> NULL, not a crash
    assert got.expected_i == pytest.approx(-1.0 / 3, abs=1e-6)


def test_single_cell_all_null(spark):
    got = morans_i(_cells(spark, [(0, 0, 1.0)])).collect()[0]
    assert got.n_cells == 1 and got.w_sum == 0
    assert got.morans_i is None and got.expected_i is None


def test_isolated_cells_no_pairs(spark):
    # cells >1 apart: W = 0 -> NULL statistic but expected_i defined
    got = morans_i(_cells(spark, [(0, 0, 1.0), (5, 5, 2.0)])).collect()[0]
    assert got.w_sum == 0 and got.morans_i is None
    assert got.expected_i == pytest.approx(-1.0, abs=1e-6)


def test_gi_star_hand_values(spark):
    rows = [(r, c, float(r * 3 + c)) for r in range(3) for c in range(3)]
    want = _gi_np(rows)
    got = {(r.row, r.col): (r.w_i, r.gi_z) for r in getis_ord_gi_star(_cells(spark, rows)).collect()}
    assert set(got) == set(want)
    for k, (w, z) in want.items():
        gw, gz = got[k]
        assert gw == w
        assert gz == pytest.approx(z, abs=2e-6)
    # the high corner is the hotspot, the low corner the coldspot
    assert got[(2, 2)][1] > 0 > got[(0, 0)][1]


def test_gi_star_degenerate_w_equals_n(spark):
    # 2x2 block: every cell's 3x3 neighborhood covers ALL cells -> n*W-W^2=0
    rows = [(r, c, float(r + 2 * c)) for r in range(2) for c in range(2)]
    for r in getis_ord_gi_star(_cells(spark, rows)).collect():
        assert r.w_i == 4 and r.gi_z is None


def test_randomized_differential(spark):
    rng = np.random.RandomState(7)
    pts = {(int(r), int(c)) for r, c in zip(rng.randint(0, 8, 40), rng.randint(0, 8, 40))}
    rows = [(r, c, float(rng.rand())) for r, c in sorted(pts)]
    mi = morans_i(_cells(spark, rows)).collect()[0]
    want, w = _morans_np(rows)
    assert mi.w_sum == w and mi.morans_i == pytest.approx(want, abs=2e-6)
    want_gi = _gi_np(rows)
    got = {(r.row, r.col): (r.w_i, r.gi_z) for r in getis_ord_gi_star(_cells(spark, rows)).collect()}
    for k, (w_i, z) in want_gi.items():
        assert got[k][0] == w_i
        if z is None:
            assert got[k][1] is None
        else:
            assert got[k][1] == pytest.approx(z, abs=2e-6)


def test_cell_value_grid_rounds_and_bins(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 1.0), (0.1, 0.1, 2.0), (80.0, 170.0, 5.0)],
        "lat double, lon double, value double",
    )
    rows = {(r.row, r.col): r.x for r in cell_value_grid(df, 5).collect()}
    # (0,0) and (0.1,0.1) share a res-5 cell -> mean 1.5
    assert rows[(16, 16)] == pytest.approx(1.5)
    assert rows[(30, 31)] == pytest.approx(5.0)

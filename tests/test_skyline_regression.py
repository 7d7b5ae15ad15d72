"""Unit tests for the Pareto-frontier sweep and group-wise OLS."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from asf_tools_spark.operators.regression import groupwise_ols
from asf_tools_spark.operators.skyline import pareto_frontier


def _brute_frontier(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, pts, n_buckets):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )
    got = pareto_frontier(df, "x", "y", n_buckets=n_buckets)
    return sorted((r["x"], r["y"]) for r in got.collect())


def test_pareto_matches_bruteforce_random(spark):
    rng = np.random.default_rng(11)
    pts = [tuple(map(float, p)) for p in rng.integers(0, 40, size=(300, 2))]
    for n_buckets in (1, 4, 64):
        assert _run(spark, pts, n_buckets) == _brute_frontier(pts)


def test_pareto_ties_and_duplicates(spark):
    """Exact duplicates both survive; a same-x lower-y point is dominated;
    a same-y lower-x point is dominated."""
    pts = [(5.0, 5.0), (5.0, 5.0), (5.0, 3.0), (3.0, 5.0), (1.0, 9.0), (9.0, 1.0)]
    got = _run(spark, pts, 4)
    assert got == [(1.0, 9.0), (5.0, 5.0), (5.0, 5.0), (9.0, 1.0)]


def test_pareto_sorted_adversarial(spark):
    """Anti-chain input (every point on the frontier) survives intact —
    the case where the frontier is O(n) and prefix/suffix pruning must
    not drop anything."""
    pts = [(float(i), float(100 - i)) for i in range(50)]
    assert _run(spark, pts, 8) == sorted(pts)


def test_groupwise_ols_exact_line_and_degenerates(spark):
    rows = (
        [("a", float(t), 2.5 * t - 1.0) for t in range(10)]  # exact line
        + [("b", float(t), 7.0) for t in range(5)]           # zero slope
        + [("c", 3.0, 9.9)]                                  # n=1: dropped
        + [("d", 4.0, 1.0), ("d", 4.0, 2.0)]                 # var x = 0: dropped
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in groupwise_ols(df, "k", "x", "y").collect()}
    assert set(got) == {"a", "b"}
    assert abs(got["a"]["slope"] - 2.5) < 1e-12
    assert abs(got["a"]["intercept"] + 1.0) < 1e-12
    assert abs(got["a"]["r"] - 1.0) < 1e-12
    assert abs(got["b"]["slope"]) < 1e-12
    assert abs(got["b"]["intercept"] - 7.0) < 1e-12
    assert got["b"]["r"] is None  # corr undefined at zero y-variance

"""Count-Min sketch, histogram quantiles, sorted-neighborhood dedup."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from asf_tools_spark.operators import dedup
from asf_tools_spark.operators.sketch import (
    countmin_build,
    countmin_estimate,
    histogram_quantiles,
)


@pytest.fixture(scope="module")
def tokens_df(spark):
    # 60 occurrences of 'a', 30 of 'b', 10 each of c..f — known exact counts
    rows = (
        [("a",)] * 60 + [("b",)] * 30
        + [(t,) for t in "cdef" for _ in range(10)]
    )
    return spark.createDataFrame(rows, "term string")


def test_countmin_never_undercounts(tokens_df, spark):
    sk = countmin_build(tokens_df, "term", depth=4, width=64)
    exact = tokens_df.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    est = countmin_estimate(sk, exact, "term", depth=4, width=64)
    rows = {r["term"]: (r["exact_n"], r["est_n"]) for r in est.collect()}
    assert len(rows) == 6
    for term, (ex, es) in rows.items():
        assert es >= ex, term  # CM collisions only overcount
    # with width=64 and 6 terms, collisions are unlikely — the heavy term
    # must estimate exactly unless a collision inflated it
    assert rows["a"][1] >= 60


def test_countmin_sketch_is_bounded_and_mergeable(tokens_df, spark):
    sk = countmin_build(tokens_df, "term", depth=4, width=64)
    cells = sk.collect()
    assert len(cells) <= 4 * 64
    # total mass per row equals the occurrence count (cell-wise-sum merge
    # invariant: two half-sketches sum to this)
    per_row = {}
    for r in cells:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["c"]
    assert set(per_row.values()) == {130}


def test_countmin_unseen_item_zero(tokens_df, spark):
    sk = countmin_build(tokens_df, "term", depth=4, width=1024)
    items = spark.createDataFrame([("zzz-never-seen",)], "term string")
    est = countmin_estimate(sk, items, "term", depth=4, width=1024)
    # with width 1024 and only 6 distinct live terms, all 4 probe cells
    # colliding is (6/1024)^4-unlikely; min() over an empty cell is 0
    assert est.collect()[0]["est_n"] == 0


def test_histogram_quantiles_vs_numpy(spark):
    vals = list(range(100))  # uniform 0..99
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = histogram_quantiles(
        df.withColumn("g", F.lit("all")), "g", "v",
        qs=(0.5, 0.9), n_bins=10, lo=0.0, hi=100.0,
    )
    got = {r["q"]: r["est"] for r in out.collect()}
    # bin width 10, exact uniform fill: interpolation lands on q*100
    assert got[0.5] == pytest.approx(50.0, abs=1.0)
    assert got[0.9] == pytest.approx(90.0, abs=1.0)


def test_histogram_quantiles_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-50,), (5,), (5000,)], "v long"
    ).withColumn("g", F.lit("g"))
    out = histogram_quantiles(df, "g", "v", qs=(0.5,), n_bins=4, lo=0.0, hi=40.0)
    rows = out.collect()
    assert len(rows) == 1  # exactly one hit bin per (group, q)
    assert 0.0 <= rows[0]["est"] <= 40.0


def test_sorted_neighborhood_finds_adjacent_near_dups(spark):
    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),   # near dup of 0, same prefix
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 0
        (3, "totally unrelated words only here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.sorted_neighborhood_pairs(
        df, "doc_id", window=2, block_chars=2, jaccard_threshold=0.5
    )
    pairs = {(r["key_a"], r["key_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(0, 2)] == 1.0  # exact dup: identical token sets
    assert (0, 1) in pairs or (1, 2) in pairs  # near dup adjacent in sort
    assert all(k[0] != 3 and k[1] != 3 for k in pairs)  # different block


def test_sorted_neighborhood_candidate_volume_bounded(spark):
    # n rows, window w -> at most n*w candidate pairs even if all identical
    docs = [(i, "same text every time") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.sorted_neighborhood_pairs(
        df, "doc_id", window=3, block_chars=2, jaccard_threshold=0.0
    )
    assert out.count() <= 20 * 3

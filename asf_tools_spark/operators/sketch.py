"""Sketch-based distinct counting: HyperLogLog per group + lossless sketch
union — the only shape that counts distincts over 100 TB without shuffling
every key. Uses Spark's built-in Datasketches HLL expressions
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate): partial sketches
combine map-side, the merge moves O(groups x sketch bytes), and a rollup
("all sources") is a sketch union, NOT a second scan.

Estimates are rows-only for the oracle (DuckDB's approx_count_distinct is
a different algorithm); the error bound is pytest-pinned instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import oracle as _oracle


def distinct_sketch(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL distinct estimate + an 'ALL' rollup row produced by
    unioning the per-group sketches (no second pass over the data)."""
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("_sk"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    grouped = per_group.select(
        F.col(group_col).cast("string").alias("grp"),
        F.round(F.hll_sketch_estimate("_sk")).cast("long").alias("n_distinct_est"),
        "n_rows",
    )
    rollup = per_group.agg(
        F.hll_union_agg("_sk").alias("_u"), F.sum("n_rows").cast("long").alias("n_rows")
    ).select(
        F.lit("ALL").alias("grp"),
        F.round(F.hll_sketch_estimate("_u")).cast("long").alias("n_distinct_est"),
        "n_rows",
    )
    return grouped.unionByName(rollup)


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 32,
    salt: str = "kmv-",
) -> DataFrame:
    """Per-group KMV (k-minimum-values) distinct estimate (Bar-Yossef
    2002): hash every value into [0, 2^32), keep the k smallest DISTINCT
    hashes per group, estimate n_distinct = (k-1) * 2^32 / h_k.

    Unlike the HLL path above this is fully DETERMINISTIC given the hash —
    the estimate itself cross-checks bit-for-bit against a SQL oracle
    (the md5 parity idiom, oracle.hash8_sql). Groups with fewer than k
    distinct hashes report their exact count (the standard small-set
    convention).

    Shape: one distinct hash-aggregate on (group, hash) — partial combine
    collapses duplicate hashes map-side — then a per-group min-k window
    (shuffle keyed by group; min-k-of-union = min-k-of-partial-min-ks, so
    an RDD aggregateByKey bounded-heap partial is the drop-in if a group's
    distinct count itself is extreme) and one final 1-row-per-group agg.

    Output: (grp, k_used, kth_hash, est_distinct).
    """
    hv = F.expr(_oracle.hash8_sql(value_col, _oracle.SPARK, salt=salt))
    pairs = df.select(
        F.col(group_col).cast("string").alias("grp"), hv.alias("hv")
    ).distinct()
    w = Window.partitionBy("grp").orderBy(F.col("hv").asc())
    topk = pairs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
    return topk.groupBy("grp").agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("hv").alias("kth_hash"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(4294967296.0) / F.max("hv")
            ),
            6,
        ).alias("est_distinct"),
    )

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

from pyspark.sql import DataFrame, functions as F


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

"""Distributed as-of join: for every left row, the most recent right row
with right.on <= left.on within the same ``by`` key — the quotes-to-trades
/ sensor-to-reading alignment operator.

Spark-first shape (no per-key loops, no range cross join): tag both sides,
union them, and run ONE window pass per key ordered by (on, side) with
last_value(ignorenulls) over an unbounded-preceding frame — each left row
picks up the latest right payload at-or-before its timestamp. Cost is a
single shuffle on ``by`` (both inputs co-partitioned by the same key) plus
a per-key sort, which is exactly the minimum any as-of algorithm needs;
skewed keys are bounded by per-key data volume, not pair counts. Ties
(right.on == left.on) match, like DuckDB/kdb ASOF semantics: the right
side orders before the left at equal timestamps.

When two RIGHT rows share (by, on), the window's final sort key is a
struct of the right payload's ORDERABLE columns, so the
lexicographically-largest such row wins deterministically — without it,
last() would return whichever row Spark's sort happened to place last,
varying across runs/partitionings. Unorderable payload columns (maps,
nested maps) are excluded from the tie-break (sorting on them is rejected
by the analyzer); if NO payload column is orderable the tie-break
degrades to arbitrary-on-exact-tie, the best any engine offers there.
Oracles must mirror the same rule (dedupe the right side to the max
orderable-column row per (by, on) before a native ASOF join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _orderable(dt: DataType) -> bool:
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame, right: DataFrame, on: str, by: str, right_prefix: str = "r_"
) -> DataFrame:
    """Left as-of join. Output = every left column + each right column
    (except ``by``) prefixed with ``right_prefix``; unmatched left rows
    keep NULL right columns (ASOF LEFT semantics)."""
    r_cols = [c for c in right.columns if c != by]
    l_struct_t = left.select(F.struct(*left.columns).alias("s")).schema[0].dataType
    r_struct_t = right.select(F.struct(*r_cols).alias("s")).schema[0].dataType

    # SQL semantics: a NULL key never equi-matches and NULL <= x is unknown,
    # so right rows with a NULL by/on can match nothing — drop them BEFORE
    # the union (otherwise NULLS-FIRST ordering would hand a NULL-ts right
    # payload to every unmatched left, diverging from DuckDB ASOF). Left
    # rows with NULL by/on stay and correctly resolve to no match.
    right = right.where(F.col(by).isNotNull() & F.col(on).isNotNull())

    # deterministic tie-break key: the orderable subset of the payload
    # (see module docstring); built as its own column so the window sort
    # never touches unorderable types
    r_fields = {f.name: f.dataType for f in r_struct_t.fields}
    tb_cols = [c for c in r_cols if _orderable(r_fields[c])]
    tb_t = (
        right.select(F.struct(*tb_cols).alias("s")).schema[0].dataType
        if tb_cols else None
    )

    l2 = left.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lv"), F.lit(None).cast(r_struct_t).alias("_rv"),
        *([F.lit(None).cast(tb_t).alias("_tb")] if tb_cols else []),
    )
    r2 = right.select(
        F.col(by).alias("_k"), F.col(on).alias("_t"), F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_t).alias("_lv"), F.struct(*r_cols).alias("_rv"),
        *([F.struct(*tb_cols).alias("_tb")] if tb_cols else []),
    )
    # among right rows with identical (key, ts): max tie-break struct wins.
    # Left rows carry a NULL _tb but are already separated by _side.
    order = ["_t", "_side"] + (["_tb"] if tb_cols else [])
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in r_cols]
    return matched.select(*out_cols)

"""Bucketed time-range join: all (left, right) pairs with the same ``by``
key and right.on in [left.on - window, left.on].

Spark-first shape: a naive inequality join is a per-key cross product
(Catalyst can only BNLJ it); instead both sides are hashed into
``window``-wide time buckets, the left probes its own bucket and the
previous one (any right row in the window lives in exactly those two), the
equi-join runs on (key, bucket) — shuffle-partitioned, AQE-skew-splittable
— and the exact window predicate filters the band. Join volume is
O(sum of per-(key,bucket) products), never |L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def time_range_join(
    left: DataFrame, right: DataFrame, on: str, by: str, window_us: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner pair join; ``on`` must be a TIMESTAMP column (microsecond
    precision, compared as unix micros). Output = left columns + right
    columns (except ``by``) prefixed."""

    def us(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp_ltz"))

    r_cols = [c for c in right.columns if c != by]
    l2 = left.select(
        F.struct(*left.columns).alias("_lv"),
        F.col(by).alias("_k"), us(F.col(on)).alias("_lt"),
        F.explode(
            F.array(
                F.floor(us(F.col(on)) / window_us),
                F.floor(us(F.col(on)) / window_us) - 1,
            )
        ).alias("_b"),
    )
    r2 = right.select(
        F.struct(*r_cols).alias("_rv"),
        F.col(by).alias("_k"), us(F.col(on)).alias("_rt"),
        F.floor(us(F.col(on)) / window_us).alias("_b"),
    )
    pairs = l2.join(r2, ["_k", "_b"]).where(
        (F.col("_rt") >= F.col("_lt") - window_us) & (F.col("_rt") <= F.col("_lt"))
    )
    out_cols = [F.col(f"_lv.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_rv.{c}").alias(f"{right_prefix}{c}") for c in r_cols]
    # a right row can land in the window from both probed buckets only if
    # the two probes collide, which they cannot (b != b-1) — no dedup needed
    return pairs.select(*out_cols)

"""Corpus snapshot diff: what changed between two releases of a document
table — the audit every iterative corpus pipeline runs before shipping
(how many docs did the new crawl/filter pass add, drop, or rewrite?).

Shape: content fingerprint per side (md5 of normalized text — the exact
same fingerprint exact_dedup keys on, so "changed" here means "would no
longer exact-dedup together"), then ONE full-outer equi-join on the key.
Single co-partitioned shuffle; no driver state. Status per key:
  added     — key only in the new snapshot
  removed   — key only in the old snapshot
  changed   — both sides, fingerprints differ
  unchanged — both sides, fingerprints equal
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalize_text


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, text_col: str = "text"
) -> DataFrame:
    """(key, status) for every key in either snapshot."""
    # presence markers, NOT fingerprint nullness: md5(NULL text) is NULL,
    # so a key present in both snapshots with NULL text on one side would
    # otherwise misreport as added/removed; eqNullSafe treats NULL==NULL
    # text as unchanged
    a = old.select(
        F.col(key), F.md5(normalize_text(F.col(text_col))).alias("_fa"),
        F.lit(True).alias("_ina"),
    )
    b = new.select(
        F.col(key), F.md5(normalize_text(F.col(text_col))).alias("_fb"),
        F.lit(True).alias("_inb"),
    )
    j = a.join(b, key, "full_outer")
    status = (
        F.when(F.col("_ina").isNull(), "added")
        .when(F.col("_inb").isNull(), "removed")
        .when(F.col("_fa").eqNullSafe(F.col("_fb")), "unchanged")
        .otherwise("changed")
    )
    return j.select(key, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame, new: DataFrame, key: str, text_col: str = "text"
) -> DataFrame:
    """(status, n) rollup of snapshot_diff — the release-report line."""
    return (
        snapshot_diff(old, new, key, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

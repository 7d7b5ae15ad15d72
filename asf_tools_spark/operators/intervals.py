"""Interval algebra over event streams — merge overlapping/abutting
intervals per key (the classic gaps-and-islands problem).

Web-scale uses: collapsing per-user activity intervals into sessions with
explicit durations, merging crawl windows per domain, coalescing
time-range coverage before a range join. The reference's raster analogue
is coalescing contiguous valid-data extents per tile row
(ref: src/asf_tools/composite.py get_target_epsg_code's extent unions at
the metadata level).

Spark-first shape: ONE window pass partitioned by the key (the only
shuffle, bounded by key cardinality) computes the running maximum of
interval ends; a row opens a new island iff its start exceeds every
previous end by more than ``min_gap``. A running sum of the open flags
numbers the islands, and one hash aggregate per (key, island) emits the
merged spans. No interval self-join anywhere — the naive overlap join is
O(n^2) per key and unbounded on skewed keys, while this is O(n log n)
sort work per key partition and survives a mega-key via the normal
spill-to-disk sort path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    min_gap: int = 0,
) -> DataFrame:
    """Merge intervals ``[start, end]`` per ``key`` that overlap or come
    within ``min_gap`` of touching (same units as start/end; integer
    epoch seconds/micros recommended for cross-engine exactness).

    Returns one row per merged island:
    ``(key, island_start, island_end, n_intervals, covered)`` where
    ``covered = island_end - island_start``.
    """
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(
        prev_max.isNull() | (F.col(start) > prev_max + F.lit(min_gap)), 1
    ).otherwise(0)
    flagged = df.withColumn("_opens", opens)
    island = F.sum("_opens").over(
        Window.partitionBy(key)
        .orderBy(start, end)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = flagged.withColumn("_island", island)
    return (
        numbered.groupBy(key, "_island")
        .agg(
            F.min(start).alias("island_start"),
            F.max(end).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .withColumn("covered", F.col("island_end") - F.col("island_start"))
        .drop("_island")
    )

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


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    op_col: str = "op",
    delete_value: str = "D",
) -> DataFrame:
    """MERGE INTO semantics over immutable snapshots — the copy-on-write
    upsert every table-format maintenance job needs (Iceberg/Delta MERGE
    re-expressed Spark-first): produce the NEXT snapshot from the current
    one plus a change feed.

      key only in updates, op != delete  -> insert
      key in both,        op != delete  -> update (update columns win)
      key in updates,     op == delete  -> dropped from the snapshot
      key only in base                   -> carry (row unchanged)

    ONE full-outer equi-join co-partitioned on the key — no driver state,
    no second pass; at 100 TB both sides shuffle once on the same key (or
    zero times if base and feed are bucketed on it). Preconditions
    (documented, not silently repaired): key is unique on each side;
    ``updates`` carries every ``base`` payload column plus ``op_col``. A
    delete for an absent key is a no-op, not a phantom insert.

    Output: base schema + ``action`` in {insert, update, carry}.
    """
    cols = [c for c in base.columns if c != key]
    payload = [c for c in updates.columns if c not in (key, op_col)]
    if set(payload) != set(cols):
        raise ValueError(
            f"updates payload {sorted(payload)} != base payload {sorted(cols)}"
        )
    b = base.select(key, *cols, F.lit(True).alias("_inb"))
    u = updates.select(
        key,
        *[F.col(c).alias(f"_u_{c}") for c in payload],
        F.col(op_col).alias("_op"),
        F.lit(True).alias("_inu"),
    )
    j = b.join(u, key, "full_outer")
    take_update = F.col("_inu").isNotNull() & (F.col("_op") != delete_value)
    action = (
        F.when(F.col("_inu").isNull(), "carry")
        .when(F.col("_op") == delete_value, "delete")
        .when(F.col("_inb").isNull(), "insert")
        .otherwise("update")
    )
    return (
        j.select(
            key,
            *[
                F.when(take_update, F.col(f"_u_{c}")).otherwise(F.col(c)).alias(c)
                for c in cols
            ],
            action.alias("action"),
        )
        .where(F.col("action") != "delete")
    )


def snapshot_diff_summary(
    old: DataFrame, new: DataFrame, key: str, text_col: str = "text"
) -> DataFrame:
    """(status, n) rollup of snapshot_diff — the release-report line."""
    return (
        snapshot_diff(old, new, key, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def scd2_history(
    changes: DataFrame, key: str, attr: str, ts: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: one validity interval per RUN of consecutive equal ``attr``
    values per key (Kimball SCD2 — the dimension-table shape every
    warehouse keeps for "what was this page's language/domain-state AT
    time t" as-of joins).

    (key, version, attr, valid_from_us, valid_to_us, n_changes,
    is_current): valid_from = first ts of the run, valid_to = first ts
    of the NEXT run (NULL while current), n_changes = rows collapsed
    into the run. Re-stating the same value does NOT open a new version
    — only transitions do (the gaps-and-islands collapse).

    Spark shape: everything rides ONE window partitioning (the key),
    ordered by (ts, tiebreak): a lag-compare change flag, a running sum
    to number islands, one hash aggregate per island, then a lead() for
    valid_to. All shuffles share the key hash partitioning — Catalyst
    plans one Exchange. The oracle uses the INDEPENDENT classic
    formulation (row_number difference trick) so the island construction
    itself is cross-verified.
    """
    from pyspark.sql.window import Window

    order = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    flagged = changes.withColumn(
        "_chg",
        F.when(
            F.lag(attr).over(w).isNull()
            | (F.lag(attr).over(w) != F.col(attr)),
            1,
        ).otherwise(0),
    ).withColumn("_ver", F.sum("_chg").over(w))
    us = F.unix_micros(F.col(ts).cast("timestamp_ltz"))
    runs = flagged.groupBy(key, "_ver").agg(
        F.first(attr).alias(attr),  # constant within an island
        F.min(us).alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from_us").asc())
    return runs.select(
        F.col(key),
        F.col("_ver").cast("long").alias("version"),
        F.col(attr),
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        "n_changes",
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
    )

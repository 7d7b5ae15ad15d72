"""2-D Pareto frontier (skyline) — the points of a corpus not dominated
in (x, y), both maximized: quality-vs-cost corpus pruning, per-domain
best-effort crawl selection, model-selection frontiers.

Dominance: q dominates p iff q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR
q.y > p.y). Exact duplicates do not dominate each other (both survive).

Spark-first, no global window: the textbook 2-D sweep needs a GLOBAL
x-descending prefix-max of y — a single-partition sort at 10^12 rows.
Instead this runs the distributed prefix-scan pattern:

1. collapse to distinct x with max(y) (hash aggregate — the frontier can
   only contain per-x maxima);
2. range-bucket x by sampled quantile boundaries (approxQuantile on the
   collapsed frame — driver state is O(buckets));
3. ONE tiny per-bucket aggregate -> driver-side suffix-max over the
   bucket maxima (O(buckets) scalars) broadcast back;
4. per-bucket window (partitioned by bucket — parallel, spill-safe)
   computes the intra-bucket strict-prefix max; a point is a frontier x
   iff its y beats both the intra-bucket prefix max and the suffix max
   of every higher bucket;
5. broadcast-join the surviving (x, max-y) pairs back to the input: a
   row is on the frontier iff its x qualified and its y equals that x's
   maximum.

Each pass is one shuffle on bounded keys; the only driver state is the
bucket boundary list and the per-bucket maxima.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pareto_frontier(
    df: DataFrame, x: str, y: str, n_buckets: int = 64
) -> DataFrame:
    """Rows of ``df`` on the maximizing Pareto frontier of (x, y)."""
    spark = df.sparkSession
    per_x = df.groupBy(x).agg(F.max(y).alias("_my"))

    if n_buckets > 1:
        cuts = per_x.approxQuantile(
            x, [i / n_buckets for i in range(1, n_buckets)], 0.01
        )
        cuts = sorted(set(cuts))
    else:
        cuts = []
    if cuts:
        bucket = F.lit(0)
        for i, c in enumerate(cuts):
            bucket = F.when(F.col(x) > F.lit(c), i + 1).otherwise(bucket)
    else:
        bucket = F.lit(0)
    bucketed = per_x.withColumn("_b", bucket)

    bmax = {
        r["_b"]: r["_m"]
        for r in bucketed.groupBy("_b").agg(F.max("_my").alias("_m")).collect()
    }
    # suffix max of STRICTLY higher buckets (higher bucket => higher x)
    suffix: dict[int, float | None] = {}
    run = None
    for b in sorted(bmax, reverse=True):
        suffix[b] = run
        run = bmax[b] if run is None else max(run, bmax[b])
    suffix_expr = F.lit(None).cast("double")
    for b, s in suffix.items():
        if s is not None:
            suffix_expr = F.when(F.col("_b") == b, F.lit(float(s))).otherwise(
                suffix_expr
            )

    w = (
        Window.partitionBy("_b")
        .orderBy(F.col(x).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = bucketed.withColumn("_pm", F.max("_my").over(w)).withColumn(
        "_sm", suffix_expr
    )
    frontier_x = flagged.where(
        (F.col("_pm").isNull() | (F.col("_my") > F.col("_pm")))
        & (F.col("_sm").isNull() | (F.col("_my") > F.col("_sm")))
    ).select(F.col(x).alias("_fx"), F.col("_my").alias("_fy"))
    # aliased join keys: frontier_x derives from df, and same-name columns
    # in a derived self-join are ambiguous to the analyzer

    return df.join(
        F.broadcast(frontier_x),
        (F.col(x) == F.col("_fx")) & (F.col(y) == F.col("_fy")),
    ).drop("_fx", "_fy")

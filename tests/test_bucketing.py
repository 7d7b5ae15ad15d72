"""Bucketed-table co-location: the 100 TB lever for repeated joins on the
same key (page/doc tables joined per run) — both sides written bucketBy the
join key means the sort-merge join reads co-located buckets and plans ZERO
shuffle exchanges. Pinned here so a regression (bucketing config off,
mismatched bucket counts, a stray repartition) is caught by plan, not by a
cluster bill."""

import shutil
import uuid

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_plans_no_shuffle_exchange(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bk_a_{suffix}", f"bk_b_{suffix}"
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable(ta)
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable(tb)
    try:
        joined = (
            spark.table(ta)
            .hint("merge")  # force SMJ: broadcast would hide the exchange question
            .join(spark.table(tb), "k")
            .select("k", "va", "vb")
        )
        joined.collect()  # finalize adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: no shuffle at all
        # sanity: the join is actually correct
        assert joined.count() == 10_000
        # mismatched-bucket regression guard: joining a non-bucketed side DOES
        # exchange — proves the assertion above is meaningful, not vacuous
        c = spark.range(10_000).select(F.col("id").alias("k"), F.lit(1).alias("vc"))
        j2 = spark.table(ta).hint("merge").join(c, "k")
        j2.collect()
        assert "Exchange" in j2._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")
        shutil.rmtree("spark-warehouse", ignore_errors=True)

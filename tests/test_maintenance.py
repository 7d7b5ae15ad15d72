"""Small-file report + compaction: inventory via Hadoop FS, per-partition
rewrite preserves data exactly and reduces file counts."""

from pyspark.sql import functions as F

from asf_tools_spark.sources.maintenance import compact_table, small_file_report


def test_report_and_compact_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(9_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("split")
    )
    # fragment: 12 files per partition
    df.repartition(12).write.partitionBy("split").parquet(path)

    rep = {d["partition"]: d for d in small_file_report(spark, path)}
    assert set(rep) == {"split=0", "split=1", "split=2"}
    assert all(d["n_files"] == 12 for d in rep.values())

    before = spark.read.parquet(path).orderBy("id").collect()
    done = compact_table(spark, path, target_bytes=128 * 1024 * 1024)
    assert set(done) == {"split=0", "split=1", "split=2"}
    assert all(after == 1 for _, after in done.values())

    rep2 = {d["partition"]: d for d in small_file_report(spark, path)}
    assert all(d["n_files"] == 1 for d in rep2.values())
    after = spark.read.parquet(path).orderBy("id").collect()
    assert before == after  # exact data preservation

    # already-compact partitions are left alone
    assert compact_table(spark, path, target_bytes=128 * 1024 * 1024) == {}


def test_staging_dirs_invisible_to_readers(spark, tmp_path):
    """A leftover (crash) or in-flight staging copy must NOT be read as
    table data: staging lives in '_'-prefixed dirs that Spark listing and
    small_file_report both ignore — a suffix-named sibling like
    'split=0__compact_tmp' would double-count every row of the partition."""
    path = str(tmp_path / "t")
    df = spark.range(3_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("split")
    )
    df.repartition(4).write.partitionBy("split").parquet(path)
    n = spark.read.parquet(path).count()

    # simulate a crash mid-compaction: staged copy written, swap not done
    spark.read.parquet(f"{path}/split=0").write.parquet(
        f"{path}/_compact_tmp/split=0"
    )
    # and a superseded copy left behind: swap done, delete not done
    spark.read.parquet(f"{path}/split=1").write.parquet(
        f"{path}/_compact_old/split=1"
    )

    assert spark.read.parquet(path).count() == n  # no double-count
    rep = {d["partition"] for d in small_file_report(spark, path)}
    assert rep == {"split=0", "split=1", "split=2"}

    # unpartitioned table: staging is a hidden SIBLING of the root
    upath = str(tmp_path / "u")
    spark.range(2_000).repartition(8).write.parquet(upath)
    before = spark.read.parquet(upath).orderBy("id").collect()
    done = compact_table(spark, upath, target_bytes=128 * 1024 * 1024)
    assert done == {"": (8, 1)}
    assert spark.read.parquet(upath).orderBy("id").collect() == before

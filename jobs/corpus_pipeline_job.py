"""spark-submit job: full training-corpus curation — quality screens ->
PII scrub -> line/exact/near dedup -> mixture sampling + split — written
partitioned by split with resumable per-partition lineage.

Cluster:
  spark-submit --py-files asf_tools_spark.zip jobs/corpus_pipeline_job.py \
      --docs s3://bucket/documents/ --out s3://bucket/corpus/ \
      --job-id curate-2026-08

Local smoke:
  python jobs/corpus_pipeline_job.py --docs /root/testdata/sf0.001/documents.parquet \
      --out /tmp/corpus --master 'local[4]'
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="input documents table (parquet path)")
    ap.add_argument("--out", required=True, help="output corpus path")
    ap.add_argument("--job-id", default=None, help="lineage job id (resume key)")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from asf_tools_spark.plans.corpus_pipeline import CorpusPipelineConfig, curate_corpus
    from asf_tools_spark.sources.lineage import LineageWriter

    builder = SparkSession.builder.appName("corpus-pipeline")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    docs = spark.read.parquet(args.docs)
    result = curate_corpus(docs, CorpusPipelineConfig(min_quality=args.min_quality))
    # the write IS the action the tail funnel observes ride — funnel() after
    metrics = LineageWriter(args.out).write(result["corpus"], "split", job_id=args.job_id)
    for stage, n in result["funnel"]():
        print(f"funnel {stage}: {n}")
    result["release"]()
    print(metrics)
    spark.stop()


if __name__ == "__main__":
    main()

"""spark-submit job: streaming curated ingestion — file-source page stream
-> quality screen + PII scrub + watermarked exact dedup -> ONE foreachBatch
advancing the curated corpus AND the LSH near-dup band store in lockstep
(exactly-once per batch_id), optionally followed by cross-batch substring
dedup of the curated output.

Cluster:
  spark-submit --py-files asf_tools_spark.zip jobs/curated_ingest_job.py \
      --src s3://bucket/pages/ --out s3://bucket/curated/ \
      --band-store s3://bucket/lsh_bands/ --pairs s3://bucket/nd_pairs/ \
      --checkpoint s3://bucket/ckpt/curate/

Local smoke:
  python jobs/curated_ingest_job.py --src /tmp/pages --out /tmp/curated \
      --band-store /tmp/bands --pairs /tmp/pairs \
      --checkpoint /tmp/ckpt --master 'local[4]'
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="page parquet source directory")
    ap.add_argument("--out", required=True, help="curated corpus output path")
    ap.add_argument("--band-store", required=True, help="LSH band store path")
    ap.add_argument("--pairs", required=True, help="near-dup candidate pairs path")
    ap.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    ap.add_argument("--substring-store", default=None,
                    help="enable cross-batch substring dedup with this gram store path")
    ap.add_argument("--substring-out", default=None,
                    help="span-deduplicated output path (with --substring-store)")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--watermark", default="24 hours")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from asf_tools_spark.streaming.ingest import start_curated_ingest, stream_pages
    from asf_tools_spark.streaming.substring import start_substring_dedup

    builder = SparkSession.builder.appName("curated-ingest")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    pages = stream_pages(spark, args.src)
    q = start_curated_ingest(
        pages, args.out, f"{args.checkpoint.rstrip('/')}/curate",
        args.band_store, args.pairs,
        min_quality=args.min_quality, watermark=args.watermark,
    )
    q.awaitTermination()

    if args.substring_store:
        if not args.substring_out:
            ap.error("--substring-out is required with --substring-store")
        # An empty/late source can leave the curate phase with no output at
        # all; spark.read.parquet on that dir throws "unable to infer
        # schema". No curated rows means nothing to substring-dedup — no-op
        # instead of crashing (scheme-aware check: the table may be on
        # hdfs/s3a, where os.path is blind).
        from asf_tools_spark.sources.maintenance import _fs_and_path

        fs, out_path = _fs_and_path(spark, args.out)
        curated_schema = None
        if fs.exists(out_path):
            try:
                curated_schema = spark.read.parquet(args.out).schema
            except Exception:
                curated_schema = None  # dir exists but holds no parquet yet
        if curated_schema is None:
            print("curated output is empty; skipping substring phase")
            spark.stop()
            return
        curated = spark.readStream.schema(curated_schema).parquet(args.out)
        q2 = start_substring_dedup(
            curated, args.substring_store, args.substring_out,
            f"{args.checkpoint.rstrip('/')}/substring",
        )
        q2.awaitTermination()

    spark.stop()


if __name__ == "__main__":
    main()

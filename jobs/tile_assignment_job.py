"""spark-submit job: page geotag -> spatial join -> tile assignments,
checkpointed with per-partition lineage (resumable).

Cluster:
  zip -r asf_tools_spark.zip asf_tools_spark
  spark-submit --py-files asf_tools_spark.zip jobs/tile_assignment_job.py \
      --pages s3://bucket/pages/ --out s3://bucket/assignments/ \
      --job-id backfill-2026-08 --cell-res 8

Local smoke (synthetic pages):
  python jobs/tile_assignment_job.py --synthetic 1000000 --out /tmp/assign
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", help="input page table (parquet/iceberg path)")
    ap.add_argument("--synthetic", type=int, help="generate N synthetic pages instead")
    ap.add_argument("--out", required=True, help="output table path")
    ap.add_argument("--job-id", default=None, help="lineage job id (resume key)")
    ap.add_argument("--cell-res", type=int, default=8)
    ap.add_argument("--master", default=None, help="override master (default: from spark-submit)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from asf_tools_spark.plans.assignments import tile_assignments
    from asf_tools_spark.sources.lineage import LineageWriter
    from asf_tools_spark.sources.pages import geotag_pages, synth_pages

    builder = SparkSession.builder.appName("tile-assignment")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    if args.synthetic:
        pages = synth_pages(spark, args.synthetic, cell_res=args.cell_res)
    else:
        pages = geotag_pages(spark.read.parquet(args.pages), key="url", cell_res=args.cell_res)

    out = tile_assignments(pages, res=args.cell_res)
    metrics = LineageWriter(args.out).write(out, "poly_id", job_id=args.job_id)
    print(metrics)
    spark.stop()


if __name__ == "__main__":
    main()

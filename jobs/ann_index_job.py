"""spark-submit job: build (or query) a persisted IVFPQ ANN index over an
embeddings table — the deployable form of operators/pq.py.

Build (coarse k-means -> residual codebooks -> codes partitioned by
list_id -> index dir with driver-state meta.json):
  spark-submit --py-files asf_tools_spark.zip jobs/ann_index_job.py \
      build --emb s3://bucket/embeddings/ --index s3://bucket/ann_index \
      --k 256 --m 8 --nbits 8

Query (reads ONLY the probed list partitions — partition pruning):
  spark-submit ... jobs/ann_index_job.py query --index s3://bucket/ann_index \
      --emb s3://bucket/queries/ --topk 10 --nprobe 4 --out s3://bucket/hits

Local smoke:
  python jobs/ann_index_job.py build --emb /root/testdata/sf0.001/embeddings.parquet \
      --index /tmp/ann_index --k 4 --master 'local[4]'
  python jobs/ann_index_job.py query --index /tmp/ann_index \
      --emb /root/testdata/sf0.001/embeddings.parquet --master 'local[4]'
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["build", "query"])
    ap.add_argument("--emb", required=True, help="embeddings (build) / queries (query) parquet")
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--k", type=int, default=8, help="coarse lists (build)")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--nbits", type=int, default=4)
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--nqueries", type=int, default=3, help="first N vec_ids as queries")
    ap.add_argument("--out", default=None, help="hits output parquet (query)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from asf_tools_spark.operators import pq, similarity

    builder = SparkSession.builder.appName(f"ann-index-{args.mode}")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    if args.mode == "build":
        emb = spark.read.parquet(args.emb)
        cents = similarity.kmeans_fit(emb, k=args.k, n_iters=3, seed=0)
        cb = pq.pq_train_residual(emb, cents, m=args.m, nbits=args.nbits, seed=0)
        codes = pq.ivfpq_encode(emb, cents, cb).select("vec_id", "list_id", "pq_code")
        pq.save_ivfpq_index(codes, cents, cb, args.index)
        n = spark.read.parquet(f"{args.index}/codes").count()
        print(f"indexed {n} vectors into {args.k} lists at {args.index}")
    else:
        codes, cents, cb = pq.load_ivfpq_index(spark, args.index)
        queries = spark.read.parquet(args.emb).where(F.col("vec_id") < args.nqueries)
        hits = pq.ivfpq_topk(codes, queries, cents, cb, k=args.topk, nprobe=args.nprobe)
        if args.out:
            hits.write.mode("overwrite").parquet(args.out)
            print(f"wrote hits to {args.out}")
        else:
            for r in hits.collect():
                print(r)
    spark.stop()


if __name__ == "__main__":
    main()

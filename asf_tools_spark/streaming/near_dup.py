"""Incremental near-dup detection over a page stream.

Exact-dup streaming is ``streaming.dedup`` (watermarked dropDuplicates);
NEAR-dup needs an index that outlives the micro-batch, so this operator
maintains an append-only **LSH band store** via ``foreachBatch``:

per micro-batch:
  1. MinHash signatures of the new pages (same operators.dedup expressions
     as batch — stream and batch agree on what a near-dup is);
  2. banded bucket rows for the batch;
  3. equi-join batch bands against the ACCUMULATED band store ->
     cross-batch candidate pairs (plus within-batch pairs);
  4. append the batch's bands to the store.

The store is partitioned by (band_id, band bucket hash) parquet — at crawl
scale the join touches only matching buckets (partition pruning), and the
store grows O(docs x bands), never O(docs²). Candidate pairs still need the
exact-Jaccard verify (operators.dedup.jaccard_on_pairs) downstream, exactly
like the batch pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import lsh_candidate_pairs, minhash_signatures


def _bands(sigs: DataFrame, key: str, bands: int, rows_per_band: int) -> DataFrame:
    cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        cols.append(F.struct(F.lit(b).alias("band_id"), F.concat_ws("|", *parts).alias("band_val")))
    return sigs.select(key, F.explode(F.array(*cols)).alias("bv")).select(
        key, F.col("bv.band_id").alias("band_id"), F.col("bv.band_val").alias("band_val")
    )


class NearDupIndexer:
    """foreachBatch sink: maintains the band store and an output table of
    candidate pairs (key_a < key_b, deduplicated per batch)."""

    def __init__(
        self, store_dir: str, pairs_dir: str, key: str = "url",
        text_col: str = "text", n_hashes: int = 8, bands: int = 4, rows_per_band: int = 2,
    ):
        self.store_dir = store_dir
        self.pairs_dir = pairs_dir
        self.key = key
        self.text_col = text_col
        self.n_hashes = n_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = minhash_signatures(batch_df, self.key, self.text_col, self.n_hashes)
        new_bands = _bands(sigs, self.key, self.bands, self.rows_per_band).persist()

        # within-batch pairs (the batch pipeline verbatim)
        pairs = lsh_candidate_pairs(sigs, self.key, self.bands, self.rows_per_band)

        # cross-batch pairs: new bands vs the accumulated store
        if os.path.isdir(self.store_dir):
            store = spark.read.parquet(self.store_dir)
            cross = (
                new_bands.alias("n")
                .join(store.alias("s"), ["band_id", "band_val"])
                .where(F.col(f"n.{self.key}") != F.col(f"s.{self.key}"))
                .select(
                    F.least(F.col(f"n.{self.key}"), F.col(f"s.{self.key}")).alias("key_a"),
                    F.greatest(F.col(f"n.{self.key}"), F.col(f"s.{self.key}")).alias("key_b"),
                )
                .distinct()
            )
            pairs = pairs.unionByName(cross).distinct()

        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(self.pairs_dir)
        new_bands.write.mode("append").parquet(self.store_dir)
        new_bands.unpersist()


def start_near_dup(
    pages: DataFrame, store_dir: str, pairs_dir: str, checkpoint_dir: str,
    key: str = "url", **kwargs,
):
    indexer = NearDupIndexer(store_dir, pairs_dir, key=key, **kwargs)
    return (
        pages.writeStream.outputMode("append")
        .foreachBatch(indexer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

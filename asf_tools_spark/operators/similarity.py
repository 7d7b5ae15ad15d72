"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline — broadcast the (small)
  query set, JVM-side dot products via zip_with/aggregate, window rank
- LSH-bucketed ANN: random-hyperplane buckets with multi-probe — the scale
  path (per-bucket joins instead of the full cross product)
- IVF: coarse centroid assignment + nprobe nearest lists
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def dot_cols(a: str | Column, b: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def norm_col(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine_topk_bruteforce(
    emb: DataFrame, queries: DataFrame, key: str = "vec_id", vec_col: str = "embedding", k: int = 5
) -> DataFrame:
    """Exact top-k by cosine for each query vector. The query set is
    broadcast (small side); the corpus streams through one whole-stage
    codegen pass; the only shuffle is the per-query top-k window."""
    q = F.broadcast(
        queries.select(F.col(key).alias("q_id"), F.col(vec_col).alias("q_vec"))
    )
    joined = emb.select(F.col(key).alias("c_id"), F.col(vec_col).alias("c_vec")).crossJoin(q)
    joined = joined.where(F.col("q_id") != F.col("c_id"))
    cos = dot_cols("q_vec", "c_vec") / (norm_col("q_vec") * norm_col("c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def _hyperplane_bucket(vec_col: str, planes: np.ndarray) -> Column:
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long"))
    return bucket


def cosine_topk_lsh(
    emb: DataFrame, queries: DataFrame, key: str = "vec_id", vec_col: str = "embedding",
    k: int = 5, n_planes: int = 6, seed: int = 7, dim: int | None = None,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: corpus and queries bucketed by hyperplane sign bits;
    candidates = same bucket or any bucket within ``multiprobe`` flipped
    bits (ring expansion in Hamming space — the embedding-space analogue of
    the cell k-ring). Recall < 1 by design; rank within candidates exact."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))

    corpus = emb.select(F.col(key).alias("c_id"), F.col(vec_col).alias("c_vec")).withColumn(
        "bucket", _hyperplane_bucket("c_vec", planes)
    )
    q = queries.select(F.col(key).alias("q_id"), F.col(vec_col).alias("q_vec")).withColumn(
        "bucket", _hyperplane_bucket("q_vec", planes)
    )
    probes = [F.col("bucket")]
    if multiprobe >= 1:
        probes += [F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    q = q.withColumn("probe", F.explode(F.array(*probes))).drop("bucket")

    cand = F.broadcast(q).join(corpus, q["probe"] == corpus["bucket"]).where(
        F.col("q_id") != F.col("c_id")
    )
    cos = dot_cols("q_vec", "c_vec") / (norm_col("q_vec") * norm_col("c_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        cand.withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_assign(emb: DataFrame, centroids: np.ndarray, key: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Coarse IVF list assignment: nearest centroid by cosine (centroids are
    a small seed-deterministic sample or k-means output, shipped as
    literals). Partitioning the corpus by ``list_id`` co-locates each
    inverted list — the probe join then touches only nprobe lists."""
    best_id = F.lit(-1)
    best_cos = F.lit(-2.0)
    n = norm_col(vec_col)
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        cn = float(np.linalg.norm(c))
        cos = dot_cols(F.col(vec_col), lit) / (n * F.lit(cn))
        cond = cos > best_cos
        best_id = F.when(cond, F.lit(i)).otherwise(best_id)
        best_cos = F.when(cond, cos).otherwise(best_cos)
    return emb.withColumn("list_id", best_id).withColumn("list_cosine", best_cos)

"""Corpus sampling operators for training-data pipelines: deterministic
hash-based stratified sampling (per-source mixture weights, the standard
"upsample wikipedia, downsample common-crawl" recipe) and train/val/test
split assignment.

Both are pure narrow Catalyst transformations — no shuffle, no RNG state:
the keep/split decision is a function of md5(key) alone, so it is stable
across retries, partitioning, and cluster size (the property that matters
at 100 TB: a re-run or a late-arriving partition makes identical
decisions). The literal rate table constant-folds into the CASE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import hash8_col

_DENOM = 1_000_000


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0, 1): md5-derived (oracle.hash8_sql
    idiom — cross-engine exact, unlike rand(seed))."""
    return (hash8_col(key, salt) % _DENOM) / F.lit(float(_DENOM))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "smp-",
) -> DataFrame:
    """Adds boolean ``kept``: row survives with its stratum's rate."""
    u = hash_uniform(F.col(key), salt)
    rate = None
    for s, r in rates.items():
        cond = F.col(strata_col) == s
        rate = F.when(cond, float(r)) if rate is None else rate.when(cond, float(r))
    rate = rate.otherwise(float(default_rate)) if rate is not None else F.lit(float(default_rate))
    return df.withColumn("kept", u < rate)


def pack_sequences(
    df: DataFrame, key: str, token_col: str, budget: int,
    n_buckets: int = 64, salt: str = "pack-",
) -> DataFrame:
    """Sequence packing for LLM training: assign each document to a
    training-sequence bin so per-bin token sums approach ``budget`` —
    the step that turns a document table into fixed-length batches.

    Scale shape: documents are hash-bucketed (``n_buckets`` independent
    packing streams — each window sorts ONE bucket, never a global
    order), then greedily packed by running token total within the
    bucket: bin = floor(prefix_sum / budget). Deterministic (hash order),
    one shuffle. Approximation contract: a document straddling a budget
    boundary stays in the bin where its prefix started, so a bin can
    overflow by at most max(doc tokens) - 1; callers that need hard caps
    truncate at read time. Output adds (bucket, bin_id, bin_pos).
    """
    from pyspark.sql.window import Window

    bucket = (hash8_col(F.col(key), salt) % n_buckets).alias("bucket")
    out = df.withColumn("bucket", bucket)
    w = Window.partitionBy("bucket").orderBy(hash8_col(F.col(key), salt + "o"), key)
    prefix = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        out.withColumn("bin_id", F.floor(prefix / budget).cast("long"))
        .withColumn("bin_pos", F.row_number().over(
            Window.partitionBy("bucket", "bin_id").orderBy(
                hash8_col(F.col(key), salt + "o"), key
            )
        ))
    )


def split_assign(
    df: DataFrame,
    key: str,
    weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
    names: tuple[str, str, str] = ("train", "val", "test"),
    salt: str = "spl-",
) -> DataFrame:
    """Adds string ``split``: hash-deterministic train/val/test assignment
    (stable under re-runs; no leakage between splits on re-shards)."""
    u = hash_uniform(F.col(key), salt)
    c1, c2 = float(weights[0]), float(weights[0] + weights[1])
    return df.withColumn(
        "split",
        F.when(u < c1, names[0]).when(u < c2, names[1]).otherwise(names[2]),
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "wsmp-",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006,
    "A-ES"): every row gets score = ln(u) / w with u a deterministic
    md5-derived uniform in (0, 1); the k LARGEST scores are exactly a
    weight-proportional sample without replacement — the corpus-mixing
    primitive ("sample 10B tokens, weighting quality^2") that a plain
    rate filter can't express when weights are continuous.

    Deterministic (no RNG state): re-runs, retries, and re-partitions
    pick the identical sample, and the DuckDB oracle replays the exact
    selection. Top-k rides sort+limit (TakeOrdered: per-partition heaps +
    one k-row merge at the driver, never a global sort). Rows with
    weight <= 0 can never be sampled and are excluded up front.

    Output: (key, weight, score round-6) for the k selected rows.
    """
    w = F.col(weight_col).cast("double")
    # (h + 1) / (2^32 + 1) keeps u strictly inside (0, 1): u = 0 would
    # send ln(u) to -inf and u = 1 would tie every weight at score 0
    u = (hash8_col(F.col(key), salt) + 1) / F.lit(float((1 << 32) + 1))
    score = F.log(u) / w
    return (
        df.where(w > 0)
        .select(
            F.col(key),
            w.alias("weight"),
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(key).asc())
        .limit(k)
    )

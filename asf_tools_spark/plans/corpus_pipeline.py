"""End-to-end training-corpus curation pipeline — the composition a corpus
team actually runs, as ONE Spark plan chain:

  quality filter (heuristics + Gopher repetition screens)
  -> PII scrub
  -> line-level boilerplate dedup (CCNet)
  -> exact dedup (hash-groupBy)
  -> near-dup dedup (MinHash -> LSH -> Jaccard verify -> clusters)
  -> stratified mixture sampling + train/val/test split

Every stage is a documented operator from operators/{text,dedup,sampling};
this module only composes them and reports the funnel. All decisions are
hash-deterministic, so a re-run (or a late partition) reproduces the same
corpus — the property that makes the pipeline restartable at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..operators import dedup, sampling, text


@dataclass
class CorpusPipelineConfig:
    key: str = "doc_id"
    min_quality: float = 0.5
    min_distinct_frac: float = 0.3
    max_top_bigram_frac: float = 0.5
    line_max_docs: int = 5
    n_minhash: int = 8
    bands: int = 2
    rows_per_band: int = 4
    jaccard_threshold: float = 0.8
    sample_rates: dict = field(default_factory=dict)  # source -> rate
    default_rate: float = 1.0


def curate_corpus(
    docs: DataFrame, cfg: CorpusPipelineConfig = CorpusPipelineConfig()
) -> dict:
    """Returns {"corpus": final DataFrame, "funnel": [(stage, rows)],
    "release": callable} — call release() once the corpus frame has been
    consumed (written/collected) to unpersist the cached stage frames;
    leaving them cached starves later jobs in the same session.

    The funnel counts execute one action per stage boundary; each stage
    frame is persisted BEFORE its count so the count pass materializes the
    stage once and every later stage (and the caller's final write) reads
    the cache instead of re-running the whole upstream chain — without the
    persists the funnel is O(stages^2) full passes (and the repo's measured
    lazy-cache race on multi-branch reads applies). The final corpus frame
    stays lazy for the caller to write; intermediates are unpersisted once
    their successor is materialized. Stages share no driver state beyond
    tiny keep-lists."""
    key = cfg.key
    cached = []

    def _stage(name: str, df: DataFrame) -> DataFrame:
        df = df.persist()
        funnel.append((name, df.count()))
        # predecessor is no longer needed once this stage is materialized
        if len(cached) > 1:
            cached.pop(0).unpersist()
        cached.append(df)
        return df

    funnel = [("input", docs.count())]

    quality = text.quality_features(docs)
    rep = text.repetition_signals(docs, key)
    screened = (
        quality.join(rep.select(key, "distinct_frac", "top_bigram_frac"), key)
        .where(
            (F.col("quality_score") >= cfg.min_quality)
            & (F.col("distinct_frac") >= cfg.min_distinct_frac)
            & (F.col("top_bigram_frac") <= cfg.max_top_bigram_frac)
        )
        .select(*docs.columns)
    )
    screened = _stage("quality_screen", screened)

    scrubbed = text.pii_scrub(screened).drop("text").withColumnRenamed("scrubbed", "text")
    scrubbed = scrubbed.select(*docs.columns, "n_emails", "n_longnums")

    lines = text.line_dedup(scrubbed, key, max_docs=cfg.line_max_docs)
    deboiler = (
        scrubbed.drop("text")
        .join(lines.where(F.col("n_kept") > 0), key)
        .withColumnRenamed("kept_text", "text")
        .drop("n_lines", "n_kept")
    )
    deboiler = _stage("line_dedup", deboiler)

    exact_keep = dedup.exact_dedup(deboiler, key).select(
        F.col(f"keep_{key}").alias(key)
    )
    exacted = _stage("exact_dedup", deboiler.join(exact_keep, key, "left_semi"))

    sigs = dedup.minhash_signatures(exacted, key, n_hashes=cfg.n_minhash)
    pairs = dedup.lsh_candidate_pairs(sigs, key, cfg.bands, cfg.rows_per_band)
    sh = dedup.word_shingles(exacted, key)
    verified = (
        dedup.jaccard_on_pairs(pairs, sh, key)
        .where(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("key_a", "key_b")
    )
    edges = verified.unionByName(dedup.identical_signature_edges(sigs, key)).distinct()
    clusters = dedup.near_dup_clusters(exacted.select(key), edges, key)
    neared = _stage(
        "near_dedup",
        exacted.join(clusters.where(F.col("keep")).select(key), key, "left_semi"),
    )

    sampled = sampling.split_assign(
        sampling.stratified_sample(
            neared, key, "source", cfg.sample_rates, cfg.default_rate
        ),
        key,
    ).where(F.col("kept")).drop("kept")
    sampled = _stage("sampled", sampled)

    def release() -> None:
        while cached:
            cached.pop().unpersist()

    return {"corpus": sampled, "funnel": funnel, "release": release}

"""Corpus term-weighting and retrieval scoring — TF-IDF and BM25
(Robertson & Sparck Jones; the Okapi BM25 of every web-scale search and
data-curation stack; public literature). A 100 TB corpus engine needs
these both as retrieval primitives and as curation signals (keyword
extraction, query-focused filtering of training data).

Spark-first shapes (no UDFs anywhere):

- term frequencies: ONE explode of normalized tokens + groupBy(doc, term)
  — the same postings shape as the dedup family, partial-aggregated
  map-side;
- document frequencies: a second aggregate over the (doc, term) pairs (NOT
  over raw occurrences — df counts docs, and the pair table is already
  distinct), joined back BY TERM. At corpus scale the df table is
  vocabulary-sized: skewed mega-terms ("the") are exactly the rows the
  broadcast hint avoids shuffling the postings for;
- BM25 queries: the query term set is a literal broadcast — scoring is a
  semi-join of the postings to the query terms, then one per-doc sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import normalize_text


def term_counts(df: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """(key, term, tf): per-document term frequencies over normalized
    whitespace tokens. One explode + one partial-aggregated groupBy.
    (fan_out measured a net LOSS here: the split+explode is light, and the
    extra exchange re-executes per broadcast subtree — A/B 1.34s vs 2.18s
    on bm25_search at sf0.1.)"""
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    toks = df.select(F.col(key), F.explode(F.split(norm, " ")).alias("term")).where(
        F.length("term") > 0
    )
    return toks.groupBy(key, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))


def tfidf_terms(
    df: DataFrame, key: str, text_col: str = "text", top_k: int | None = None,
) -> DataFrame:
    """(key, term, tf, df_docs, tfidf): smooth TF-IDF
    ``tf * ln((N + 1) / (df + 1))`` per (doc, term); with ``top_k``, only
    each document's k highest-weighted terms survive (ties break to the
    lexicographically smaller term — deterministic, oracle-matched).

    N rides a scalar subquery-style cross join of one aggregated row (a
    broadcast nested loop of 1 row, not a collect)."""
    tc = term_counts(df, key, text_col)
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("_n"))
    dfreq = tc.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_docs"))
    out = (
        tc.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + 1.0) / (F.col("df_docs") + 1.0)),
                6,
            ),
        )
        .drop("_n")
    )
    if top_k is not None:
        w = Window.partitionBy(key).orderBy(
            F.col("tfidf").desc(), F.col("term").asc()
        )
        out = (
            out.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= top_k)
            .drop("_rk")
        )
    return out.select(key, "term", "tf", "df_docs", "tfidf")


def bm25_scores(
    df: DataFrame, query_terms: list[str], key: str, text_col: str = "text",
    k1: float = 1.2, b: float = 0.75, top_k: int | None = None,
) -> DataFrame:
    """(key, bm25): Okapi BM25 of each document against a fixed query term
    set, the retrieval scorer:

        sum over query terms t of
          idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len/avgdl))
        idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    Only documents matching at least one query term appear. The query set
    is a literal; postings are semi-joined to it FIRST, so df/idf and the
    final per-doc sum run over the matched slice only — the corpus-wide
    stats (N, avgdl) come from one aggregated row, broadcast."""
    tc = term_counts(df, key, text_col)
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    dl = df.select(
        F.col(key),
        F.when(F.length(norm) == 0, F.lit(0)).otherwise(
            F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
        ).cast("long").alias("_dl"),
    )
    stats = dl.select(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    q = F.broadcast(
        tc.sparkSession.createDataFrame([(t,) for t in query_terms], ["term"])
    )
    matched = tc.join(q, "term")
    dfreq = matched.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .join(dl, key)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
        .groupBy(key)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
    )
    if top_k is not None:
        # sort+limit plans TakeOrderedAndProject (per-partition heaps +
        # one driver merge of k rows) — NOT a global row_number window,
        # which would funnel every matched doc through one partition
        scored = scored.orderBy(F.col("bm25").desc(), F.col(key).asc()).limit(top_k)
    return scored


def chi2_terms(
    df: DataFrame, key: str, label: str, text_col: str = "text",
    min_df: int = 5, top_k: int | None = 30,
) -> DataFrame:
    """(term, df_docs, chi2): chi-square association between term PRESENCE
    and a document label (language, source, quality bucket) — the classic
    feature-selection / domain-drift screen (the fastText-era supervised
    vocabulary pruning; Yang & Pedersen 1997, public literature).

    Full 2 x L contingency per term: observed = docs of label l containing
    the term; both the present and absent rows contribute (o - e)^2 / e.
    Terms never seen with a label still contribute that label's cells —
    the label-marginal frame (L rows, tiny) is CROSS-JOINED onto the
    vocabulary and the observed counts are left-joined with a 0 fill, so
    no cell is silently dropped. Shapes: the postings explode + two hash
    aggregates (presence, df), one broadcast L-row replication, one
    vocabulary-keyed left join; top-k via sort+limit (TakeOrdered), never
    a global window. Degenerate cells (a term in EVERY doc makes the
    absent-row e = 0) contribute 0 by the standard convention.
    """
    pres = term_counts(df, key, text_col).select(key, "term")
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("_n"))
    coltot = (
        df.groupBy(label)
        .agg(F.count(F.lit(1)).cast("long").alias("_cl"))
        .crossJoin(F.broadcast(n_docs))
    )
    rowtot = pres.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs")
    )
    if min_df:
        rowtot = rowtot.where(F.col("df_docs") >= min_df)
    obs = (
        pres.join(df.select(key, label), key)
        .groupBy("term", label)
        .agg(F.count(F.lit(1)).cast("long").alias("_o"))
    )
    cells = (
        rowtot.crossJoin(F.broadcast(coltot))
        .join(obs, ["term", label], "left")
        .withColumn("_o", F.coalesce(F.col("_o"), F.lit(0)))
    )
    e_p = F.col("df_docs") * F.col("_cl") / F.col("_n")
    e_a = (F.col("_n") - F.col("df_docs")) * F.col("_cl") / F.col("_n")
    o_a = F.col("_cl") - F.col("_o")
    contrib = F.when(
        e_p > 0, (F.col("_o") - e_p) * (F.col("_o") - e_p) / e_p
    ).otherwise(0.0) + F.when(e_a > 0, (o_a - e_a) * (o_a - e_a) / e_a).otherwise(
        0.0
    )
    out = (
        cells.withColumn("_x", contrib)
        .groupBy("term", "df_docs")
        .agg(F.round(F.sum("_x"), 6).alias("chi2"))
    )
    if top_k is not None:
        out = out.orderBy(F.col("chi2").desc(), F.col("term").asc()).limit(top_k)
    return out.select("term", "df_docs", "chi2")

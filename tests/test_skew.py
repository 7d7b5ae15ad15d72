"""Skew safety of the corpus operators: a pathologically hot key (one
boilerplate line / one dominant term in half the corpus) must stay a
map-side-combined partial aggregate — the shuffle carries one row per
(partition, key), never the raw occurrences — and results stay exact."""

from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_line_dedup_hot_line_is_partial_aggregated(spark):
    from asf_tools_spark.operators.text import line_dedup

    banner = "accept cookies now"
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(banner + "\nunique body "), F.col("id").cast("string")
        ).alias("text"),
    ).repartition(16)
    out = line_dedup(docs, "doc_id", max_docs=5)
    # two-phase aggregate on the doc-frequency count: partial_ before the
    # exchange means the 4000 hot-line rows collapse to <=16 partials
    plan = _plan(out)
    assert "partial_count" in plan or "partial_finalmerge" in plan.lower() or \
        plan.count("HashAggregate") >= 2
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 4000
    assert all(r.n_lines == 2 and r.n_kept == 1 for r in rows.values())
    assert rows[7].kept_text == "unique body 7"  # banner gone everywhere


def test_top_ngrams_dominant_term_exact_under_skew(spark):
    from asf_tools_spark.operators.text import top_ngrams

    docs = spark.range(5000).select(
        F.when(F.col("id") % 2 == 0, "hot term pair")
        .otherwise(F.concat(F.lit("cold word "), F.col("id").cast("string")))
        .alias("text")
    ).repartition(16)
    # "cold word" also repeats 2500x (every odd doc) — three-way tie,
    # deterministic tie-break on the ngram string
    top = top_ngrams(docs, n=2, k=3).collect()
    assert [(r.ngram, r.cnt) for r in top] == [
        ("cold word", 2500), ("hot term", 2500), ("term pair", 2500)
    ]

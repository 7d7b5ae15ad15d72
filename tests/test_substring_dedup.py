"""Substring-level exact dedup (Lee et al. 2022 ExactSubstr shape):
planted-span removal, keep-first canonical semantics, within-doc repeats,
hashed-vs-raw gram key equivalence."""

import pytest
from pyspark.sql import functions as F

from asf_tools_spark.operators.substring import substring_dedup

SPAN = "the quick brown fox jumps over the lazy dog again"  # 10 tokens


def _run(spark, docs, n=8, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in substring_dedup(df, "doc_id", n=n, **kw).collect()}


def test_planted_span_dropped_keep_first(spark):
    got = _run(spark, [
        (0, f"alpha start {SPAN} tail zero"),
        (1, f"beta opening words {SPAN} beta ending"),
        (2, "totally unique content with no duplication here at all"),
        (3, None),
        (4, "short doc"),
    ])
    # canonical (first (doc_id, pos)) copy survives intact
    assert got[0].n_dropped == 0
    assert SPAN in got[0].dedup_text
    # later copy loses exactly the 10-token span, surrounding text kept
    assert got[1].n_dropped == 10
    assert got[1].dedup_text == "beta opening words beta ending"
    assert got[2].n_dropped == 0
    assert got[3].dedup_text == "" and got[3].n_dropped == 0  # NULL text
    assert got[4].n_dropped == 0  # below n tokens: no grams, never dropped


def test_three_copies_only_first_survives(spark):
    got = _run(spark, [
        (7, f"one {SPAN} x"),
        (8, f"two {SPAN} y"),
        (9, f"three {SPAN} z"),
    ])
    assert got[7].n_dropped == 0 and SPAN in got[7].dedup_text
    assert got[8].dedup_text == "two y" and got[8].n_dropped == 10
    assert got[9].dedup_text == "three z" and got[9].n_dropped == 10


def test_within_doc_repeat_dropped(spark):
    got = _run(spark, [(0, f"{SPAN} middle words here {SPAN}")])
    # corpus-wide count >= 2 includes same-doc repeats: second copy goes
    assert got[0].n_dropped == 10
    assert got[0].dedup_text == f"{SPAN} middle words here"


def test_spans_below_n_survive(spark):
    seven = "seven shared tokens appear here twice yes"  # 7 tokens < n=8
    got = _run(spark, [(0, f"first {seven} a"), (1, f"second {seven} b")])
    assert got[0].n_dropped == 0 and got[1].n_dropped == 0


def test_hashed_grams_match_raw(spark):
    """Default hash_grams=True (8-byte xxhash64 shuffle keys) must produce
    exactly the raw-gram-string result on real testdata."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashed = substring_dedup(docs, "doc_id", n=8)
    raw = substring_dedup(docs, "doc_id", n=8, hash_grams=False)
    assert sorted(map(tuple, hashed.collect())) == sorted(map(tuple, raw.collect()))
    # and testdata actually exercises the operator (near-dup docs share
    # long spans) — a zero-drop corpus would make this suite vacuous
    assert hashed.agg(F.sum("n_dropped")).first()[0] > 0


def test_overlapping_spans_canonical_protection(spark):
    """A doc that IS the canonical owner of a span keeps it even when the
    same positions are covered by later-duplicated grams from another doc
    pair — canonical coverage wins over duplicate coverage."""
    got = _run(spark, [
        (0, f"{SPAN}"),              # canonical owner, exactly the span
        (1, f"prefix {SPAN} suffix"),
    ])
    assert got[0].n_dropped == 0 and got[0].dedup_text == SPAN
    assert got[1].dedup_text == "prefix suffix"

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


def _ref_substring_dedup(docs: dict[int, str], n: int) -> dict[int, tuple]:
    """Independent pure-Python reference of the documented semantics:
    O(n^2)-ish, written from the spec, shares no code with the operator."""
    import re

    toks = {
        d: re.sub(r"\s+", " ", (t or "").lower()).strip().split(" ")
        for d, t in docs.items()
    }
    occ: dict[str, list] = {}
    for d in sorted(toks):
        ws = toks[d]
        for p in range(1, len(ws) - n + 2):
            occ.setdefault(" ".join(ws[p - 1:p - 1 + n]), []).append((d, p))
    dup: dict[int, set] = {d: set() for d in toks}
    canon: dict[int, set] = {d: set() for d in toks}
    for g, lst in occ.items():
        if len(lst) >= 2:
            for d, p in lst:
                dup[d].add(p)
            cd, cp = min(lst)
            canon[cd].add(cp)
    out = {}
    for d, ws in toks.items():
        kept, dropped = [], 0
        for q in range(1, len(ws) + 1):
            rng = range(max(1, q - n + 1), q + 1)
            cov_d = any(p in dup[d] for p in rng)
            cov_c = any(p in canon[d] for p in rng)
            if cov_d and not cov_c:
                dropped += 1
            else:
                kept.append(ws[q - 1])
        out[d] = (len(ws), dropped, " ".join(kept))
    return out


def test_randomized_differential_vs_reference(spark):
    """30 random small corpora (tiny vocab so duplicate spans arise
    naturally) checked against an independent pure-Python implementation
    of the documented semantics — all in ONE Spark job: corpora are
    isolated by corpus-unique vocabularies, so cross-corpus grams never
    collide."""
    import random

    rng = random.Random(42)
    n = 3
    all_rows, expected = [], {}
    for ci in range(30):
        vocab = [f"c{ci}w{j}" for j in range(4)]
        docs = {}
        for di in range(rng.randint(2, 5)):
            length = rng.randint(0, 14)
            docs[ci * 1000 + di] = " ".join(rng.choice(vocab) for _ in range(length))
        for d, t in docs.items():
            all_rows.append((d, t))
        expected.update({d: v for d, v in _ref_substring_dedup(docs, n).items()})
    df = spark.createDataFrame(all_rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_dropped, r.dedup_text)
        for r in substring_dedup(df, "doc_id", n=n).collect()
    }
    assert got == expected


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

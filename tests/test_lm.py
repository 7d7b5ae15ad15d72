"""Bigram-LM perplexity (CCNet-style): hand-computed small-case pin,
unseen-word backoff, and ntile-vs-quantile bucket agreement."""

import math

from pyspark.sql import functions as F

from asf_tools_spark.operators import lm


def _hand_ppl(doc_tokens, uni, bi, v, a=0.1):
    s, n = 0.0, 0
    for w1, w2 in zip(doc_tokens, doc_tokens[1:]):
        p = (bi.get((w1, w2), 0) + a) / (uni.get(w1, 0) + a * v)
        s += math.log(p)
        n += 1
    return math.exp(-s / n)


def test_perplexity_hand_case(spark):
    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog sat")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "the dog ran"), (12, "xx yy")],
        "doc_id long, text string",
    )
    model = lm.train_bigram_lm(train)
    got = {
        r.doc_id: (r.n_bigrams, r.ppl)
        for r in lm.perplexity(score, "doc_id", model).collect()
    }
    uni = {"the": 2, "cat": 2, "sat": 2, "ran": 1, "a": 1, "dog": 1}
    bi = {
        ("the", "cat"): 2, ("cat", "sat"): 1, ("cat", "ran"): 1,
        ("a", "dog"): 1, ("dog", "sat"): 1,
    }
    v = 6
    for doc_id, toks in [
        (10, ["the", "cat", "sat"]),
        (11, ["the", "dog", "ran"]),
        (12, ["xx", "yy"]),  # fully unseen -> every bigram backs off to 1/V
    ]:
        n, ppl = got[doc_id]
        assert n == len(toks) - 1
        assert ppl == __import__("pytest").approx(_hand_ppl(toks, uni, bi, v))
    # unseen-everything doc scores exactly the uniform-backoff perplexity
    assert got[12][1] == __import__("pytest").approx((0.1 * v) / 0.1)


def test_short_docs_dropped(spark):
    train = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "a b"), (2, "single"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = lm.perplexity(score, "doc_id", lm.train_bigram_lm(train))
    assert [r.doc_id for r in out.collect()] == [1]


def test_bucket_modes_agree_on_spread(spark):
    # 9 docs with well-separated perplexities: the approx-quantile split
    # must match the exact ntile tertiles (boundaries fall in wide gaps)
    train = spark.createDataFrame(
        [(1, "a b " * 20)], "doc_id long, text string"
    )
    rows = [(i, "a b " * 20) for i in range(3)]
    rows += [(i, "a b c d " + "a b " * 10) for i in range(3, 6)]
    rows += [(i, "q w e r t y u i o p") for i in range(6, 9)]
    score = spark.createDataFrame(rows, "doc_id long, text string")
    scored = lm.perplexity(score, "doc_id", lm.train_bigram_lm(train))
    nt = {r.doc_id: r.bucket for r in lm.ccnet_buckets(scored, "doc_id").collect()}
    qt = {
        r.doc_id: r.bucket
        for r in lm.ccnet_buckets(scored, "doc_id", mode="quantile").collect()
    }
    assert nt == qt
    assert sorted(set(nt.values())) == ["head", "middle", "tail"]

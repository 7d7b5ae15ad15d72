"""Model-based quality classifier: planted separable corpora, weak-label
bootstrap on testdata, generalization beyond the labeling rule."""

import random

import pytest
from pyspark.sql import functions as F

from asf_tools_spark.operators import classifier


NATURAL = ("the quick brown fox jumps over a lazy dog while many people "
           "watch the bright morning sky and talk about simple things").split()
SPAMMY = ["buy", "now", "click", "win", "free"]


def _corpus(n=120, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            words = [rng.choice(NATURAL) for _ in range(rng.randint(15, 30))]
            label = 1.0
        else:
            w = rng.choice(SPAMMY)
            words = [w] * rng.randint(15, 30)  # repeated-token spam
            label = 0.0
        rows.append((i, " ".join(words), label))
    return rows


def test_planted_separation_and_generalization(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    train = df.where(F.col("doc_id") < 80)
    test = df.where(F.col("doc_id") >= 80)
    model = classifier.train_quality_classifier(
        train.select("doc_id", "text"), train.select("doc_id", "label"),
        "doc_id", n_features=1 << 12, max_iter=20,
    )
    scored = classifier.score_quality(model, test, "doc_id")
    got = {r.doc_id: (r.model_quality, r.label) for r in scored.collect()}
    assert len(got) == 40
    acc = sum(1 for p, y in got.values() if (p >= 0.5) == (y == 1.0)) / len(got)
    assert acc >= 0.95  # held-out docs, unseen token mixes
    # probabilities are calibrated directionally: natural >> spam
    nat = [p for p, y in got.values() if y == 1.0]
    spam = [p for p, y in got.values() if y == 0.0]
    assert min(nat) > max(spam)


def test_weak_label_bootstrap_on_testdata(spark):
    """Train on heuristic weak labels over real testdata; the model must
    RANK held-out docs usefully by the rules' judgment (distillation
    sanity). Ranking (AUC), not 0.5-threshold accuracy, is the contract:
    the heuristic boundary is mostly length/ratio-shaped — only partially
    visible to a bag-of-hashed-ngrams — and in production the cut point is
    picked per token budget anyway (measured here: AUC ~0.73 while
    threshold-0.5 accuracy trails the majority class)."""
    import numpy as np

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # thresholds chosen so BOTH classes are well populated on this corpus
    # (defaults pass ~96% of the synthetic docs — measured)
    labels = classifier.weak_labels(
        docs, "doc_id", min_quality=0.7, min_distinct_frac=0.5
    )
    pos = labels.agg(F.avg("label")).first()[0]
    assert 0.05 < pos < 0.95  # both classes present in the seed
    train_keys = docs.where(F.col("doc_id") % 5 != 0).select("doc_id")
    model = classifier.train_quality_classifier(
        docs.join(train_keys, "doc_id").select("doc_id", "text"),
        labels.join(train_keys, "doc_id"),
        "doc_id", n_features=1 << 14,
    )
    held = docs.where(F.col("doc_id") % 5 == 0)
    scored = classifier.score_quality(model, held, "doc_id").join(labels, "doc_id")
    rows = scored.select("model_quality", "label").collect()
    p = np.array([r.model_quality for r in rows])
    y = np.array([r.label for r in rows])
    order = np.argsort(p)
    ranks = np.empty(len(p))
    ranks[order] = np.arange(1, len(p) + 1)
    n1, n0 = int((y == 1).sum()), int((y == 0).sum())
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert auc >= 0.65  # measured 0.725 on held-out docs


def test_score_is_narrow_no_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    labels = classifier.weak_labels(docs, "doc_id")
    model = classifier.train_quality_classifier(
        docs.select("doc_id", "text"), labels, "doc_id", n_features=1 << 12,
        max_iter=5,
    )
    scored = classifier.score_quality(model, docs, "doc_id")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scoring shuffles nothing


def test_frozen_scorer_matches_pure_python_replay(spark):
    """score_quality_frozen (Catalyst: F.hash + pmod + aggregate + sigmoid)
    vs a plain-Python replay of the same frozen weights — pins
    tokenization, hashing, and arithmetic parity in-test, the same
    two-implementation check the classifier_score golden oracle rides."""
    import math
    import re

    from asf_tools_spark.core.xxh import murmur3_string

    n_features = 256
    rng = random.Random(11)
    weights = {i: round(rng.uniform(-2, 2), 6) for i in rng.sample(range(n_features), 40)}
    dense = [weights.get(i, 0.0) for i in range(n_features)]
    intercept = -0.375
    rows = [(i, t) for i, (_, t, _) in enumerate(_corpus(n=30, seed=9))]
    rows.append((98, None))   # NULL text
    rows.append((99, "   "))  # whitespace-only text
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        r.doc_id: r.model_quality
        for r in classifier.score_quality_frozen(
            docs, "doc_id", dense, intercept, n_features=n_features
        ).collect()
    }

    def replay(text):
        norm = re.sub(r"\s+", " ", (text or "").lower()).strip()
        ws = norm.split(" ")
        toks = ws + (["_".join(p) for p in zip(ws, ws[1:])] if len(ws) >= 2 else [])
        dot = intercept + sum(
            weights.get(((murmur3_string(t) % n_features) + n_features) % n_features, 0.0)
            for t in toks
        )
        return 1.0 / (1.0 + math.exp(-dot))

    for doc_id, text in rows:
        assert got[doc_id] == pytest.approx(replay(text), abs=1e-12), doc_id


def test_train_frozen_classifier_separates_planted(spark):
    rows = _corpus(n=120, seed=3)
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], "doc_id long, text string")
    labels = spark.createDataFrame([(i, l) for i, _, l in rows], "doc_id long, label double")
    weights, intercept = classifier.train_frozen_classifier(
        docs, labels, "doc_id", n_features=1 << 10, max_iter=30
    )
    got = {
        r.doc_id: r.model_quality
        for r in classifier.score_quality_frozen(
            docs, "doc_id", weights, intercept
        ).collect()
    }
    good = [got[i] for i, _, l in rows if l == 1.0]
    bad = [got[i] for i, _, l in rows if l == 0.0]
    assert min(good) > max(bad)  # clean margin on well-separated plants

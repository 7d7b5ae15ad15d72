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

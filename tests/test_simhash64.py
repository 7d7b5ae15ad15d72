"""64-bit SimHash scale path: planted-pair recall, pigeonhole-blocking
exactness vs an exhaustive numpy oracle, and sub-quadratic bucket volumes
(VERDICT r2 item 6 + the zero-length-block guard from ADVICE)."""

import numpy as np
import pandas as pd
import pytest

from asf_tools_spark.operators import dedup


def _corpus(spark):
    """200 distinct docs + 20 planted near-dups (1 word of 200 changed).

    A 1-of-200 substitution perturbs each bit's sign-sum by +-2 against a
    random walk of std ~14, flipping ~3-4 of the 64 bits in expectation —
    the planted pairs live at Hamming ~4, unrelated pairs at ~32."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(600)]
    docs, texts = [], []
    for i in range(200):
        words = list(rng.choice(vocab, size=200, replace=False))
        texts.append(words)
        docs.append((i, " ".join(words)))
    planted = []
    for j in range(20):
        base = texts[j]
        mutated = list(base)
        mutated[7] = f"x{j:03d}"  # one substitution
        docs.append((1000 + j, " ".join(mutated)))
        planted.append((j, 1000 + j))
    return spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"])), planted


def test_simhash64_uses_high_bits(spark):
    df, _ = _corpus(spark)
    sims = dedup.simhash(df, "doc_id", bits=64).collect()
    vals = [r.simhash for r in sims]
    # bit 63 is the sign bit of the packed long: with ~half the word-hash
    # sign-sums positive, some fingerprints must be negative
    assert any(v < 0 for v in vals) and any(v >= 0 for v in vals)
    # high 32 bits must actually vary (a 32-bit hash source would zero them)
    assert len({v >> 32 for v in vals}) > 10


def test_simhash64_planted_pair_recall(spark):
    df, planted = _corpus(spark)
    sim = dedup.simhash(df, "doc_id", bits=64)
    rows = {(r.doc_id): r.simhash for r in sim.collect()}
    # exhaustive numpy truth at max_distance=3
    ids = sorted(rows)
    # Spark longs are signed int64; view-cast to uint64 (a direct uint64
    # conversion of negative Python ints is deprecated in numpy >=1.24)
    vals = np.array([rows[i] for i in ids], dtype=np.int64).view(np.uint64)
    xor = vals[:, None] ^ vals[None, :]
    dist = np.array([[bin(int(x)).count("1") for x in row] for row in xor])
    true_pairs = {
        (ids[i], ids[j])
        for i in range(len(ids)) for j in range(i + 1, len(ids))
        if dist[i, j] <= 6
    }
    got = {
        (r.key_a, r.key_b)
        for r in dedup.hamming_near_pairs(sim, "doc_id", bits=64, max_distance=6).collect()
    }
    # pigeonhole blocking is lossless: the blocked join returns EXACTLY the
    # exhaustive <=6 set
    assert got == true_pairs
    # and the planted 1-word mutations are actually near-dups at 64 bits
    found_planted = sum(1 for p in planted if p in got)
    assert found_planted >= 16, f"only {found_planted}/20 planted pairs recalled"
    # unrelated docs sit near Hamming 32 — no false planted-level pairs flood in
    assert len(got) <= len(planted) + 20


def test_simhash64_buckets_subquadratic(spark):
    """At 64 bits the 4 pigeonhole blocks carry 16 bits each: bucket sizes
    stay tiny and total candidate volume is far below the O(n^2) the
    16-bit blocking degenerates to (5-6-bit blocks, <=64 bucket values)."""
    df, _ = _corpus(spark)
    n = df.count()
    from pyspark.sql import functions as F

    def bucket_volume(bits):
        sim = dedup.simhash(df, "doc_id", bits=bits)
        n_blocks = 4
        base, rem = divmod(bits, n_blocks)
        exprs, start = [], 0
        for i in range(n_blocks):
            ln = base + (1 if i < rem else 0)
            exprs.append(F.struct(
                F.lit(i).alias("blk_id"),
                F.shiftright("simhash", start).bitwiseAND(F.lit((1 << ln) - 1)).alias("blk_val"),
            ))
            start += ln
        blocked = sim.select(F.explode(F.array(*exprs)).alias("b")).select("b.blk_id", "b.blk_val")
        sizes = blocked.groupBy("blk_id", "blk_val").count()
        return sizes.agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("v")).collect()[0].v

    v64 = bucket_volume(64)
    v16 = bucket_volume(16)
    all_pairs = n * (n - 1) / 2
    assert v64 < 0.02 * all_pairs, f"64-bit volume {v64} not sub-quadratic vs {all_pairs}"
    assert v64 < v16 / 20, f"64-bit volume {v64} should be far below 16-bit {v16}"


def test_hamming_blocking_rejects_zero_length_blocks(spark):
    df, _ = _corpus(spark)
    sim = dedup.simhash(df, "doc_id", bits=4)
    with pytest.raises(ValueError, match="max_distance"):
        dedup.hamming_near_pairs(sim, "doc_id", bits=4, max_distance=4)

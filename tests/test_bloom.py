"""Bloom-filter join pruning: exactness (row-identical to the plain
join), no false negatives, real pruning, and driver memory bounded by
filter bits rather than dim cardinality."""

from pyspark.sql import functions as F

from asf_tools_spark.operators import bloom


def test_prune_join_row_identical_to_plain_join(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    dim = orders.where(F.col("o_totalprice") > 150000.0).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    fact = li.select("l_orderkey", "l_linenumber", "l_extendedprice")
    got = bloom.bloom_prune_join(fact, dim, "l_orderkey", m_bits=1 << 14)
    plain = fact.join(dim, "l_orderkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_no_false_negatives_and_real_pruning(spark):
    dim = spark.range(100).select((F.col("id") * 997).alias("k"))
    fact = spark.range(20_000).select(F.col("id").alias("k"))
    words = bloom.bloom_build(dim, "k", m_bits=1 << 13, k=3)
    passed = fact.where(bloom.bloom_might_contain(words, F.col("k"), 1 << 13, 3))
    passed_keys = {r.k for r in passed.collect()}
    true_keys = {r.k for r in dim.collect()} & {r.k for r in fact.collect()}
    assert true_keys <= passed_keys  # zero false negatives, ever
    # with m=8192 bits for 100 keys, fpp ~ (1-e^-0.037)^3 ~ 5e-5: the
    # 20k-row fact must prune to nearly the true match set
    assert len(passed_keys) < len(true_keys) + 50


def test_build_memory_is_filter_bits_not_dim_size(spark):
    m_bits = 1 << 10
    words = bloom.bloom_build(
        spark.range(50_000).select(F.col("id").alias("k")), "k", m_bits=m_bits
    )
    assert len(words) == m_bits // 64  # O(m/64) regardless of 50k keys
    # saturated filter: every word is fully set long before 50k keys
    assert all(w == -1 for w in words)  # all 64 bits set -> -1 as signed


def test_probe_literal_is_constant_folded(spark):
    """The bitset must reach the executors as ONE folded array literal —
    a per-row CreateArray of m/64 elements would be quadratic work."""
    words = bloom.bloom_build(
        spark.range(10).select(F.col("id").alias("k")), "k", m_bits=1 << 12
    )
    df = spark.range(5).where(
        bloom.bloom_might_contain(words, F.col("id"), 1 << 12)
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "create_array" not in plan.lower()


def test_non_multiple_of_64_m_bits_rounds_identically(spark):
    # the footgun ADVICE r4 flagged: caller passes the same NON-multiple-
    # of-64 m_bits to build and probe — both sides must round identically
    # (mismatched pmod moduli would mean silent false negatives)
    dim = spark.range(50).select((F.col("id") * 31).alias("k"))
    fact = spark.range(2_000).select(F.col("id").alias("k"))
    words = bloom.bloom_build(dim, "k", m_bits=100, k=3)
    passed = {r.k for r in fact.where(
        bloom.bloom_might_contain(words, F.col("k"), m_bits=100, k=3)
    ).collect()}
    true_keys = {r.k for r in dim.collect()} & {r.k for r in fact.collect()}
    assert true_keys <= passed


def test_probe_m_bits_mismatch_raises(spark):
    import pytest

    dim = spark.range(10).select(F.col("id").alias("k"))
    words = bloom.bloom_build(dim, "k", m_bits=1 << 10)
    with pytest.raises(ValueError, match="does not match"):
        bloom.bloom_might_contain(words, F.col("k"), m_bits=1 << 11)

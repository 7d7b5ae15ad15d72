"""Pure-Python XXH64 replica vs Spark's `xxhash64` expression — the
bit-for-bit pin that lets golden generators (scripts/make_bpe_golden.py)
reproduce seeded sample membership without a SparkSession."""

from pyspark.sql import functions as F

from asf_tools_spark.core import xxh

VALS = [0, 1, -1, 7, 40, 499, 2**31, -(2**31), 2**62, -(2**63), 123456789012345]


def test_long_int_chain_matches_spark(spark):
    # the sampler shape: F.xxhash64(long_key, F.lit(int_seed))
    df = spark.createDataFrame([(v,) for v in VALS], "k long")
    for seed in [0, 1, 42, -5, 999]:
        got = {
            r.k: r.h
            for r in df.select(
                "k", F.xxhash64(F.col("k"), F.lit(seed)).alias("h")
            ).collect()
        }
        for v in VALS:
            assert got[v] == xxh.xxhash64_long_int(v, seed), (v, seed)


def test_all_long_chain_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "k long")
    got1 = {r.k: r.h for r in df.select("k", F.xxhash64(F.col("k")).alias("h")).collect()}
    small = [v for v in VALS if abs(v) < 2**60]  # k*3 must not overflow ANSI long
    df2 = spark.createDataFrame([(v,) for v in small], "k long")
    got2 = {
        r.k: r.h
        for r in df2.select(
            "k", F.xxhash64(F.col("k"), (F.col("k") * 3).cast("long")).alias("h")
        ).collect()
    }
    for v in VALS:
        assert got1[v] == xxh.xxhash64_longs(v), v
    for v in small:
        assert got2[v] == xxh.xxhash64_longs(v, v * 3), v


def test_int_lane_differs_from_long_lane():
    # Spark does NOT promote int literals: lit(0) (4-byte lane) and
    # lit(0).cast("long") (8-byte lane) hash differently — the replica
    # must preserve that or sample membership silently diverges
    assert xxh.hash_int(0, 42) != xxh.hash_long(0, 42)


STRS = [
    "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
    "abcdefghijk", "0123456789abcdef", "0123456789abcdef0",
    "x" * 31, "x" * 32, "x" * 33, "x" * 40, "x" * 64, "x" * 65,
    "héllo wörld", "日本語テキスト", "simhash-", "mixed 日本 ascii tail x",
]


def test_string_lane_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRS], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in STRS:
        assert got[s] == xxh.xxhash64_strings(s), repr(s)


def test_string_chain_matches_spark(spark):
    df = spark.createDataFrame([("simhash-", s) for s in STRS], "a string, s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("a", "s").alias("h")).collect()}
    for s in STRS:
        assert got[s] == xxh.xxhash64_strings("simhash-", s), repr(s)

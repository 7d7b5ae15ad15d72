"""editsim_join: deletion-neighborhood exact Levenshtein join — hand
cases for each edit kind, the shared-variant-but-far false candidate,
d=2, and a randomized differential vs a pure-Python DP brute force."""

import random

from pyspark.sql import functions as F

from asf_tools_spark.operators.editsim import deletion_variants, editsim_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _pairs(spark, strings, d):
    df = spark.createDataFrame(
        [(s,) for s in strings], "title string"
    ).withColumn("k", F.col("title"))
    return {
        (r.key_a, r.key_b): r.dist
        for r in editsim_join(df, "k", "title", max_dist=d).collect()
    }


def test_deletion_variants_d1_d2(spark):
    row = spark.range(1).select(
        deletion_variants(F.lit("abc"), 1).alias("v1"),
        deletion_variants(F.lit("abc"), 2).alias("v2"),
    ).collect()[0]
    assert set(row.v1) == {"abc", "bc", "ac", "ab"}
    assert set(row.v2) == {"abc", "bc", "ac", "ab", "a", "b", "c"}


def test_each_edit_kind_found_at_d1(spark):
    got = _pairs(spark, ["cat", "cut", "cart", "ca", "dog"], 1)
    assert got[("cat", "cut")] == 1  # substitution
    assert got[("cart", "cat")] == 1  # insertion/deletion
    assert got[("ca", "cat")] == 1  # suffix deletion
    assert ("cat", "dog") not in got and ("dog", "cat") not in got
    # transposition is ed=2 in plain Levenshtein: shared variant "a"
    # makes ab/ba a CANDIDATE, verify must kill it
    assert _pairs(spark, ["ab", "ba"], 1) == {}


def test_d2_widens(spark):
    got1 = _pairs(spark, ["ab", "ba", "abcd", "adcb"], 1)
    got2 = _pairs(spark, ["ab", "ba", "abcd", "adcb"], 2)
    assert ("ab", "ba") not in got1 and got2[("ab", "ba")] == 2
    assert got2[("abcd", "adcb")] == 2


def test_randomized_differential_vs_bruteforce(spark):
    rng = random.Random(5)
    strings = list(
        {
            "".join(rng.choice("abc") for _ in range(rng.randrange(2, 7)))
            for _ in range(120)
        }
    )
    for d in (1, 2):
        want = {
            (a, b): _lev(a, b)
            for i, a in enumerate(strings)
            for b in strings[i + 1 :]
            if _lev(a, b) <= d
        }
        want = {(min(a, b), max(a, b)): v for (a, b), v in want.items()}
        assert _pairs(spark, strings, d) == want


def test_empty_and_single_char(spark):
    # "" is within ed 1 of any single char; "" itself has no deletions
    got = _pairs(spark, ["", "a", "b"], 1)
    assert got == {("", "a"): 1, ("", "b"): 1, ("a", "b"): 1}

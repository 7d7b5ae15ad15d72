"""URL normalization: hand-verified canonical forms, Spark/DuckDB
emitter parity (incl. the dialect-specific backslash escaping that
silently emptied URLs under DuckDB when wrong)."""

import duckdb

from asf_tools_spark import oracle
from asf_tools_spark.functions import url as U

CASES = [
    ("HTTPS://WWW.Example.COM/Path/Page?utm=1#frag", "example.com/path/page"),
    ("http://example.com/", "example.com"),
    ("https://sub.example.com/a/b///", "sub.example.com/a/b"),
    ("ftp://files.example.com/x", "files.example.com/x"),
    ("example.com/no-scheme?q=1", "example.com/no-scheme"),
    ("https://www.example.com", "example.com"),
    ("https://wwwx.example.com/keep-www-prefix-intact",
     "wwwx.example.com/keep-www-prefix-intact"),  # only 'www.' strips
]


def test_normalize_hand_cases_spark(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw_url string")
    norm = U.normalize_url_sql("raw_url", oracle.SPARK)
    got = [r[0] for r in df.selectExpr(f"{norm} AS n").collect()]
    assert got == [want for _, want in CASES]


def test_normalize_parity_duckdb():
    con = duckdb.connect()
    norm = U.normalize_url_sql("raw_url", oracle.DUCKDB)
    for raw, want in CASES:
        got = con.execute(
            f"SELECT {norm} FROM (SELECT ? AS raw_url)", [raw]
        ).fetchone()[0]
        assert got == want, raw


def test_domain_extraction_both_dialects(spark):
    con = duckdb.connect()
    for dialect, run in (
        (oracle.SPARK, lambda sql: spark.sql(f"SELECT {sql} AS d").first()[0]),
        (oracle.DUCKDB, lambda sql: con.execute(f"SELECT {sql} AS d").fetchone()[0]),
    ):
        dom = U.domain_sql("'sub.example.com/a/b'", dialect)
        assert run(dom) == "sub.example.com"
        dom2 = U.domain_sql("'example.com'", dialect)
        assert run(dom2) == "example.com"


def test_domain_quality_wilson_hand_value(spark):
    import math

    from asf_tools_spark.queries import _wilson_lb
    from pyspark.sql import functions as F

    # n=20, 16 passes: classic Wilson check
    row = spark.range(1).select(
        F.round(_wilson_lb(F.lit(16.0 / 20.0), F.lit(20.0)), 6).alias("w")
    ).collect()[0]
    z, p, n = 1.96, 0.8, 20.0
    want = (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
        1 + z * z / n
    )
    assert row.w == round(want, 6)
    assert 0.57 < row.w < 0.60  # the textbook ballpark for 16/20

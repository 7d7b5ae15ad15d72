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

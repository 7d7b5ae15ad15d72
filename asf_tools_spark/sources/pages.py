"""Synthetic Common-Crawl-style page table — deterministic, generated in-plan.

Input shape per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus engine-derived ``lat/lon/value/hand/cell_id``.

Everything is a pure Catalyst expression over ``spark.range`` — no data
files, no Python workers, seed-deterministic (hash-of-id), and it scales to
any row count by changing ``n``: the generator IS the 100 TB stand-in. The
per-row invariant (extracted ``text`` is byte-identical per ``url``) holds
by construction: ``text`` is derived from ``html`` by the same tag-stripping
expression every time, and tests re-extract from ``html`` to verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import oracle

_WORDS = [
    "river", "flood", "water", "basin", "terrain", "radar", "backscatter",
    "sentinel", "map", "height", "drainage", "polar", "orbit", "pixel",
]


def synth_pages(
    spark: SparkSession,
    n: int,
    partitions: int | None = None,
    cell_res: int = 8,
) -> DataFrame:
    """Deterministic page table with geotags, cell ids and synthetic fields.

    30% of pages land in 5 hotspot cells (oracle.HOTSPOTS) — deliberate
    mega-cell skew so the salted aggregation paths are actually exercised.
    """
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 1)
    df = spark.range(0, n, 1, partitions)

    word = F.element_at(
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.expr(oracle.hash8_sql("id", oracle.SPARK, salt="w")) % len(_WORDS) + 1).cast("int"),
    )
    n_repeat = (F.expr(oracle.hash8_sql("id", oracle.SPARK, salt="r")) % 40 + 3).cast("int")
    body = F.concat_ws(" ", F.array_repeat(word, n_repeat))

    html_str = F.concat(
        F.lit("<html><head><title>Page "), F.col("id").cast("string"),
        F.lit("</title></head><body><p>"), body, F.lit("</p></body></html>"),
    )

    lang = F.element_at(
        F.array(*[F.lit(x) for x in ["en", "en", "en", "en", "en", "zh", "es", "de", "fr", "pt"]]),
        (F.expr(oracle.hash8_sql("id", oracle.SPARK, salt="l")) % 10 + 1).cast("int"),
    )

    df = df.select(
        F.concat(
            F.lit("https://site"),
            (F.expr(oracle.hash8_sql("id", oracle.SPARK, salt="d")) % 1000).cast("string"),
            F.lit(".example.com/page/"),
            F.col("id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.expr(oracle.hash8_sql("id", oracle.SPARK, salt="t")) % 31536000))
        ).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        extract_text(html_str.cast("binary")).alias("text"),
        lang.alias("lang"),
        F.expr(oracle.geotag_lat_sql("id", oracle.SPARK)).alias("lat"),
        F.expr(oracle.geotag_lon_sql("id", oracle.SPARK)).alias("lon"),
        F.expr(oracle.synth_value_sql("id", oracle.SPARK)).alias("value"),
    )
    df = df.withColumn("hand", F.expr(oracle.synth_hand_sql("lat", "lon", "crc32(url)", oracle.SPARK)))
    return df.withColumn("cell_id", F.expr(oracle.cell_sql("lat", "lon", cell_res)))


def extract_text(html_col) -> F.Column:
    """The canonical HTML->text extraction (strip tags, collapse the title).

    Deterministic function of the html bytes — this IS the per-row invariant
    (BASELINE.json input_hint: byte-identical extracted text per url).
    """
    s = F.decode(html_col, "UTF-8")
    return F.regexp_replace(F.regexp_replace(s, "<[^>]*>", " "), "\\s+", " ").try_cast("string")


def geotag_pages(df: DataFrame, key: str = "url", cell_res: int = 8) -> DataFrame:
    """Attach deterministic lat/lon/cell_id to any table with a key column —
    the generic 'geotagged at 10^12-document scale' entry (north_star)."""
    key_expr = f"crc32({key})" if dict(df.dtypes).get(key) == "string" else key
    return (
        df.withColumn("lat", F.expr(oracle.geotag_lat_sql(key_expr, oracle.SPARK)))
        .withColumn("lon", F.expr(oracle.geotag_lon_sql(key_expr, oracle.SPARK)))
        .withColumn("cell_id", F.expr(oracle.cell_sql("lat", "lon", cell_res)))
    )


def geotagged_documents(spark: SparkSession, sf_dir: str, cell_res: int = 8) -> DataFrame:
    """The driver's ``documents`` table as a geotagged page table, matching
    oracle.geotagged_documents_sql value-for-value."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(f"SELECT * FROM {oracle.geotagged_documents_sql(cell_res, oracle.SPARK)} t")

"""Substring-level exact deduplication — the training-data workhorse from
"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022, public literature): web corpora are dominated by REPEATED SPANS
(templated pages, quoted passages, licence blocks) that whole-document
dedup (exact/MinHash/SimHash) never touches because the surrounding text
differs. ExactSubstr-style dedup removes every duplicated span of >= some
token length, keeping one canonical copy.

Spark-first shape — n-gram POSTINGS + positional coverage, not pairs:

  tokens -> per-position word n-grams (narrow, per-row array ops)
         -> ONE hash aggregate per distinct n-gram: occurrence count +
            the global argmin (doc, pos) occurrence  [the postings table]
         -> flag back onto positions (AQE broadcasts when the duplicated
            set is small; sort-merge otherwise)
         -> per-doc sliding-window coverage (n-1 preceding rows) decides
            each token: drop iff covered by a duplicated n-gram and not
            covered by the canonical (first) occurrence of any of them
         -> ordered reassembly (same collect_list/sort_array shape as
            line_dedup)

Why not the pairwise shape (fingerprint-share candidate pairs + per-pair
longest-common-substring verify)? Every pair of pages sharing one
boilerplate span is a candidate pair — quadratic in the occurrence count
of popular spans, the exact blow-up LSH banding exists to avoid for
whole-doc similarity. The postings shape touches each n-gram occurrence
O(1) times: linear in corpus tokens, one aggregate + one join + two
per-doc linear windows, no pair enumeration anywhere. It is also exact at
its granularity (no fingerprint sampling): every duplicated run of >= n
tokens is found, and boundaries resolve to the token.

Semantics (deterministic, engine-independent; the DuckDB oracle replays
them verbatim as an n-gram-position twin):

- an n-gram occurrence (doc, p) is DUPLICATED iff its n-gram occurs >= 2
  times corpus-wide (other docs or elsewhere in the same doc);
- the CANONICAL occurrence of an n-gram is the minimum (doc, p) in
  (doc_id, position) order — the "keep one copy" of Lee et al.;
- token (doc, q) is dropped iff some duplicated occurrence covers it
  (p in [q-n+1, q]) and NO canonical duplicated occurrence covers it.

Consequences: the first-in-corpus-order copy of every duplicated span
survives intact; later copies lose exactly the duplicated region; spans
shorter than ``n`` tokens are below the detection threshold and survive
(Lee et al. use 50 tokens; pick ``n`` per corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import normalize_text


def gram_occurrences(
    df: DataFrame, key: str, text_col: str = "text", n: int = 8,
    hash_grams: bool = True,
) -> DataFrame:
    """(_k, _p, _gh): every n-gram occurrence with its 1-based token
    position — the shared postings input of the batch operator and the
    streaming postings store (streaming/substring.py). Narrow (array ops
    per row, one posexplode); no shuffle."""
    from ..core.parallel import fan_out

    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    base = fan_out(df).select(F.col(key).alias("_k"), F.split(norm, " ").alias("_ws"))
    gram_txt = F.transform(
        F.sequence(F.lit(1), F.size("_ws") - n + 1),
        lambda i: F.array_join(F.slice("_ws", i, n), " "),
    )
    gram_arr = F.when(F.size("_ws") >= n, gram_txt).otherwise(
        F.array().cast("array<string>")
    )
    return base.select("_k", F.posexplode(gram_arr).alias("_p0", "_g")).select(
        "_k", (F.col("_p0") + 1).alias("_p"),
        (F.xxhash64("_g") if hash_grams else F.col("_g")).alias("_gh"),
    )


def substring_dedup(
    df: DataFrame, key: str, text_col: str = "text", n: int = 8,
    hash_grams: bool = True, external_dup_grams: DataFrame | None = None,
) -> DataFrame:
    """(key, n_tokens, n_dropped, dedup_text): remove every duplicated
    >=n-token span, keeping the globally-first copy (see module docstring
    for exact semantics).

    ``hash_grams`` (default) keys the postings aggregate/join on
    ``xxhash64(ngram)`` — 8 bytes shuffled per occurrence instead of the
    n-gram text (~8 words), the same lever as line_dedup's hashed lines;
    output depends only on group membership + the (doc, pos) argmin, so
    results are identical up to a 2^-64-per-pair collision. Raw mode
    (False) is the collision-free oracle-replay shape.

    ``external_dup_grams``: a frame with a ``_gh`` column (same key family
    as ``hash_grams``) of n-grams already known duplicated OUTSIDE this
    corpus slice — e.g. earlier micro-batches' postings in the streaming
    path. Their occurrences here are dropped unconditionally (the
    canonical copy lives in the earlier data); grams duplicated only
    within this slice keep the local first-copy rule.
    """
    from ..core.parallel import fan_out

    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    base = fan_out(df).select(F.col(key).alias("_k"), F.split(norm, " ").alias("_ws"))

    # one row per token; positions are 1..len and DENSE, so the coverage
    # windows below can use exact row frames
    toks = base.select("_k", F.posexplode("_ws").alias("_q0", "_w")).select(
        "_k", (F.col("_q0") + 1).alias("_q"), "_w"
    )

    grams = gram_occurrences(df, key, text_col, n, hash_grams)

    # postings: ONE aggregate gives the duplication test (count >= 2) and
    # the canonical occurrence (min (doc, pos) struct) per distinct n-gram
    occ = grams.groupBy("_gh").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min(F.struct("_k", "_p")).alias("_canon"),
    )
    if external_dup_grams is None:
        dup = occ.where(F.col("_cnt") >= 2).select("_gh", "_canon")
    else:
        ext = (
            external_dup_grams.select("_gh").distinct()
            .withColumn("_ext", F.lit(1))
        )
        # externally-duplicated grams have NO local canonical (NULL struct:
        # the canon_start comparison below then yields 0 for every local
        # occurrence, so all of them drop)
        dup = (
            occ.join(ext, "_gh", "left")
            .where((F.col("_cnt") >= 2) | (F.col("_ext") == 1))
            .select(
                "_gh",
                F.when(F.col("_ext") == 1, F.lit(None)).otherwise(
                    F.col("_canon")
                ).alias("_canon"),
            )
        )

    flags = grams.join(dup, "_gh").select(
        "_k", "_p",
        F.lit(1).alias("_dup_start"),
        F.when(
            (F.col("_canon._k") == F.col("_k")) & (F.col("_canon._p") == F.col("_p")),
            1,
        ).otherwise(0).alias("_canon_start"),
    )

    # coverage: token q is covered by the n-gram starting at p iff
    # p in [q-n+1, q]; positions are dense, so a (n-1)-preceding row frame
    # over the per-position flag is exactly that interval
    w_cov = Window.partitionBy("_k").orderBy("_q").rowsBetween(-(n - 1), 0)
    flagged = (
        toks.join(flags, (toks["_k"] == flags["_k"]) & (toks["_q"] == flags["_p"]), "left")
        .select(toks["_k"], "_q", "_w", "_dup_start", "_canon_start")
        .withColumn("_cd", F.max(F.coalesce("_dup_start", F.lit(0))).over(w_cov))
        .withColumn("_cc", F.max(F.coalesce("_canon_start", F.lit(0))).over(w_cov))
        .withColumn("_drop", (F.col("_cd") == 1) & (F.col("_cc") == 0))
    )

    kept_text = F.array_join(
        F.transform(
            F.filter(
                F.sort_array(F.collect_list(F.struct("_q", "_w", "_drop"))),
                lambda x: ~x["_drop"],
            ),
            lambda x: x["_w"],
        ),
        " ",
    )
    return flagged.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("_drop").cast("int")).cast("long").alias("n_dropped"),
        kept_text.alias("dedup_text"),
    ).withColumnRenamed("_k", key)

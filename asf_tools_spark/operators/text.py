"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. Pure Catalyst expressions (JVM, codegen) — the
hot-path rule for a 10^12-row text table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import hash8_col, normalize_text

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "es": [" el ", " la ", " de ", " que ", " los "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "pt": [" o ", " de ", " que ", " os ", " uma "],
}


def _occurrences(text: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences via length arithmetic (shared
    semantics with the SQL oracle; avoids regex-engine differences)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language marker-hit scores + argmax language guess."""
    t = F.concat(F.lit(" "), normalize_text(F.col(text_col)), F.lit(" "))
    out = df
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            c = _occurrences(t, m)
            score = c if score is None else score + c
        out = out.withColumn(f"score_{lang}", score.cast("double"))
    best = F.lit("und")
    best_score = F.lit(0.0)
    # deterministic argmax: strictly-greater wins, first language on ties
    for lang in LANG_MARKERS:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return out.withColumn("lang_guess", best)


def token_count_col(text: Column) -> Column:
    """Whitespace token count (normalize -> count spaces + 1)."""
    norm = normalize_text(text)
    return F.when(F.length(norm) == 0, 0).otherwise(
        F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
    )


# BPE-ish pre-tokenizer classes (the GPT-2-style split reduced to ASCII
# classes that Java regex and RE2 treat identically): letter runs, digit
# runs, and single non-alphanumeric marks.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer pieces — the standard
    LLM-corpus budget proxy (whitespace counts undercount punctuation-heavy
    and digit-heavy text). Pure Catalyst: regexp_extract_all + size."""
    norm = normalize_text(text)
    return F.size(F.regexp_extract_all(norm, F.lit(BPE_TOKEN_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / punctuation / stopword features + a [0,1] quality
    score (the usual web-text heuristics: too-short, low stopword density,
    and symbol-heavy documents score low).

    The normalized text is STAGED as a real column first: every feature
    references it, and inlined it would re-run the `\\s+` regex once per
    F.when branch — codegen subexpression elimination skips conditional
    branches, and the measured cost was ~10 regex passes per row (the
    whole corpus_funnel's largest single cost at sf0.1). A multi-referenced
    non-cheap projection alone is not enough of a fence: Spark 4 pushes
    FILTERS through a Project regardless (substituting the expression per
    conjunct — the funnel filters on quality_score immediately), so the
    stage rides the repo's Generate fence (explode of a 1-element array):
    predicates referencing generator output cannot cross a Generate."""
    from ..core.parallel import fan_out

    t = F.col(text_col)
    staged = fan_out(df).withColumn("_norm", F.explode(F.array(normalize_text(t))))
    norm = F.col("_norm")
    n_chars = F.length(t)
    # token_count_col(t) inlined against the staged norm (same semantics)
    n_tokens = F.when(F.length(norm) == 0, 0).otherwise(
        F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
    )
    mean_tok = F.when(n_tokens > 0, (F.length(norm) - n_tokens + 1) / n_tokens).otherwise(0.0)
    n_punct = (
        _occurrences(norm, ".") + _occurrences(norm, ",") + _occurrences(norm, "!")
        + _occurrences(norm, "?")
    )
    spaced = F.concat(F.lit(" "), norm, F.lit(" "))
    n_stop = None
    for m in LANG_MARKERS["en"]:
        c = _occurrences(spaced, m)
        n_stop = c if n_stop is None else n_stop + c
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)

    length_score = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    punct_ok = F.when(punct_ratio <= 0.1, 1.0).otherwise(F.lit(1.0) - F.least(punct_ratio, F.lit(1.0)))
    score = (length_score + stop_score + punct_ok) / 3.0
    return staged.withColumn("n_tokens", n_tokens.cast("long")).withColumn(
        "mean_token_len", F.round(mean_tok, 6)
    ).withColumn("punct_ratio", F.round(punct_ratio, 6)).withColumn(
        "stopword_ratio", F.round(stop_ratio, 6)
    ).withColumn("quality_score", F.round(score, 6)).drop("_norm")


def winnow_fingerprints(
    df: DataFrame, key: str, text_col: str = "text", k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, public
    literature): hash every character k-gram of the normalized text with a
    rolling window of ``window`` consecutive k-gram hashes, keep each
    window's minimum, emit the distinct selected hashes per document.
    Guarantees every match of length >= k + window - 1 shares a
    fingerprint — the plagiarism/near-dup detector the min-shingle
    fingerprint approximates at 1 hash/doc.

    All Catalyst: sequence/explode over positions, substring, the shared
    hash8 family, and a min over a forward row frame.
    """
    from pyspark.sql.window import Window

    from .dedup import hash8_col

    norm = normalize_text(F.col(text_col))
    grams = df.select(
        key,
        F.explode(F.sequence(F.lit(1), F.greatest(F.length(norm) - k + 1, F.lit(0)))).alias("pos"),
        norm.alias("_n"),
    ).select(key, "pos", hash8_col(F.substring(F.col("_n"), F.col("pos"), k), "wn-").alias("h"),
             (F.length("_n") - k + 1).alias("_ng"))
    w = Window.partitionBy(key).orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.withColumn("wmin", F.min("h").over(w))
        .where(F.col("pos") <= F.col("_ng") - window + 1)
        .select(key, F.col("wmin").alias("fp"))
        .distinct()
    )


def fingerprint(df: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """Content fingerprints: full md5 of normalized text + a winnowed
    shingle fingerprint (min word-shingle hash — a 1-hash MinHash, the
    rolling-hash document-fingerprint analogue)."""
    norm = normalize_text(F.col(text_col))
    shingled = df.select(
        key,
        F.md5(norm).alias("md5_fp"),
        F.explode(F.split(norm, " ")).alias("w"),
    )
    return shingled.groupBy(key, "md5_fp").agg(
        F.min(hash8_col(F.col("w"), "fp-")).alias("min_shingle_fp")
    )


def repetition_signals(df: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, public
    literature): distinct-word fraction, top-word mass, top-bigram mass —
    the standard "is this page boilerplate/spam" filters for web-scale
    training corpora. Heavily repeated content scores low on distinct_frac
    and high on top-*_frac.

    Shape: ONE explode of kind-tagged terms (words + zip_with bigrams) ->
    groupBy(key, kind, term) count (map-side combine; shuffle O(docs x
    distinct terms), never O(text)) -> groupBy(key) conditional aggregates.
    Zero joins: every signal (n_words, distinct count, top-word mass,
    top-bigram mass) falls out of the same two-level aggregate — at corpus
    scale that is two co-keyed shuffles instead of r2's two aggregates plus
    a 3-way join on key. All Catalyst.
    """
    from ..core.parallel import fan_out

    norm = normalize_text(F.col(text_col))
    base = fan_out(df).select(key, F.split(norm, " ").alias("_w")).where(F.size("_w") > 0)
    tagged = base.select(
        key,
        F.explode(
            F.concat(
                F.transform(F.col("_w"), lambda w: F.struct(F.lit("w").alias("k"), w.alias("t"))),
                F.expr(
                    "transform(zip_with(slice(_w, 1, size(_w) - 1), slice(_w, 2, size(_w) - 1),"
                    " (a, b) -> concat(a, ' ', b)), b -> struct('b' AS k, b AS t))"
                ),
            )
        ).alias("e"),
    ).select(key, F.col("e.k").alias("k"), F.col("e.t").alias("t"))
    counts = tagged.groupBy(key, "k", "t").agg(F.count(F.lit(1)).alias("c"))
    is_w = F.col("k") == "w"
    agg = counts.groupBy(key).agg(
        F.sum(F.when(is_w, F.col("c"))).alias("_n"),
        F.count(F.when(is_w, F.lit(1))).alias("_d"),
        F.max(F.when(is_w, F.col("c"))).alias("_tw"),
        F.max(F.when(~is_w, F.col("c"))).alias("_tb"),
    )
    return agg.select(
        key, F.col("_n").cast("long").alias("n_words"),
        F.round(F.col("_d") / F.col("_n"), 6).alias("distinct_frac"),
        F.round(F.col("_tw") / F.col("_n"), 6).alias("top_word_frac"),
        F.round(
            F.coalesce(F.col("_tb") / (F.col("_n") - 1), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )


def word_ngrams(
    df: DataFrame, key: str | None, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(key?, ngram): all word n-grams of the normalized text (duplicates
    kept; callers dedup as needed). Pure Catalyst.

    The token array rides the Generate fence (explode of a 1-element
    array), exactly like ngram_shingle_sets: referencing ``split(...)``
    inside the transform lambda re-substitutes and re-evaluates the whole
    normalize+split chain PER ELEMENT (one `\\s+` regex pass per n-gram;
    the fence took the sibling operator 14.8s -> 1.4s at sf0.1). The input
    is fanned out first: the explode's parent is a narrow chain over the
    scan, which on a single-file input is one task (core/parallel.py)."""
    from ..core.parallel import fan_out

    cols = [key] if key else []
    ws_expr = F.split(normalize_text(F.col(text_col)), " ")
    staged = fan_out(df).select(*cols, F.explode(F.array(ws_expr)).alias("_ws"))
    ws = F.col("_ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - n + 1),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    # sequence(1, x) is DESCENDING for x < 1 — guard short docs explicitly
    grams = F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))
    return staged.select(*cols, F.explode(grams).alias("ngram"))


def contamination_report(
    corpus: DataFrame, benchmark: DataFrame, key: str, text_col: str = "text",
    n: int = 6, min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap screen every serious
    training corpus runs before release): a corpus document is contaminated
    if it shares >= ``min_hits`` distinct word ``n``-grams with ANY
    benchmark document.

    Scale shape: the benchmark side is small by definition — its distinct
    n-gram set broadcasts, so the corpus-side scan is one narrow explode +
    broadcast semi-match + per-doc aggregate; the corpus never shuffles
    against itself and the benchmark text never leaves the driver-side
    broadcast. Output: (key, n_hits, contaminated) for every corpus doc.
    """
    bench_grams = F.broadcast(
        word_ngrams(benchmark, key, text_col, n).select("ngram").distinct()
    )
    doc_grams = word_ngrams(corpus, key, text_col, n).distinct()
    hits = (
        doc_grams.join(bench_grams, "ngram")
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        corpus.select(key)
        .join(hits, key, "left")
        .select(
            key,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def top_ngrams(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide top-k word n-grams — the vocabulary/collocation census a
    corpus report starts with. Scale shape: explode n-grams ->
    groupBy(ngram) count (map-side combine: the shuffle carries one row per
    distinct n-gram per partition, never the corpus) -> global top-k via
    orderBy+limit, which Catalyst executes as TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows — no full sort shuffle).
    Ties break on the n-gram string for determinism.
    """
    return (
        word_ngrams(df, None, text_col, n)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram").asc())
        .limit(k)
    )


def line_dedup(
    df: DataFrame, key: str, text_col: str = "text", sep: str = "\n",
    max_docs: int = 5, hash_lines: bool = True,
) -> DataFrame:
    """CCNet-style line-level deduplication (Wenzek et al. 2019, public
    literature): a line occurring in more than ``max_docs`` distinct
    documents is boilerplate (nav bars, cookie banners, license headers) —
    drop it from every document and reassemble the rest in original order.

    Scale shape: posexplode -> per-line doc-frequency hash aggregate
    (map-side combine; shuffle is O(distinct lines), not O(text)) -> the
    heavy-hitter line set broadcasts and the flagging join never shuffles
    the corpus -> one groupBy(key) reassembly shuffle.

    ``hash_lines`` (DEFAULT) keys the aggregate, the broadcast set and the
    flag join on ``xxhash64(line)`` — 8 bytes shuffled/broadcast per
    distinct line instead of the line bytes. A 100 TB web corpus has
    millions of distinct boilerplate lines x ~100 B each: raw-line
    broadcast is a multi-hundred-MB build, hashed it is ~8 MB. Output
    depends only on hot-line MEMBERSHIP, so results are identical up to a
    2^-64-per-pair xxhash64 collision; pass hash_lines=False for the
    collision-free raw-line join (small corpora / oracle replays).
    """
    lines = df.select(
        key, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    )
    line_key = F.xxhash64("line") if hash_lines else F.col("line")
    lines = lines.withColumn("_lk", line_key)
    hot = (
        lines.groupBy("_lk")
        .agg(F.count_distinct(key).alias("_df"))
        .where(F.col("_df") > max_docs)
        .select("_lk", F.lit(True).alias("_hot"))
    )
    flagged = lines.join(F.broadcast(hot), "_lk", "left").select(
        key, "pos", "line", F.coalesce("_hot", F.lit(False)).alias("_hot")
    )
    kept_text = F.array_join(
        F.transform(
            F.filter(
                F.sort_array(F.collect_list(F.struct("pos", "line", "_hot"))),
                lambda x: ~x["_hot"],
            ),
            lambda x: x["line"],
        ),
        sep,
    )
    return flagged.groupBy(key).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(~F.col("_hot"), 1).otherwise(0)).cast("long").alias("n_kept"),
        kept_text.alias("kept_text"),
    )


# ASCII-only PII patterns, written to behave identically under Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no unicode classes
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
LONGNUM_RE = "[0-9]{9,}"


def pii_scrub(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed") -> DataFrame:
    """PII scrubbing for training-data pipelines: replace email addresses
    and long (>= 9 digit) number runs with typed placeholders, and count
    what was removed. Pure Catalyst (regexp_replace / regexp_extract_all);
    Spark's regexp_replace is global, matching the oracle's 'g' flag."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    scrub1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_nums = F.size(F.regexp_extract_all(scrub1, F.lit(LONGNUM_RE), F.lit(0)))
    scrubbed = F.regexp_replace(scrub1, LONGNUM_RE, "<NUM>")
    return (
        df.withColumn("n_emails", n_emails.cast("long"))
        .withColumn("n_longnums", n_nums.cast("long"))
        .withColumn(out_col, scrubbed)
    )


def cooccurrence_pmi(
    df: DataFrame, text_col: str = "text", window: int = 3,
    min_count: int = 2, top_k: int | None = None,
) -> DataFrame:
    """(term_a, term_b, n_pairs, pmi): pointwise mutual information of
    word pairs co-occurring within ``window`` token positions (Church &
    Hanks 1990 — the collocation/embedding-preprocessing statistic):

        pmi = ln( (n_pairs / P) / ((c_a / T) * (c_b / T)) )

    with T = corpus token count, P = corpus pair count, pairs
    position-ordered then canonicalized (a <= b) so (x,y) and (y,x)
    accumulate together.

    Spark-first: pairs are generated PER ROW by a nested array transform
    over the token array (position i x offset 1..window) and exploded —
    no positions self-join, no shuffle until the count aggregates; the
    unigram join is vocabulary-sized. ``top_k`` orders by (pmi desc,
    term_a, term_b) via sort+limit (TakeOrdered, no global window)."""
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    ws = F.split(norm, " ")
    base = df.select(F.explode(F.array(ws)).alias("_ws")).where(F.size("_ws") > 0)

    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("_ws") - 1, F.lit(1))),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(window), F.size("_ws") - i)),
                lambda d: F.struct(
                    F.least(
                        F.element_at("_ws", i.cast("int")),
                        F.element_at("_ws", (i + d).cast("int")),
                    ).alias("a"),
                    F.greatest(
                        F.element_at("_ws", i.cast("int")),
                        F.element_at("_ws", (i + d).cast("int")),
                    ).alias("b"),
                ),
            ),
        )
    )
    pairs_all = (
        base.where(F.size("_ws") >= 2)
        .select(F.explode(pair_arr).alias("_p"))
        .select(F.col("_p.a").alias("term_a"), F.col("_p.b").alias("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    # P normalizes over ALL pairs (computed before the min_count screen —
    # the screen only bounds the output, it must not reweight the scores)
    pairs = pairs_all.where(F.col("n_pairs") >= min_count)
    uni = (
        base.select(F.explode("_ws").alias("term"))
        .where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    totals = uni.select(
        F.sum("_c").cast("double").alias("_t"),
    )
    p_total = pairs_all.select(F.sum("n_pairs").cast("double").alias("_p_tot"))
    out = (
        pairs.join(uni.withColumnRenamed("term", "term_a").withColumnRenamed("_c", "_ca"), "term_a")
        .join(uni.withColumnRenamed("term", "term_b").withColumnRenamed("_c", "_cb"), "term_b")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(p_total))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_pairs") / F.col("_p_tot"))
                    / ((F.col("_ca") / F.col("_t")) * (F.col("_cb") / F.col("_t")))
                ),
                6,
            ),
        )
        .select("term_a", "term_b", "n_pairs", "pmi")
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
        ).limit(top_k)
    return out


def phrase_search(
    df: DataFrame, key: str, phrase: str, text_col: str = "text",
) -> DataFrame:
    """Exact phrase (consecutive-token) search via positional postings —
    the inverted-index primitive BM25/TF-IDF can't express (bag-of-words
    loses order). ONE window pass: posexplode tokens, lead(i) the next
    k-1 terms within the document, count positions where all k align.
    Single shuffle keyed by doc; no per-term self-joins (the oracle
    replays it AS the k-way positional join — two different formulations
    of the same semantics).

    At 10^12 docs the win over a regex LIKE scan is that the token
    explode already exists in this engine's postings pipelines — phrase
    matching shares that shuffle instead of re-reading raw text.

    Output: (key, n_matches, first_pos) for documents with >= 1 match;
    first_pos is 1-based token position.
    """
    from pyspark.sql.window import Window as _W

    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    toks = df.select(
        F.col(key), F.posexplode(F.split(norm, " ")).alias("pos", "term")
    ).where(F.length("term") > 0)
    w = _W.partitionBy(key).orderBy("pos")
    cond = F.col("term") == terms[0]
    cur = toks
    for i, t in enumerate(terms[1:], start=1):
        cur = cur.withColumn(f"_t{i}", F.lead("term", i).over(w))
        cond = cond & (F.col(f"_t{i}") == t)
    hits = cur.where(cond)
    return hits.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        (F.min("pos") + 1).cast("long").alias("first_pos"),
    )


def char_entropy(
    df: DataFrame, key: str, text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution (nats)
    over normalized text — the cheap gibberish/obfuscation screen that
    complements the word-level quality features: random bytes score high,
    single-char runs near 0, natural language sits in a narrow band.

    entropy = ln(n) - sum(c*ln(c))/n over per-char counts c — computed in
    exactly this algebraic form on BOTH engines so the only float drift
    is one round-6 sum over <= alphabet-size terms. Shape: char explode
    -> (doc, char) count -> per-doc rollup; both aggregates partial-combine
    map-side, and the explode fan-out is n_chars rows of 1-char strings —
    the same order of bytes as the input itself.

    Output: (key, n_chars, entropy), empty/null docs dropped.
    """
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    staged = df.select(F.col(key), F.explode(F.array(norm)).alias("_norm"))
    chars = staged.select(
        F.col(key), F.explode(F.split("_norm", "")).alias("ch")
    ).where(F.length("ch") > 0)
    counts = chars.groupBy(key, "ch").agg(F.count(F.lit(1)).cast("double").alias("c"))
    n = F.sum("c")
    return counts.groupBy(key).agg(
        n.cast("long").alias("n_chars"),
        F.round(
            F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 6
        ).alias("entropy"),
    )


def event_funnel(
    df: DataFrame, user_col: str, ts_col: str, type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel completion (view -> click -> purchase style): a user
    completes step i when an event of type steps[i] occurs STRICTLY after
    their step i-1 completion time (first match wins). ONE shuffle: events
    collect per user, sort by (ts, type), and a single F.aggregate fold
    walks the timeline carrying the per-step completion timestamps —
    conditions test ts > prev explicitly, so tie ordering inside the sort
    can't change the outcome (mirrored verbatim by the oracle's
    min-after-join formulation, an independent algebra of the same spec).

    Per-user event counts are bounded (a user's history fits one task);
    skewed mega-users would call for the repo's salting idiom upstream.

    Output: ONE row — n_users, then n_step1..n_stepK completion counts and
    round-6 conversion rates vs n_users.
    """
    k = len(steps)
    if k < 1:
        raise ValueError("need at least one step")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    ).where(F.col(type_col).isin(steps))
    acc0 = F.struct(*[F.lit(None).cast("timestamp").alias(f"t{i}") for i in range(k)])

    def _step(acc, e):
        fields = []
        for i in range(k):
            prev_ok = F.lit(True) if i == 0 else (
                acc[f"t{i - 1}"].isNotNull() & (e["ts"] > acc[f"t{i - 1}"])
            )
            fields.append(
                F.when(
                    acc[f"t{i}"].isNull() & (e["et"] == steps[i]) & prev_ok, e["ts"]
                ).otherwise(acc[f"t{i}"]).alias(f"t{i}")
            )
        return F.struct(*fields)

    per_user = (
        ev.groupBy("u")
        .agg(F.array_sort(F.collect_list(F.struct("ts", "et"))).alias("evs"))
        .select("u", F.aggregate("evs", acc0, _step).alias("f"))
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_users")]
    for i in range(k):
        aggs.append(
            F.sum(F.when(F.col(f"f.t{i}").isNotNull(), 1).otherwise(0))
            .cast("long").alias(f"n_{steps[i]}")
        )
    out = per_user.agg(*aggs)
    rates = [
        F.round(F.col(f"n_{steps[i]}") / F.col("n_users"), 6).alias(f"rate_{steps[i]}")
        for i in range(k)
    ]
    return out.select("n_users", *[F.col(f"n_{s}") for s in steps], *rates)


def chunk_passages(
    df: DataFrame, key: str, text_col: str = "text",
    size: int = 32, overlap: int = 8,
) -> DataFrame:
    """Overlapping passage chunking (the RAG / context-window prep step):
    split each document's normalized token stream into windows of ``size``
    tokens starting every ``size - overlap`` tokens; the last chunk is the
    (possibly shorter) tail. Chunk k covers tokens [k*stride, k*stride+size);
    starts run while k*stride < n_tokens, so every token lands in >= 1 chunk
    and docs with zero tokens emit zero chunks.

    All JVM-side: the token array rides the Generate fence (see
    ngram_shingle_sets — element_at/slice inside per-element lambdas would
    otherwise re-evaluate the normalize chain per element), chunk ids come
    from an exploded sequence, each chunk is one array slice + join. One
    Generate per row — no shuffle at all; at 10^12 docs this is a pure
    map stage that scales linearly with input splits.

    Output: (key, chunk_id, chunk_text, n_chunk_toks), chunk_id 0-based.
    """
    if not (0 <= overlap < size):
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    norm = F.coalesce(normalize_text(F.col(text_col)), F.lit(""))
    ws_expr = F.filter(F.split(norm, " "), lambda t: F.length(t) > 0)
    staged = df.select(F.col(key), F.explode(F.array(ws_expr)).alias("_ws"))
    n_toks = F.size("_ws")
    # sequence(0, -1) would DESCEND in Spark — empty docs must hit the
    # empty-array branch, not the sequence
    ks = F.when(
        n_toks > 0,
        F.sequence(F.lit(0), F.floor((n_toks - 1) / stride).cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice("_ws", F.col("chunk_id") * stride + 1, size)
    return (
        staged.select(F.col(key), "_ws", F.explode(ks).alias("chunk_id"))
        .select(
            F.col(key),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("long").alias("n_chunk_toks"),
        )
    )


def sliding_window_counts(
    df: DataFrame, ts_col: str, group_col: str,
    duration: str = "6 hours", slide: str = "3 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Sliding-window aggregation over an event-time column — Spark's
    native F.window operator (the same expression Structured Streaming
    uses, so this plan lifts to readStream unchanged; watermark + append
    mode is the only delta). Each event lands in duration/slide windows;
    the aggregate partial-combines map-side per (group, window).

    Parity note: the value sum rides integer CENTS (ROUND(value*100)) —
    float SUM order across engines/partitions is not associative-stable,
    integer sums are. Window starts are emitted as epoch MICROS (the
    engine's cross-dialect timestamp idiom, see q_event_sessions).

    Output: (grp, win_start_us, n_events[, sum_cents]).
    """
    win = F.window(F.col(ts_col), duration, slide)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            .cast("long").alias("sum_cents")
        )
    return (
        df.groupBy(
            F.col(group_col).cast("string").alias("grp"), win.alias("w")
        )
        .agg(*aggs)
        .select(
            "grp",
            F.unix_micros(F.col("w.start").cast("timestamp_ltz")).alias("win_start_us"),
            *[c for c in (["n_events"] + (["sum_cents"] if value_col else []))],
        )
    )

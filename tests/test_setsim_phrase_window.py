"""PPJoin-style exact set-similarity join, positional phrase search,
sliding-window aggregation."""

import itertools

import pytest
from pyspark.sql import functions as F

from asf_tools_spark.operators import dedup, text


def _trigrams(s: str, n: int = 3) -> set[str]:
    toks = s.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute_pairs(docs: list[tuple[int, str]], t: float, n: int = 3):
    sets = {k: _trigrams(s, n) for k, s in docs}
    out = {}
    for (ka, sa), (kb, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        jac = len(sa & sb) / len(sa | sb)
        if jac >= t:
            out[(ka, kb)] = round(jac, 6)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "a completely different sentence about spark engines"),
        (5, "a completely different sentence about spark engines too"),
        (6, "short doc"),  # < 3 tokens: no trigrams at all
        (7, "one two three four five six seven eight nine ten"),
        (8, "one two three four five six seven eight nine eleven"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_setsim_matches_brute_force(docs_df):
    rows, df = docs_df
    got = {
        (r.key_a, r.key_b): r.jaccard
        for r in dedup.setsim_join(df, "doc_id", threshold=0.5).collect()
    }
    assert got == _brute_pairs(rows, 0.5)


def test_setsim_exact_dup_is_jaccard_one(docs_df):
    _, df = docs_df
    got = {
        (r.key_a, r.key_b): r.jaccard
        for r in dedup.setsim_join(df, "doc_id", threshold=0.9).collect()
    }
    assert got == {(1, 3): 1.0}


def test_setsim_threshold_sweep(docs_df):
    # exactness must hold at every threshold (prefix length varies with t)
    rows, df = docs_df
    for t in (0.3, 0.6, 0.8):
        got = {
            (r.key_a, r.key_b): r.jaccard
            for r in dedup.setsim_join(df, "doc_id", threshold=t).collect()
        }
        assert got == _brute_pairs(rows, t), f"threshold {t}"


def test_phrase_search_counts_and_positions(spark):
    df = spark.createDataFrame(
        [
            (1, "big data small data big data wins"),  # 2 matches, first at 1
            (2, "there is big data here"),  # 1 match at position 3
            (3, "big small data"),  # non-consecutive: no match
            (4, "data big"),  # reversed: no match
            (5, "Big   DATA everywhere"),  # normalization: case + whitespace
            (6, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in text.phrase_search(df, "doc_id", "big data").collect()
    }
    assert got == {1: (2, 1), 2: (1, 3), 5: (1, 1)}


def test_phrase_search_overlapping_matches(spark):
    # "a a a a" has THREE positions matching "a a" — overlap must count
    df = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    [r] = text.phrase_search(df, "doc_id", "a a").collect()
    assert (r.n_matches, r.first_pos) == (3, 1)


def test_phrase_search_empty_phrase_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.phrase_search(df, "doc_id", "   ")


def test_sliding_windows_assignment(spark):
    # slide=3h, duration=6h: event at 04:00 lands in the 00:00 and 03:00
    # windows; event at 03:00 sharp in 00:00 and 03:00; event at 07:30 in
    # 03:00 and 06:00
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 04:00:00", "click", 1.25),
            (2, "2024-01-01 03:00:00", "click", 2.0),
            (3, "2024-01-01 07:30:00", "click", None),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = text.sliding_window_counts(
        df, "ts", "event_type", duration="6 hours", slide="3 hours",
        value_col="value",
    )
    h = 3600 * 1_000_000
    base = 1704067200 * 1_000_000  # 2024-01-01 00:00 UTC
    got = {r.win_start_us: (r.n_events, r.sum_cents) for r in out.collect()}
    assert got == {
        base + 0 * h: (2, 325),   # events 1, 2
        base + 3 * h: (3, 325),   # all three
        base + 6 * h: (1, None),  # event 3 only; null value -> null sum
    }


def test_chunk_passages_coverage_and_overlap(spark):
    toks = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, toks), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = text.chunk_passages(df, "doc_id", size=20, overlap=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 50 tokens, stride 15 -> starts 0,15,30,45 -> 4 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in c1] == [0, 1, 2, 3]
    assert c1[0].chunk_text.split() == [f"t{i}" for i in range(20)]
    assert c1[1].chunk_text.split() == [f"t{i}" for i in range(15, 35)]
    assert c1[3].chunk_text.split() == [f"t{i}" for i in range(45, 50)]  # tail
    assert c1[3].n_chunk_toks == 5
    # every token covered, consecutive chunks overlap by 5
    assert set().union(*[set(r.chunk_text.split()) for r in c1]) == set(toks.split())
    assert set(c1[0].chunk_text.split()) & set(c1[1].chunk_text.split()) == {
        f"t{i}" for i in range(15, 20)
    }
    # doc 2: shorter than one chunk -> single chunk, itself
    assert [(r.chunk_id, r.chunk_text) for r in by_doc[2]] == [(0, "a b c")]
    # empty/null docs emit nothing
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_passages_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.chunk_passages(df, "doc_id", size=10, overlap=10)


def test_sliding_windows_lifts_to_streaming(spark, tmp_path):
    # the docstring's claim, executed: the SAME operator over readStream.
    # complete mode (overwrite sink) must equal the batch aggregation;
    # append mode + watermark must emit exactly the windows the final
    # watermark closed, with values identical to batch.
    import pandas as pd

    rows = []
    base = pd.Timestamp("2024-03-01")
    for i in range(200):
        rows.append((i, base + pd.Timedelta(minutes=17 * i), f"t{i % 3}", float(i) / 7.0))
    full = pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])
    half = len(full) // 2

    batch = {
        (r.grp, r.win_start_us): (r.n_events, r.sum_cents)
        for r in text.sliding_window_counts(
            spark.createDataFrame(full), "ts", "event_type",
            duration="6 hours", slide="3 hours", value_col="value",
        ).collect()
    }

    src = tmp_path / "src"
    src.mkdir()
    out_c, ck_c = str(tmp_path / "out_c"), str(tmp_path / "ck_c")
    out_a, ck_a = str(tmp_path / "out_a"), str(tmp_path / "ck_a")
    schema = "event_id long, ts timestamp, event_type string, value double"

    def feed(pdf):
        spark.createDataFrame(pdf).write.mode("append").parquet(str(src / "data"))

    def run(mode, out_dir, ckpt, watermark):
        stream = spark.readStream.schema(schema).parquet(str(src / "data"))
        if watermark:
            stream = stream.withWatermark("ts", watermark)
        agg = text.sliding_window_counts(
            stream, "ts", "event_type",
            duration="6 hours", slide="3 hours", value_col="value",
        )
        wmode = "overwrite" if mode == "complete" else "append"

        def sink(batch_df, _bid):
            batch_df.write.mode(wmode).parquet(out_dir)

        q = (
            agg.writeStream.outputMode(mode).foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    for pdf in (full.iloc[:half], full.iloc[half:]):
        feed(pdf)
        run("complete", out_c, ck_c, None)
        run("append", out_a, ck_a, "1 hour")

    got_c = {
        (r.grp, r.win_start_us): (r.n_events, r.sum_cents)
        for r in spark.read.parquet(out_c).collect()
    }
    assert got_c == batch

    # append mode: the final watermark is max(ts) - 1h; exactly the windows
    # whose END is at or below it have been emitted, values equal to batch
    wm_us = int((full.ts.max() - pd.Timedelta(hours=1)).timestamp() * 1_000_000)
    dur_us = 6 * 3600 * 1_000_000
    closed = {k: v for k, v in batch.items() if k[1] + dur_us <= wm_us}
    got_a = {
        (r.grp, r.win_start_us): (r.n_events, r.sum_cents)
        for r in spark.read.parquet(out_a).collect()
    }
    assert got_a == closed


def test_char_entropy_known_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars, r.entropy) for r in
           text.char_entropy(df, "doc_id").collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (4, round(math.log(2), 6))
    assert got[3] == (4, round(math.log(4), 6))
    assert 4 not in got and 5 not in got


def test_event_funnel_ordering_semantics(spark):
    from datetime import datetime as dt

    rows = [
        # u1 completes all three in order
        (1, dt(2024, 1, 1, 0), "view"), (1, dt(2024, 1, 1, 1), "click"),
        (1, dt(2024, 1, 1, 2), "purchase"),
        # u2: click BEFORE view, purchase after view but no click after view
        (2, dt(2024, 1, 1, 0), "click"), (2, dt(2024, 1, 1, 1), "view"),
        (2, dt(2024, 1, 1, 2), "purchase"),
        # u3: click at the SAME instant as view -> strictly-after fails
        (3, dt(2024, 1, 1, 0), "view"), (3, dt(2024, 1, 1, 0), "click"),
        # u4: only purchases
        (4, dt(2024, 1, 1, 0), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    [r] = text.event_funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()
    assert (r.n_users, r.n_view, r.n_click, r.n_purchase) == (4, 3, 1, 1)
    assert r.rate_purchase == 0.25

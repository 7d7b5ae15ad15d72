"""Real merge-table BPE: hand-verified segmentation, deterministic
training (tie-break), trained-table round-trip on testdata, and the
distributed count UDF vs a local replay."""

from pyspark.sql import functions as F

from asf_tools_spark.operators import bpe


def test_segment_word_hand_cases():
    # ranks: l+o -> "lo" (0), lo+w -> "low" (1), w+</w> -> "w</w>" (2)
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("w", "</w>"): 2}
    # "low": l o w </w> -> lo w </w> -> low </w>   (rank 1 beats rank 2)
    assert bpe.bpe_segment_word("low", ranks) == ["low", "</w>"]
    # "slow": s l o w </w> -> s lo w </w> -> s low </w>
    assert bpe.bpe_segment_word("slow", ranks) == ["s", "low", "</w>"]
    # "owl": o w l </w> -> no pair in table applies except none -> chars
    assert bpe.bpe_segment_word("owl", ranks) == ["o", "w", "l", "</w>"]
    # lowest-rank-first ordering matters: "wlow" has (w,</w>) never adjacent
    # until the end; (l,o) fires first
    assert bpe.bpe_segment_word("wlow", ranks) == ["w", "low", "</w>"]
    # empty table -> chars + EOW
    assert bpe.bpe_segment_word("ab", {}) == ["a", "b", "</w>"]


def test_train_local_learns_frequent_pairs_deterministically():
    texts = ["the the the cat", "the mat sat", "the bat"]
    merges = bpe.bpe_train_local(texts, n_merges=4)
    # (e,</w>) and (t,h) both occur 5x; the lexicographic tie-break picks
    # (e,</w>), then 'the</w>' assembles right-to-left
    assert merges[0] == ("e", "</w>")
    assert merges[1] == ("h", "e</w>")
    assert merges[2] == ("t", "he</w>")
    # deterministic: identical corpus -> identical table
    assert merges == bpe.bpe_train_local(texts, n_merges=4)
    # after training, 'the' segments to ONE token
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.bpe_segment_word("the", ranks) == ["the</w>"]


def test_train_tie_break_lexicographic():
    # 'ab' and 'cd' both appear twice; (a,b) < (c,d) lexicographically
    merges = bpe.bpe_train_local(["ab ab cd cd"], n_merges=1)
    assert merges[0] == ("a", "b")


def test_count_udf_matches_local_replay(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.bpe_train(docs, n_merges=64, sample_size=256, seed=0)
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe.bpe_token_count_real(merges, "text").alias("n")
        ).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for r in docs.select("doc_id", "text").collect():
        norm = bpe._normalize(r.text)
        expect = sum(
            len(bpe.bpe_segment_word(w, ranks)) for w in norm.split(" ") if norm
        )
        assert got[r.doc_id] == expect
    # real compression: BPE counts sit between chars and 1 (merges fire)
    ws = {r.doc_id: len(bpe._normalize(r.text).split(" "))
          for r in docs.select("doc_id", "text").collect()}
    assert all(got[d] >= ws[d] for d in got)  # >= one token per word
    assert sum(got.values()) < sum(
        len(bpe._normalize(r.text).replace(" ", "")) + len(ws)
        for r in docs.select("doc_id", "text").collect()
    )  # < pure char segmentation


def test_counts_feed_packing(spark):
    """True counts compose with pack_sequences — the billing-grade path."""
    from asf_tools_spark.operators import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.bpe_train(docs, n_merges=64, sample_size=256, seed=0)
    with_counts = docs.select(
        "doc_id", bpe.bpe_token_count_real(merges, "text").alias("n_tok")
    )
    packed = sampling.pack_sequences(with_counts, "doc_id", "n_tok", budget=400, n_buckets=4)
    stats = packed.groupBy("bucket", "bin_id").agg(F.sum("n_tok").alias("s")).collect()
    mx = with_counts.agg(F.max("n_tok")).first()[0]
    assert all(r.s < 400 + mx for r in stats)  # overflow contract holds

"""Real byte-pair-encoding tokenization (Sennrich et al. 2016, public
literature) — merge-table BPE, not the regex approximation in
``text.bpe_token_count_col``. True token counts are what packing
(``sampling.pack_sequences``) and budget reports should bill against when
exactness matters; the regex path stays as the cheap SQL-oracle-able
signal.

Division of labor (same pattern as PQ codebooks / IVF centroids):

- TRAIN driver-locally on a seeded one-pass sample (``bpe_train`` /
  ``bpe_train_local``): classic BPE training is inherently sequential
  (merge i+1's pair counts depend on merge i), so the merge table — tiny
  driver state, O(n_merges) — is learned from a sample, exactly like every
  production tokenizer (trained once, shipped to the cluster).
- ENCODE distributed (``bpe_token_count_real``): one Arrow-batched pandas
  UDF; per batch a word -> token-count memo exploits the Zipf shape of
  text (each distinct word's merge loop runs once per batch, not per
  occurrence). No shuffle, no per-row Python.

Tokenization model: normalized text (lowercase, collapsed whitespace) is
split on spaces; each word becomes its characters plus an end-of-word
marker ``</w>``; merges apply lowest-rank-first until no table pair
remains (the standard greedy BPE segmenter). Counts are exact for the
given merge table.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

EOW = "</w>"
_WS = re.compile(r"\s+")


def _normalize(text: str | None) -> str:
    """Python twin of dedup.normalize_text (lower, collapse ws, trim)."""
    if text is None:
        return ""
    return _WS.sub(" ", text.lower()).strip()


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE segmentation of one word: repeatedly merge the pair with
    the lowest rank until no adjacent pair is in the table."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        merged, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                merged.append(syms[i] + syms[i + 1])
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def bpe_train_local(texts: list[str], n_merges: int = 256) -> list[tuple[str, str]]:
    """Deterministic BPE training on a local text sample: per iteration,
    count adjacent symbol pairs across the (frequency-weighted) word
    vocabulary, merge the most frequent pair — ties break to the
    lexicographically smallest pair, so the table is reproducible across
    runs and platforms. Returns the ordered merge list (rank = index)."""
    word_freq: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in _normalize(t).split(" "):
            if w:
                k = _word_symbols(w)
                word_freq[k] = word_freq.get(k, 0) + 1
    vocab = dict(word_freq)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing left that actually repeats
        merges.append(best)
        nxt: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            nxt[k] = nxt.get(k, 0) + freq
        vocab = nxt
    return merges


def bpe_train(
    df: DataFrame, text_col: str = "text", key: str = "doc_id",
    n_merges: int = 256, sample_size: int = 2048, seed: int = 0,
) -> list[tuple[str, str]]:
    """Train a merge table on a seeded-xxhash64 top-N corpus sample — ONE
    pass (TakeOrdered, no sort shuffle), then local training. The merge
    table is O(n_merges) driver state, shipped to executors in the encode
    UDF's closure."""
    rows = (
        df.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key))
        .limit(sample_size).select(text_col).collect()
    )
    return bpe_train_local([r[0] for r in rows], n_merges=n_merges)


def bpe_token_count_real(
    merges: list[tuple[str, str]], text: Column | str
) -> Column:
    """Column of EXACT BPE token counts under ``merges`` — the drop-in
    upgrade for ``text.bpe_token_count_col`` wherever true counts must
    drive packing/billing. Arrow-batched; per-batch word memo."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf("long")
    def count_tokens(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def word_count(w: str) -> int:
            c = memo.get(w)
            if c is None:
                c = len(bpe_segment_word(w, ranks))
                memo[w] = c
            return c

        def doc_count(t: str | None) -> int:
            norm = _normalize(t)
            if not norm:
                return 0
            return sum(word_count(w) for w in norm.split(" "))

        return texts.map(doc_count)

    return count_tokens(F.col(text) if isinstance(text, str) else text)

"""Bloom-filter join pruning — cut the fact-side shuffle of a selective
join before it happens (Bloom 1970; the "runtime row-level filtering" idea
of Spark's own spark.sql.optimizer.runtime.bloomFilter, exposed here as an
EXPLICIT operator usable when the optimizer doesn't inject one, with a
deterministic, testable filter).

The regime where this wins at 100 TB: the dim side is too big (or too
remote) to broadcast as a hash relation, so Catalyst plans a sort-merge
join that shuffles the ENTIRE fact table — even when only a percent of
fact rows have a dim match. A Bloom filter of the dim keys is ~1 byte/key
regardless of payload width; prefiltering the fact with it drops the
non-matching rows map-side, before the exchange.

Spark-first build (never collects the dim keys):

  dim keys -> for each of k salted xxhash64 probes: (word_idx, bit mask)
           -> groupBy(word_idx).agg(bit_or(mask))   [distributed OR]
           -> collect O(m/64) words — driver memory is O(filter bits),
              INDEPENDENT of dim cardinality
           -> ship as ONE array<bigint> literal in the probe expression

Probe side is pure whole-stage codegen: k element_at + bit tests per
row, zero Python, no extra shuffle. Exactness is preserved by
construction: a Bloom filter has no false negatives, and the real join
afterwards removes the false positives — the operator's output is
row-identical to the plain join (the oracle proves it)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

_SALTS = ["bl-a", "bl-b", "bl-c", "bl-d", "bl-e", "bl-f", "bl-g"]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(F.lit(_SALTS[i]), key), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    dim: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 3
) -> list[int]:
    """Bitset words (m_bits/64 longs) of the dim's key set. One narrow
    projection + one bit_or aggregate; the collect is O(m_bits/64) rows no
    matter how many dim keys there are.

    m_bits is rounded UP to a multiple of 64: probe-side code defaults its
    modulus to len(words)*64, and a build/probe modulus mismatch would
    create FALSE NEGATIVES — the one error class a Bloom filter must never
    have."""
    if k > len(_SALTS):
        raise ValueError(f"k={k} > {len(_SALTS)} available salts")
    m_bits = (m_bits + 63) // 64 * 64
    # ONE scan of the dim: all k probe positions explode from one array
    pos = dim.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # F.shiftleft's numBits is python-int only; call_function takes
            # the column shift amount
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * ((m_bits + 63) // 64)
    for r in words:
        out[int(r.w)] = int(r.bits)
    return out


def bloom_might_contain(
    words: list[int], key: Column, m_bits: int | None = None, k: int = 3
) -> Column:
    """Boolean probe column: true iff all k bits are set. False positives
    at rate ~(1 - e^{-kn/m})^k; zero false negatives."""
    if m_bits is None:
        m_bits = len(words) * 64
    else:
        # Round up exactly as bloom_build does: a build/probe modulus
        # mismatch (e.g. caller passes m_bits=100 to both) would hash the
        # same key to DIFFERENT positions on each side — silent FALSE
        # NEGATIVES, the one error class a Bloom filter must never have.
        m_bits = (m_bits + 63) // 64 * 64
        if m_bits != len(words) * 64:
            raise ValueError(
                f"m_bits={m_bits} (rounded to a multiple of 64) does not match "
                f"the built filter ({len(words)} words = {len(words) * 64} bits); "
                "pass the same m_bits used at build time, or omit it"
            )
    lit_words = F.lit(words)  # one array literal: a single codegen object ref
    cond = None
    for p in _positions(key, m_bits, k):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long")) == 1
        cond = bit if cond is None else cond & bit
    return cond


def bloom_prune_join(
    fact: DataFrame, dim: DataFrame, key: str, m_bits: int = 1 << 20,
    k: int = 3, how: str = "inner",
) -> DataFrame:
    """fact JOIN dim on ``key``, with the fact side Bloom-prefiltered
    map-side before the join's exchange. Output rows are identical to the
    plain join (no false negatives; the join removes false positives) —
    only the shuffled volume changes. Sizing: m_bits >= 1.44 * k * n_dim
    keeps the false-positive rate under ~2^-k.

    Only match-preserving join types are accepted: prefiltering the fact
    side is correct exactly when dropping a non-matching fact row cannot
    change the result — true for inner and left_semi, WRONG for
    left/full/anti joins (an unmatched left row must survive with NULLs /
    be returned, but the prefilter would silently drop or keep it by
    Bloom-false-positive luck)."""
    norm = how.replace("_", "").lower()
    if norm not in ("inner", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_prune_join: how={how!r} is not match-preserving under a "
            "fact-side prefilter (use 'inner' or 'left_semi'; outer/anti "
            "joins would drop or misreport unmatched rows)"
        )
    m_bits = (m_bits + 63) // 64 * 64
    words = bloom_build(dim, key, m_bits=m_bits, k=k)
    pruned = fact.where(bloom_might_contain(words, F.col(key), m_bits, k))
    return pruned.join(dim, key, how)

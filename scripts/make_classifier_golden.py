"""Golden oracle values for the `classifier_score` registry row, from an
INDEPENDENT Spark-free replay (the make_bpe_golden.py pattern): pyarrow
read -> pure-Python normalize/tokenize/bigrams -> murmur3 replica
(core/xxh.py, pinned bit-for-bit against Spark's `hash()` by
tests/test_xxh.py) -> sparse dot + sigmoid -> round 6. No SparkSession,
no ML runtime — agreement with the Catalyst scorer is a genuine
two-implementation check."""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq  # noqa: E402

from asf_tools_spark.core.xxh import murmur3_string  # noqa: E402
from asf_tools_spark.operators.classifier_frozen import (  # noqa: E402
    INTERCEPT, N_FEATURES, WEIGHTS_SPARSE,
)


def _tokens(text: str | None) -> list[str]:
    # normalize_text + _token_features, replayed: lowercase, collapse \s+,
    # trim, split on single spaces (an empty normalized text still yields
    # one '' token — Spark's split does the same), plus word bigrams
    norm = re.sub(r"\s+", " ", (text or "").lower()).strip()
    ws = norm.split(" ")
    return ws + (["_".join(p) for p in zip(ws, ws[1:])] if len(ws) >= 2 else [])


def score(text: str | None) -> float:
    dot = INTERCEPT
    for tok in _tokens(text):
        idx = ((murmur3_string(tok) % N_FEATURES) + N_FEATURES) % N_FEATURES
        dot += WEIGHTS_SPARSE.get(idx, 0.0)
    return round(1.0 / (1.0 + math.exp(-dot)), 6)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    rows = sorted((r["doc_id"], score(r["text"])) for r in docs)
    print(", ".join(f"({d}, {s!r})" for d, s in rows))


if __name__ == "__main__":
    main()

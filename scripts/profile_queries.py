"""Per-job profiler for inventory queries (guide §1: measure first).

Runs the named queries (default: the slowest from the latest BENCH_local
record) with the Spark event log enabled and per-query job descriptions,
then parses the event log into a per-query job/stage breakdown: job count,
wall per job, shuffle read/write bytes, task counts. This is how an
optimization round decides WHERE a query's seconds go (scheduling overhead
vs shuffle vs compute) without the UI (disabled in session.py).

Usage: python scripts/profile_queries.py [sf_dir] query [query ...]
Env:   SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_on_hbase_spark.session import size_driver_heap_for_launch  # noqa: E402

size_driver_heap_for_launch()


def main() -> None:
    args = sys.argv[1:]
    wall: dict[str, float] = {}
    if args and args[0] == "--parse":
        # re-parse an existing event-log dir (no Spark run)
        _report(args[1], wall)
        return
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if not args:
        print("usage: profile_queries.py [sf_dir] query [query ...]")
        sys.exit(2)

    evdir = tempfile.mkdtemp(prefix="spark_evlog_")
    os.environ["SPARK_GRAFT_EVENTLOG"] = evdir  # read by session.get_spark

    from spark_on_hbase_spark.inventory import QUERIES, WARMERS
    from spark_on_hbase_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")

    # warm JVM + parquet footers + Python workers like bench.py does
    next(iter(QUERIES.values())).fn(spark, sf_dir).count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    sc = spark.sparkContext
    for bname, warm in WARMERS.items():
        sc.setJobDescription(f"build:{bname}")
        t0 = time.perf_counter()
        warm(spark, sf_dir)
        dt = time.perf_counter() - t0
        if dt > 0.5:
            print(f"[build] {bname}: {dt:.2f}s", flush=True)
    wall: dict[str, float] = {}
    for name in args:
        sc.setJobDescription(f"query:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        df.count()
        wall[name] = time.perf_counter() - t0
        df.unpersist()
        sc.setJobDescription(None)
        print(f"[query] {name}: {wall[name]:.2f}s", flush=True)
    spark.stop()
    time.sleep(1.0)
    _report(evdir, wall)


def _report(evdir: str, wall: dict[str, float]) -> None:
    # ---- parse the event log ------------------------------------------------
    # Spark 4 rolling layout: <evdir>/eventlog_v2_<app>/events_*; flat file
    # layouts from older versions also handled.
    paths: list[str] = []
    for f in sorted(os.listdir(evdir)):
        p = os.path.join(evdir, f)
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, g)
                for g in sorted(os.listdir(p))
                if g.startswith("events_")
            )
        elif not f.endswith(".inprogress"):
            paths.append(p)
    jobs: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = {}
    import itertools

    def _lines():
        import io
        import subprocess

        for p in paths:
            if p.endswith(".zstd"):
                # spark.eventLog.compress default codec on this build
                proc = subprocess.Popen(
                    ["zstd", "-dc", p], stdout=subprocess.PIPE
                )
                yield from io.TextIOWrapper(proc.stdout, encoding="utf-8")
                proc.wait()
            else:
                with open(p) as fh:
                    yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
                stage_metrics[sid] = {
                    "name": si.get("Name", "")[:60],
                    "ntasks": si.get("Number of Tasks", 0),
                    "sh_read": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                    + (acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0),
                    "sh_write": acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0,
                    "run_ms": acc.get("internal.metrics.executorRunTime", 0) or 0,
                }

    by_desc: dict[str, list] = {}
    for jid, j in sorted(jobs.items()):
        by_desc.setdefault(j["desc"], []).append((jid, j))

    for desc, js in by_desc.items():
        if not desc.startswith(("query:", "build:")):
            continue
        total = sum((j.get("t1", j["t0"]) - j["t0"]) for _, j in js) / 1000.0
        label = desc
        print(f"\n== {label}: {len(js)} jobs, {total:.2f}s job wall"
              + (f" (py wall {wall[desc[6:]]:.2f}s)" if desc.startswith("query:") and desc[6:] in wall else ""))
        for jid, j in js:
            dt = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
            sh_r = sum(stage_metrics.get(s, {}).get("sh_read", 0) or 0 for s in j["stages"])
            sh_w = sum(stage_metrics.get(s, {}).get("sh_write", 0) or 0 for s in j["stages"])
            run = sum(stage_metrics.get(s, {}).get("run_ms", 0) or 0 for s in j["stages"])
            names = [stage_metrics[s]["name"] for s in j["stages"] if s in stage_metrics]
            print(
                f"  job {jid:4d}: {dt:6.2f}s  tasks={j['ntasks']:4d} "
                f"exec_ms={run:7.0f} shR={sh_r/1e6:8.2f}MB shW={sh_w/1e6:8.2f}MB  "
                f"{'; '.join(names[:2])}"
            )
    print(f"\nevent log dir: {evdir}")


if __name__ == "__main__":
    main()

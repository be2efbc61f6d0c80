"""Per-query Spark event-log profiler (guide §1: measure first).

Runs named registry queries with the SAME action as bench.py
(full .count(), cache cleared between passes), with
``spark.eventLog.enabled`` on and one ``setJobDescription`` per query
pass, then attributes the event log back to queries:

    python tools/profile_queries.py [sf_dir] name [name ...]

Per query it prints wall seconds plus: #jobs, #stages, #tasks, summed
task time, summed executor run time, in-job wall (union of job
intervals) and driver-gap wall (wall − in-job) — the split that tells
you whether a slow query is data work (in-job) or per-action/driver
overhead (gaps: planning, collects, localCheckpoint scheduling,
state-store commits).

Pure measurement tool — never imported by the engine or the bench.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    repeats = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEATS", "1"))

    evt_dir = tempfile.mkdtemp(prefix="spark-evt-")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # get_spark only applies static conf when IT builds the session, so
    # pre-build via PYSPARK_SUBMIT_ARGS-free builder here:
    from pyspark.sql import SparkSession

    from library_beam_spark.session import _STATIC_CONF

    builder = (
        SparkSession.builder.appName("profile")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evt_dir)
        # Spark 4 compresses event logs with zstd by default; the sandbox
        # has no python zstandard module, so write them plain.
        .config("spark.eventLog.compress", "false")
    )
    for k, v in _STATIC_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from library_beam_spark import registry

    qs = registry.queries()
    spark.range(1).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    walls: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        for p in range(repeats):
            label = f"Q::{name}::{p}"
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            fn(spark, sf_dir).count()
            walls.setdefault(name, []).append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)

    # ---- parse the event log ----------------------------------------
    # Spark 4 defaults to the ROLLING (v2) layout: a directory
    # eventlog_v2_<appId> holding ordered events_N_<appId> part files.
    path = os.path.join(evt_dir, app_id)
    if not os.path.exists(path):
        cand = [
            p
            for p in os.listdir(evt_dir)
            if p.startswith(app_id) or p.startswith(f"eventlog_v2_{app_id}")
        ]
        path = os.path.join(evt_dir, cand[0])
    if os.path.isdir(path):
        parts = sorted(
            (f for f in os.listdir(path) if f.startswith("events_")),
            key=lambda f: int(f.split("_")[1]),
        )
        paths = [os.path.join(path, f) for f in parts]
    else:
        paths = [path]
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    per_stage: dict[int, dict] = {}

    def _lines():
        for pp in paths:
            opener = open
            if pp.endswith(".zstd"):  # spark may compress logs
                import zstandard  # pragma: no cover

                opener = lambda q: zstandard.open(q, "rt")  # noqa: E731
            with opener(pp) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "desc": props.get("spark.job.description", ""),
                    "t0": ev["Submission Time"],
                    "t1": None,
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
                for s in jobs[jid]["stages"]:
                    stage_to_job[s] = jid
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                d = per_stage.setdefault(sid, {"tasks": 0, "task_ms": 0, "run_ms": 0})
                d["tasks"] += 1
                ti = ev.get("Task Info", {})
                d["task_ms"] += max(0, ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
                tm = ev.get("Task Metrics") or {}
                d["run_ms"] += tm.get("Executor Run Time", 0)

    # attribute to queries
    agg: dict[str, dict] = {}
    for jid, j in jobs.items():
        desc = j["desc"]
        if not desc.startswith("Q::"):
            continue
        qname = desc.split("::")[1]
        a = agg.setdefault(
            qname,
            {"jobs": 0, "stages": 0, "tasks": 0, "task_s": 0.0, "run_s": 0.0,
             "intervals": []},
        )
        a["jobs"] += 1
        if j["t1"]:
            a["intervals"].append((j["t0"], j["t1"]))
        for sid in j["stages"]:
            if sid in per_stage:
                a["stages"] += 1
                a["tasks"] += per_stage[sid]["tasks"]
                a["task_s"] += per_stage[sid]["task_ms"] / 1e3
                a["run_s"] += per_stage[sid]["run_ms"] / 1e3

    def union_secs(iv: list[tuple[int, int]]) -> float:
        iv = sorted(iv)
        tot, cur0, cur1 = 0, None, None
        for a, b in iv:
            if cur1 is None or a > cur1:
                if cur1 is not None:
                    tot += cur1 - cur0
                cur0, cur1 = a, b
            else:
                cur1 = max(cur1, b)
        if cur1 is not None:
            tot += cur1 - cur0
        return tot / 1e3

    print(f"{'query':42s} {'wall':>7s} {'injob':>7s} {'gap':>7s} "
          f"{'jobs':>5s} {'stg':>4s} {'tasks':>6s} {'task_s':>7s} {'run_s':>7s}")
    for name in names:
        w = sum(walls.get(name, [0.0])) / max(1, len(walls.get(name, [1])))
        a = agg.get(name)
        if not a:
            print(f"{name:42s} {w:7.2f}  (no labelled jobs)")
            continue
        inj = union_secs(a["intervals"]) / max(1, repeats)
        print(
            f"{name:42s} {w:7.2f} {inj:7.2f} {w - inj:7.2f} "
            f"{a['jobs']//repeats:5d} {a['stages']//repeats:4d} "
            f"{a['tasks']//repeats:6d} {a['task_s']/max(1,repeats):7.2f} "
            f"{a['run_s']/max(1,repeats):7.2f}"
        )
    print(f"# event log: {path}")


if __name__ == "__main__":
    main()

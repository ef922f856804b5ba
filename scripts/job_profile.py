"""Job-level breakdown of a single declared query (optimization rounds).

Runs one named query exactly the way bench.py does (noop sink, seam
honored), with the Spark event log enabled, then parses the log and
prints per-job wall time, stage task-time, shuffle bytes, and the
job-count / gap-time summary — the "where do the seconds go" view that
guide §1/§7 asks for and that local mode (UI off) otherwise hides.

Usage: python scripts/job_profile.py <query> [--runs 2] [--setup-too]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_eventlog(log_dir: str) -> None:
    import glob

    paths = [
        p
        for p in glob.glob(os.path.join(log_dir, "*"))
        if not p.endswith(".inprogress")
    ] or glob.glob(os.path.join(log_dir, "*"))
    path = max(paths, key=os.path.getmtime)
    if os.path.isdir(path):  # event-log v2 directory layout
        parts = [
            p
            for p in glob.glob(os.path.join(path, "*"))
            if os.path.basename(p).startswith("events")
        ]
        lines = [ln for p in sorted(parts) for ln in open(p)]
    else:
        lines = list(open(path))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in lines:
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "t0": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {
                a["Name"]: a.get("Value")
                for a in si.get("Accumulables", [])
            }
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"],
                "tasks": si["Number of Tasks"],
                "ms": (si.get("Completion Time", 0) or 0)
                - (si.get("Submission Time", 0) or 0),
                "shuf_w": acc.get("internal.metrics.shuffle.write.bytesWritten", 0),
                "shuf_r": acc.get(
                    "internal.metrics.shuffle.read.remoteBytesRead", 0
                )
                or 0,
                "shuf_rl": acc.get(
                    "internal.metrics.shuffle.read.localBytesRead", 0
                )
                or 0,
                "input": acc.get("internal.metrics.input.bytesRead", 0),
                "task_ms": acc.get("internal.metrics.executorRunTime", 0),
            }
    ordered = sorted(jobs.items())
    total_job_ms = 0
    prev_end = None
    gap_ms = 0
    print(f"\n=== {len(ordered)} jobs ===")
    for jid, j in ordered:
        if "t1" not in j:
            continue
        dur = j["t1"] - j["t0"]
        total_job_ms += dur
        if prev_end is not None:
            gap_ms += max(0, j["t0"] - prev_end)
        prev_end = j["t1"]
        ran = [sid for sid in j["stages"] if sid in stages]
        stg = " | ".join(
            f"s{sid}:{stages[sid]['tasks']}t/{stages[sid]['ms']}ms"
            f"/w{(stages[sid]['shuf_w'] or 0)//1024}k"
            for sid in ran
        )
        print(f"job {jid:3d} {dur:6d}ms  {j['desc'][:60]:60s} {stg}")
    print(
        f"sum(job wall)={total_job_ms}ms  gaps-between-jobs={gap_ms}ms "
        f"(driver-side planning/collect overhead between jobs)"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from embeddingsearch_spark.session import get_spark
    from embeddingsearch_spark.suite import all_queries, setup_serve_pairs

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = all_queries()
    seams = setup_serve_pairs()
    log_dir = tempfile.mkdtemp(prefix="sparklog_")
    # match bench.py's data-sized shuffle partitioning so the profile
    # reproduces the bench's plan shape
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _partitions_for

    spark = get_spark(
        "job-profile",
        shuffle_partitions=_partitions_for(sf_dir),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(2).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.names:
        fn, _ = queries[name]
        if name in seams:
            setup_fn, target = seams[name]
            spark.sparkContext.setJobDescription(f"setup:{name}")
            t0 = time.perf_counter()
            setup_fn(spark, sf_dir)
            print(f"setup {name}: {time.perf_counter() - t0:.2f}s")
        else:
            target = fn
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"serve:{name}:run{i}")
            t0 = time.perf_counter()
            target(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{name} run{i}: {time.perf_counter() - t0:.3f}s")
        spark.catalog.clearCache()

    spark.stop()
    time.sleep(1)
    parse_eventlog(log_dir)
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Per-query profiling harness for the optimization rounds.

Times individual declared queries exactly the way bench.py does (noop
sink, SETUP_SERVE-seamed rows run their setup untimed first, median of
N runs) and optionally dumps `.explain("formatted")` next to the
timing so plan shape and seconds are captured together.

Usage:
  python scripts/profile_queries.py [--runs 3] [--plans DIR] q1 q2 ...
  python scripts/profile_queries.py --slowest 15   # from BENCH_LOCAL.json

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--slowest", type=int, default=0)
    args = ap.parse_args()

    from embeddingsearch_spark.session import get_spark
    from embeddingsearch_spark.suite import all_queries, setup_serve_pairs

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = all_queries()
    seams = setup_serve_pairs()

    names = list(args.names)
    if args.slowest:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "BENCH_LOCAL.json")) as f:
            rec = json.load(f)
        ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.slowest] if n in queries]

    # match bench.py's data-sized shuffle partitioning so profiles
    # reproduce the bench's plan shapes and are comparable to it
    from bench import _partitions_for

    spark = get_spark(
        "profile-queries",
        shuffle_partitions=_partitions_for(sf_dir),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    try:
        queries["search_cascade"][0](
            spark, "/root/testdata/sf0.001"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    spark.range(2).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results = {}
    for name in names:
        fn, _ = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        setup_s = None
        if name in seams:
            setup_fn, serve_fn = seams[name]
            t0 = time.perf_counter()
            setup_fn(spark, sf_dir)
            setup_s = time.perf_counter() - t0
            target = serve_fn
        else:
            target = fn
        runs = [timed(target) for _ in range(args.runs)]
        med = statistics.median(runs)
        results[name] = med
        extra = f" setup={setup_s:.2f}s" if setup_s is not None else ""
        print(
            f"{name:42s} median={med:7.3f}s runs="
            f"[{', '.join(f'{r:.3f}' for r in runs)}]{extra}",
            flush=True,
        )
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = target(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        spark.catalog.clearCache()
        import gc

        gc.collect()

    print(json.dumps({"total": round(sum(results.values()), 3),
                      "queries": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()

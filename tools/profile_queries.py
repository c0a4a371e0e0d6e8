"""Per-query cost decomposition: build vs plan vs execute.

The sf0.1 fixtures are small (5k docs / 2k embeddings / 600k lineitem),
so a multi-second registered query is NOT data-bound — its time hides in
(a) Python-side plan construction (py4j expression building, probe jobs
like scale_out's getNumPartitions / memo_count's count()),
(b) driver-side analysis+optimization of very large plans, and
(c) actual execution (AQE stage scheduling + tasks).

This tool splits those three for a list of registered queries so the
optimization rounds attack the right component:

  t_build  — wall time of ``queries[name](spark, sf_dir)`` (includes any
             probe JOBS the builder runs: .count(), .rdd.getNumPartitions)
  t_plan   — wall time of forcing queryExecution().executedPlan on the
             returned frame (analysis + optimization, no jobs)
  t_exec   — median of N noop-sink executions of a FRESHLY-built frame
             (what bench.py times INCLUDES build+plan per run: the bench
             calls queries[name](...) inside its timed lambda)
  jobs     — Spark job-group count delta during one execution

Usage: python tools/profile_queries.py q1,q2,... [runs]
Writes one JSON line per query to stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else []
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="profile")
    qs = dict(entrymod.queries())
    # BENCH_ONLY prod paths profile too — wrap them the way bench.py runs
    # them (cache + memo cleared per call)
    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY

    def _wrap(fn):
        def run(spark, sf_dir):
            spark.catalog.clearCache()
            clear_nparts_memo()
            return fn(spark, sf_dir)

        return run

    for prod_name, prod_fn in BENCH_ONLY.items():
        qs.setdefault(prod_name, _wrap(prod_fn))
    if not names:
        names = list(qs)

    # shared warm-up (same as bench.py)
    qs["a6_total_trips"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # one throwaway full run first so codegen caches are warm and the
        # numbers match bench.py's post-warmup medians
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        _ = df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0

        execs = []
        jobs_delta = None
        for i in range(runs):
            jobs_before = len(tracker.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            execs.append(time.perf_counter() - t0)
            if i == 0:
                jobs_delta = len(tracker.getJobIdsForGroup() or []) - jobs_before
        print(
            json.dumps(
                {
                    "q": name,
                    "t_build": round(t_build, 3),
                    "t_plan": round(t_plan, 3),
                    "t_total_med": round(statistics.median(execs), 3),
                    "t_total_min": round(min(execs), 3),
                    "jobs": jobs_delta,
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

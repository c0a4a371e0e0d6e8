"""Scale run for v8_prod (VERDICT r13 item 6): the SQ compression-loss
audit over RHP candidate pairs entered BENCH_ONLY in round 13 benched
at sf0.1 only; this measures it at 1x/10x/100x embedding scale and
reports the scaling exponent alpha (t = c * vecs^alpha) so SCALE100X.md
can carry its row like every other prod path.

Method matches the repo's other scale runners: noop-sink execution,
min of N_RUNS per scale, smallest scale first (warm-up paid before any
measured scale), results keyed by FULL directory path.

Usage: python tools/round17_scale_run.py [dir1 dir2 ...]
  (default: /root/testdata/sf0.1 /tmp/sf1x10 /tmp/sf1x100)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

#: override with SPARK_GRAFT_PRODS=name1,name2 to scale-run a subset
PROD_QUERIES = [
    q
    for q in os.environ.get(
        "SPARK_GRAFT_PRODS", "v8_prod,v13_prod"
    ).split(",")
    if q
]


def _timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1x10", "/tmp/sf1x100"]

    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="round17_scale")

    def run(fn, d):
        spark.catalog.clearCache()
        clear_nparts_memo()
        fn(spark, d).write.format("noop").mode("overwrite").save()

    # warm-up at the smallest scale (codegen), excluded from timings
    run(BENCH_ONLY[PROD_QUERIES[0]], dirs[0])

    results: dict[str, dict[str, float]] = {}
    rows_per_dir: dict[str, int] = {}
    for d in dirs:
        label = d.rstrip("/")  # full path: basenames can collide (ADVICE r13)
        rows_per_dir[label] = spark.read.parquet(f"{d}/embeddings.parquet").count()
        per: dict[str, float] = {}
        for name in PROD_QUERIES:
            per[name] = round(_timed(lambda: run(BENCH_ONLY[name], d)), 2)
            print(f"{label} {name} {per[name]}s", flush=True)
        results[label] = per

    labels = list(results)
    lo, hi = labels[0], labels[-1]
    scale = rows_per_dir[hi] / rows_per_dir[lo]
    if scale == 1.0:  # single dir / equal row counts: no alpha to compute
        print("\nROUND17:", json.dumps({"results": results, "rows": rows_per_dir}))
        return
    exponents = {
        name: round(
            math.log(max(results[hi][name], 1e-3) / max(results[lo][name], 1e-3))
            / math.log(scale),
            3,
        )
        for name in PROD_QUERIES
    }
    print(
        "\nROUND17:",
        json.dumps(
            {"results": results, "rows": rows_per_dir, "exponents": exponents}
        ),
    )


if __name__ == "__main__":
    main()

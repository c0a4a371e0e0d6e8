"""Scale run for v20 (the vector-store operations dashboard): the
standing policy says every new query lands with a 1x/10x/100x row and
a measured scaling exponent. v20_prod is the production form — the
dd17_prod xxhash64 churn groupBy over documents (500 k docs at 100x)
cross-joined with two 1-row broadcast KPI frames from the v17_prod
trained quantizer and v18_prod production-bucketing recall kernels
over embeddings (200 k vectors at 100x).

Method matches the repo's other scale runners: noop-sink execution,
min of N_RUNS per scale, smallest scale first (warm-up paid before any
measured scale), results keyed by FULL directory path.

Usage: python tools/round20_scale_run.py [dir1 dir2 ...]
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

    spark = get_spark(app_name="round20_scale")

    def run(d: str) -> None:
        spark.catalog.clearCache()
        clear_nparts_memo()
        BENCH_ONLY["v20_prod"](spark, d).write.format("noop").mode(
            "overwrite"
        ).save()

    run(dirs[0])  # warm-up at the smallest scale (codegen), untimed

    results: dict[str, float] = {}
    rows_per_dir: dict[str, int] = {}
    for d in dirs:
        label = d.rstrip("/")
        rows_per_dir[label] = spark.read.parquet(f"{d}/documents.parquet").count()
        results[label] = round(_timed(lambda: run(d)), 2)
        print(f"{label} v20_prod {results[label]}s", flush=True)

    labels = list(results)
    lo, hi = labels[0], labels[-1]
    scale = rows_per_dir[hi] / rows_per_dir[lo]
    alpha = (
        round(
            math.log(max(results[hi], 1e-3) / max(results[lo], 1e-3))
            / math.log(scale),
            3,
        )
        if scale != 1.0
        else None
    )
    print(
        "\nROUND20:",
        json.dumps({"results": results, "rows": rows_per_dir, "alpha": alpha}),
    )


if __name__ == "__main__":
    main()

"""Scale run for the budget-aware density gate (VERDICT r14 item 2):
v13_prod's exact-audit kernel is honest but n^1.5 (387 s extrapolated
at 100x); the LINEAR alternative was prose until round 15 — now it is
``density_gate(budget=0)`` (the prototype-cosine branch, v16's
kernel). This measures the linear branch at 1x/10x/100x embedding
scale and reports its scaling exponent alpha (t = c * vecs^alpha) so
SCALE100X.md carries the row the verdict asked for, next to
v13_prod's n^1.5 series.

Method matches the repo's other scale runners: noop-sink execution,
min of N_RUNS per scale, smallest scale first (warm-up paid before any
measured scale), results keyed by FULL directory path.

Usage: python tools/round18_scale_run.py [dir1 dir2 ...]
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

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo, scale_out
    from nyc_taxi_etl_dashboard_spark.operators.similarity import density_gate
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="round18_scale")

    def linear_gate(d: str):
        e = scale_out(
            spark.read.parquet(f"{d}/embeddings.parquet").select(
                "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
            )
        )
        return density_gate(e, decile=0.1, budget=0)  # force the linear branch

    def run(d: str) -> None:
        spark.catalog.clearCache()
        clear_nparts_memo()
        linear_gate(d).write.format("noop").mode("overwrite").save()

    run(dirs[0])  # warm-up at the smallest scale (codegen), untimed

    results: dict[str, float] = {}
    rows_per_dir: dict[str, int] = {}
    for d in dirs:
        label = d.rstrip("/")
        rows_per_dir[label] = spark.read.parquet(f"{d}/embeddings.parquet").count()
        results[label] = round(_timed(lambda: run(d)), 2)
        print(f"{label} density_gate(budget=0) {results[label]}s", flush=True)

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
        "\nROUND18:",
        json.dumps({"results": results, "rows": rows_per_dir, "alpha": alpha}),
    )


if __name__ == "__main__":
    main()

"""Scale run for the round-16 wave: DSIR with the lang-balanced
parametric target (x25) and the snapshot-granularity overlap matrix
(dd16b) at sf0.1 (1×), 10× and 100× document scale, next to their
round-15 kernels (x23, dd16) for a same-session delta.

Method matches tools/newwave_scale_run.py: noop-sink execution (full
computation, no collect), min of N_RUNS per scale, smallest scale
first so JVM/codegen warm-up is paid before any measured scale; the
scaling exponent alpha solves t = c · docs^alpha between the smallest
and largest scale.

Usage: python tools/round16_scale_run.py [dir1 dir2 ...]
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

DOC_QUERIES = [
    "x25_dsir_balanced",
    "x23_dsir_resample",
    "dd16b_snapshot_overlap",
    "dd16_source_overlap",
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

    import __spark_entry__ as entrymod
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="round16_scale")
    queries = entrymod.queries()
    queries["a6_total_trips"](spark, dirs[0]).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(fn, d):
        spark.catalog.clearCache()
        from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo

        clear_nparts_memo()
        fn(spark, d).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    rows_per_dir: dict[str, int] = {}
    for d in dirs:
        # key by FULL path (ADVICE r13: keying by basename collapsed
        # /a/sf0.1 and /b/sf0.1 into one entry, corrupting the
        # alpha-exponent endpoints)
        label = d.rstrip("/")
        rows_per_dir[label] = spark.read.parquet(f"{d}/documents.parquet").count()
        per: dict[str, float] = {}
        for name in DOC_QUERIES:
            per[name] = round(_timed(lambda: run(queries[name], d)), 2)
            print(f"{label} {name} {per[name]}s", flush=True)
        results[label] = per

    labels = list(results)
    lo, hi = labels[0], labels[-1]
    scale = rows_per_dir[hi] / rows_per_dir[lo]
    if scale == 1.0:  # single dir / equal rows: no alpha (round-14 review)
        print(json.dumps({"results": results, "rows": rows_per_dir}))
        return
    exponents = {
        name: round(
            math.log(max(results[hi][name], 1e-3) / max(results[lo][name], 1e-3))
            / math.log(scale),
            3,
        )
        for name in DOC_QUERIES
    }
    print(
        "\nROUND16:",
        json.dumps(
            {"results": results, "rows": rows_per_dir, "exponents": exponents}
        ),
    )


if __name__ == "__main__":
    main()

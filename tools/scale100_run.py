"""100× scale run (VERDICT r7 item 3): execute the headline parity
operators at sf0.1, 10× and 100× in ONE session and report wall-times
plus per-operator scaling exponents.

Method: each operator runs to completion via the noop sink (full
computation, no collect), min of N_RUNS per scale, sf0.1 first so the
JVM/codegen warm-up is paid before any measured scale. The transform
pipeline is additionally timed through its real dual-sink write
(`dual_sink_write`, the rows/s comparable against BASELINE.md). The
scaling exponent alpha solves t = c · rows^alpha between the smallest
and largest scale: alpha ≈ 1 is linear (the target for row-stream
operators at fixed cluster size), alpha < 1 means fixed overhead still
amortizes, alpha > 1 names a super-linear operator that needs a cause.

dd11's increment-mode behavior at 100× is covered by
tools/refresh_rehearsal.py (the refresh leg is corpus-size-invariant by
construction; this runner covers the corpus-shaped operators).

Usage: python tools/scale100_run.py [dir1 dir2 ...]
  (default: /root/testdata/sf0.1 /tmp/sf1x10 /tmp/sf1x100)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

QUERIES = [
    "pipe_valid_rows",
    "st4_fact_resolved",
    "a13_revenue_by_payment",
    "w1_top3_locations_per_period",
    "e3_sessionize",
    "j2_asof_join",
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
    from nyc_taxi_etl_dashboard_spark.plans.pipeline import dual_sink_write
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="scale100")
    queries = entrymod.queries()
    # warm-up (codegen, parquet reader init) on the smallest scale
    queries["a6_total_trips"](spark, dirs[0]).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    rows_per_dir: dict[str, int] = {}
    for d in dirs:
        label = d.rstrip("/")  # full path: basenames can collide (ADVICE r13)
        per: dict[str, float] = {}
        for name in QUERIES:
            per[name] = round(
                _timed(
                    lambda: queries[name](spark, d)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                ),
                2,
            )
            print(f"{label} {name} {per[name]}s", flush=True)
        out_dir = tempfile.mkdtemp(prefix="scale100_sink_")
        try:
            obs: dict = {}

            def pipe():
                obs.update(dual_sink_write(spark, d, out_dir))

            per["pipe_transform_full"] = round(_timed(pipe), 2)
            rows_per_dir[label] = obs["total"]
            per["pipe_transform_rps"] = round(obs["total"] / per["pipe_transform_full"])
            print(
                f"{label} pipe_transform_full {per['pipe_transform_full']}s "
                f"({per['pipe_transform_rps']} rows/s)",
                flush=True,
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
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
        for name in [*QUERIES, "pipe_transform_full"]
    }
    print("\nSCALE100:", json.dumps({"results": results, "rows": rows_per_dir, "exponents": exponents}))


if __name__ == "__main__":
    main()

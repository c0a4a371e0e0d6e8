"""Scale run for the round-12/13 operator waves: the split/chunk/audio
quartet (x17 x19 t18 mm4) and the mixing/audit/filtered-ANN/packing
quartet (x20 t19 v14 mm5) at sf0.1 (1×), 10× and 100× document scale.

Method matches tools/scale100_run.py: noop-sink execution (full
computation, no collect), min of N_RUNS per scale, smallest scale first
so JVM/codegen warm-up is paid before any measured scale; the scaling
exponent alpha solves t = c · docs^alpha between the smallest and
largest scale. Document-table operators all key off ``documents``
(500 k docs at 100×); v14 keys off ``embeddings`` (200 k vectors at
100×), so its alpha uses the vector scale factor.

Usage: python tools/newwave_scale_run.py [dir1 dir2 ...]
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

#: registry queries over documents (alpha vs the documents row scale)
DOC_QUERIES = [
    "x17_split_assign",
    "x19_leakage_safe_split",
    "t18_chunk_overlap",
    "mm4_audio_windows",
    "x20_temperature_mix",
    "t19_contamination_audit",
    "mm5_interleaved_pack",
    "t20_distribution_drift",
]
#: registry queries over embeddings (alpha vs the vector row scale)
VEC_QUERIES = ["v14_filtered_ann", "v15_prototype_prune"]
#: bench-only production shapes (same noop-sink method)
PROD_QUERIES = ["v14_prod", "v15_prod"]


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
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="newwave_scale")
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
    rows_per_dir: dict[str, dict[str, int]] = {}
    for d in dirs:
        label = d.rstrip("/")  # full path: basenames can collide (ADVICE r13)
        rows_per_dir[label] = {
            "documents": spark.read.parquet(f"{d}/documents.parquet").count(),
            "embeddings": spark.read.parquet(f"{d}/embeddings.parquet").count(),
        }
        per: dict[str, float] = {}
        for name in DOC_QUERIES + VEC_QUERIES:
            per[name] = round(_timed(lambda: run(queries[name], d)), 2)
            print(f"{label} {name} {per[name]}s", flush=True)
        for name in PROD_QUERIES:
            per[name] = round(_timed(lambda: run(BENCH_ONLY[name], d)), 2)
            print(f"{label} {name} {per[name]}s", flush=True)
        results[label] = per

    labels = list(results)
    lo, hi = labels[0], labels[-1]
    exponents: dict[str, float] = {}
    for name in DOC_QUERIES + VEC_QUERIES + PROD_QUERIES:
        table = "embeddings" if name.startswith(("v14", "v15")) else "documents"
        scale = rows_per_dir[hi][table] / rows_per_dir[lo][table]
        if scale == 1.0:  # single dir / equal rows: no alpha (round-14 review)
            continue
        exponents[name] = round(
            math.log(max(results[hi][name], 1e-3) / max(results[lo][name], 1e-3))
            / math.log(scale),
            3,
        )
    print(
        "\nNEWWAVE:",
        json.dumps(
            {"results": results, "rows": rows_per_dir, "exponents": exponents}
        ),
    )


if __name__ == "__main__":
    main()

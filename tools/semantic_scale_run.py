"""Semantic-suite 100× scale run (VERDICT r8 item 3): time the
embedding-family production paths at 1× (sf0.1, 2 k vectors) and 100×
(200 k vectors — tools/make_scale100x.py now replicates embeddings with
planted near-dups and hash-random spread), plus dd12_prod on the 500 k
replica-heavy document corpus (the auto-cap fix's proving ground).

Per-operator notes on config scaling:
- v10/v11/v12_prod run their registered BENCH_ONLY shapes unchanged.
- v13_prod scales its cell count with the corpus (n_cells ≈ √N, the
  IVF guideline) — the whole point of the within-cells kernel is that
  cell size, not corpus size, bounds the quadratic; a fixed 8-cell
  config at 200 k vectors would be half-the-corpus candidate blocks.
- the semantic sink is timed as ONE micro-batch (1 % of the corpus)
  against a pre-seeded warehouse of the other 99 % — the steady-state
  per-batch cost the sink's docstring promises is increment-bounded.

Method matches tools/scale100_run.py: noop-sink execution (full
computation, no collect), min of N_RUNS, smallest scale first so
warm-up is paid before any measured scale. Prints one JSON line.

Usage: python tools/semantic_scale_run.py [dir1 dir2 ...]
  (default: /root/testdata/sf0.1 /tmp/sf1x100)
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

#: comma-separated subset of ops to run (default all) — re-measuring
#: one operator must not cost a v13 rerun
OPS = set(
    filter(
        None,
        os.environ.get(
            "SPARK_GRAFT_SEMANTIC_OPS",
            "v10_prod,v11_prod,v12_prod,v13_prod,dd12_prod,semantic_sink",
        ).split(","),
    )
)


def _timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1x100"]

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
    from nyc_taxi_etl_dashboard_spark.operators.similarity import (
        knn_density_outliers,
    )
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY
    from nyc_taxi_etl_dashboard_spark.session import get_spark
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        semantic_dedup_sink,
    )

    spark = get_spark(app_name="semantic-scale")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def fresh() -> None:
        spark.catalog.clearCache()
        clear_nparts_memo()

    results: dict[str, dict[str, float]] = {}
    n_vec: dict[str, int] = {}
    for d in dirs:
        label = d.rstrip("/")  # full path: basenames can collide (ADVICE r13)
        per: dict[str, float] = {}
        embs = spark.read.parquet(f"{d}/embeddings.parquet")
        n = embs.count()
        n_vec[label] = n

        for name in ("v10_prod", "v11_prod", "v12_prod"):
            if name not in OPS:
                continue
            fn = BENCH_ONLY[name]

            def run(fn=fn):
                fresh()
                noop(fn(spark, d))

            per[name] = round(_timed(run), 2)
            print(f"{label} {name} {per[name]}s", flush=True)

        n_cells = max(8, int(math.sqrt(n)))

        def run_v13():
            fresh()
            noop(
                knn_density_outliers(
                    spark.read.parquet(f"{d}/embeddings.parquet"),
                    k=5,
                    decile=0.1,
                    n_cells=n_cells,
                    n_probes=4,
                )
            )

        if "v13_prod" in OPS:
            per["v13_prod"] = round(_timed(run_v13), 2)
            print(f"{label} v13_prod (cells={n_cells}) {per['v13_prod']}s", flush=True)

        def run_dd12():
            fresh()
            noop(BENCH_ONLY["dd12_prod"](spark, d))

        if "dd12_prod" in OPS:
            per["dd12_prod"] = round(_timed(run_dd12), 2)
            print(f"{label} dd12_prod {per['dd12_prod']}s", flush=True)

        # semantic sink: seed warehouse with 99 % of vectors, then time
        # one batch of the remaining 1 % (timing excludes the seed)
        if "semantic_sink" not in OPS:
            results[label] = per
            continue
        wh_dir = tempfile.mkdtemp(prefix="semsink_wh_")
        wh_path = os.path.join(wh_dir, "warehouse.parquet")
        try:
            sink, stats = semantic_dedup_sink(wh_path)
            fresh()
            sink(embs.filter(F.col("vec_id") % 100 != 0), 0)  # seed (untimed)
            batch = embs.filter(F.col("vec_id") % 100 == 0).localCheckpoint()
            t0 = time.perf_counter()
            sink(batch, 1)
            per["semantic_sink_batch"] = round(time.perf_counter() - t0, 2)
            print(
                f"{label} semantic_sink_batch {per['semantic_sink_batch']}s "
                f"(batches={stats['batches']})",
                flush=True,
            )
        finally:
            shutil.rmtree(wh_dir, ignore_errors=True)
        results[label] = per

    labels = list(results)
    lo, hi = labels[0], labels[-1]
    scale = n_vec[hi] / n_vec[lo]
    if scale == 1.0:  # single dir / equal rows: no alpha (round-14 review)
        print("\nSEMANTIC100:", json.dumps({"results": results, "rows": n_vec}))
        return
    exponents = {
        name: round(
            math.log(max(results[hi][name], 1e-3) / max(results[lo][name], 1e-3))
            / math.log(scale),
            3,
        )
        for name in results[lo]
    }
    print(
        "\nSEMANTIC100:",
        json.dumps({"results": results, "vectors": n_vec, "exponents": exponents}),
    )


if __name__ == "__main__":
    main()

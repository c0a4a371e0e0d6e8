"""Interleaved A/B: round-13 HEAD vs the r12 artifact commit (2dd6682)
on the six queries the r13 driver run flagged as regressed (VERDICT r13
item 1): pipe_transform_full (+224%), pipe_transform_bronze (+36%),
e4_event_type_funnel (+185%), v11_prod (+72%), v12_prod (+219%),
x23_prod (+66%).

Design matches tools/ab_head_vs_r10.py (which settled the r10->r12
dispute): ONE Spark session; each round times every flagged query once
under variant A (HEAD) and once under variant B (the r12 worktree at
``.ab_r12``), swapping the library by purging ``sys.modules`` and
flipping ``sys.path[0]``. Per-run hygiene matches bench.py's pinned
wrapper (clearCache + clear_nparts_memo, noop sink); variant order
alternates per round so slot bias cancels. Every HEAD/r12 pair is a
same-moment comparison, so shared-box drift hits both sides together.

This run additionally times a paired single-file IO probe (the exact
``io_calibration`` scan from bench.py) IMMEDIATELY BEFORE each
variant's pipe_transform_full, so the per-variant ``io_norm`` ratio —
the metric whose doubling (19.2 -> 40.07) motivated this A/B — is
reproduced under both libraries in the same session.

Run:  python tools/ab_head_vs_r12.py [rounds]
Emits one JSON line with per-query medians for each variant and the
median of the per-round paired ratios (1.0 means no code effect).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEAD_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R12_DIR = os.path.join(HEAD_DIR, ".ab_r12")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BRONZE_DIR = os.path.join(HEAD_DIR, "fixtures", "bronze_sf0.1")
#: registered queries timed via entry.queries() (pinned wrapper: clears
#: cache + nparts memo per call)
QUERIES = ["e4_event_type_funnel"]
#: BENCH_ONLY production shapes (raw callables; hygiene applied here)
PRODS = ["v11_prod", "v12_prod", "x23_prod"]


def _use(variant_dir: str):
    """Swap the active library to ``variant_dir`` by purging modules."""
    for name in list(sys.modules):
        if name.startswith("nyc_taxi_etl_dashboard_spark") or name == "__spark_entry__":
            del sys.modules[name]
    while HEAD_DIR in sys.path:
        sys.path.remove(HEAD_DIR)
    while R12_DIR in sys.path:
        sys.path.remove(R12_DIR)
    sys.path.insert(0, variant_dir)
    import __spark_entry__ as entry  # noqa: PLC0415
    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo  # noqa: PLC0415
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY  # noqa: PLC0415
    from nyc_taxi_etl_dashboard_spark.plans.pipeline import dual_sink_write  # noqa: PLC0415

    return entry, dual_sink_write, BENCH_ONLY, clear_nparts_memo


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sys.path.insert(0, HEAD_DIR)
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="ab_head_vs_r12")

    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="ab_sink_")
    keys = [*QUERIES, *PRODS, "pipe_transform_full", "pipe_transform_bronze", "io_probe"]
    results: dict[str, dict[str, list[float]]] = {
        q: {"head": [], "r12": []} for q in keys
    }

    def io_probe_once() -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .agg(F.sum("l_quantity").alias("s"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    def one_pass(variant: str, vdir: str) -> None:
        entry, dual_sink_write, bench_only, clear_nparts_memo = _use(vdir)
        qs = entry.queries()
        for q in QUERIES:
            t0 = time.perf_counter()
            qs[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            results[q][variant].append(time.perf_counter() - t0)
        for q in PRODS:
            spark.catalog.clearCache()
            clear_nparts_memo()
            t0 = time.perf_counter()
            bench_only[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            results[q][variant].append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        clear_nparts_memo()
        # paired probe immediately before the transform, exactly as the
        # round-14 bench.py pairing does
        results["io_probe"][variant].append(io_probe_once())
        t0 = time.perf_counter()
        dual_sink_write(spark, SF_DIR, out_dir)
        results["pipe_transform_full"][variant].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        dual_sink_write(spark, BRONZE_DIR, out_dir)
        results["pipe_transform_bronze"][variant].append(time.perf_counter() - t0)
        spark.catalog.clearCache()

    # warm up both variants once (codegen paths), excluded from timings
    one_pass("head", HEAD_DIR)
    one_pass("r12", R12_DIR)
    for q in results:
        results[q] = {"head": [], "r12": []}

    for r in range(rounds):
        order = [("head", HEAD_DIR), ("r12", R12_DIR)]
        if r % 2:
            order.reverse()
        for variant, vdir in order:
            one_pass(variant, vdir)

    shutil.rmtree(out_dir, ignore_errors=True)
    report = {}
    for q, r in results.items():
        ratios = sorted(h / b for h, b in zip(r["head"], r["r12"]))
        report[q] = {
            "head_med": round(statistics.median(r["head"]), 3),
            "r12_med": round(statistics.median(r["r12"]), 3),
            "head_min": round(min(r["head"]), 3),
            "r12_min": round(min(r["r12"]), 3),
            "paired_ratio_med": round(statistics.median(ratios), 3),
            "head_runs": [round(x, 3) for x in r["head"]],
            "r12_runs": [round(x, 3) for x in r["r12"]],
        }
    # per-variant io_norm (transform / same-round probe), the metric that
    # doubled in the r13 driver artifact
    for variant in ("head", "r12"):
        xs = results["pipe_transform_full"][variant]
        ps = results["io_probe"][variant]
        report.setdefault("io_norm", {})[variant] = round(
            statistics.median(sorted(x / p for x, p in zip(xs, ps))), 2
        )
    print(json.dumps({"rounds": rounds, "sf_dir": SF_DIR, "ab": report}))


if __name__ == "__main__":
    main()

"""Interleaved A/B: HEAD vs the r10 artifact commit (de2d31e) on the
four queries the r12 driver run flagged as regressed (VERDICT r12 item
1): pipe_valid_rows, pipe_transform_bronze, dd4_lsh_pairs, dd5_simhash.

Design: ONE Spark session; each round times every query once under
variant A (HEAD) then once under variant B (r10 worktree), swapping the
library by purging ``sys.modules`` and flipping ``sys.path[0]`` between
variants. Per-run hygiene matches bench.py's pinned wrapper exactly
(clearCache + clear_nparts_memo before each execution, noop sink).
Interleaving makes every A/B pair a same-moment comparison, so shared-
box IO drift — the prime alternative hypothesis, since the cleanse/
pipeline code is byte-identical between the two commits and dd5's whole
path is too — inflates both sides of a pair together.

Run:  python tools/ab_head_vs_r10.py [rounds]
Emits one JSON line with per-query medians for each variant and the
median of the per-round paired ratios (B==1.0 means no code effect).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEAD_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R10_DIR = os.path.join(HEAD_DIR, ".ab_r10")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BRONZE_DIR = os.path.join(HEAD_DIR, "fixtures", "bronze_sf0.1")
QUERIES = ["pipe_valid_rows", "dd4_lsh_pairs", "dd5_simhash"]


def _use(variant_dir: str):
    """Swap the active library to ``variant_dir`` by purging modules."""
    for name in list(sys.modules):
        if name.startswith("nyc_taxi_etl_dashboard_spark") or name == "__spark_entry__":
            del sys.modules[name]
    while HEAD_DIR in sys.path:
        sys.path.remove(HEAD_DIR)
    while R10_DIR in sys.path:
        sys.path.remove(R10_DIR)
    sys.path.insert(0, variant_dir)
    import __spark_entry__ as entry  # noqa: PLC0415

    from nyc_taxi_etl_dashboard_spark.plans.pipeline import dual_sink_write  # noqa: PLC0415

    return entry, dual_sink_write


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sys.path.insert(0, HEAD_DIR)
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="ab_head_vs_r10")

    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="ab_sink_")
    results: dict[str, dict[str, list[float]]] = {
        q: {"head": [], "r10": []} for q in [*QUERIES, "pipe_transform_bronze"]
    }

    def one_pass(variant: str, vdir: str) -> None:
        entry, dual_sink_write = _use(vdir)
        qs = entry.queries()
        for q in QUERIES:
            t0 = time.perf_counter()
            qs[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            results[q][variant].append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        dual_sink_write(spark, BRONZE_DIR, out_dir)
        results["pipe_transform_bronze"][variant].append(time.perf_counter() - t0)
        spark.catalog.clearCache()

    # warm up both variants once (codegen paths), excluded from timings
    one_pass("head", HEAD_DIR)
    one_pass("r10", R10_DIR)
    for q in results:
        results[q] = {"head": [], "r10": []}

    for r in range(rounds):
        # alternate which variant goes first so slot-in-round bias cancels
        order = [("head", HEAD_DIR), ("r10", R10_DIR)]
        if r % 2:
            order.reverse()
        for variant, vdir in order:
            one_pass(variant, vdir)

    shutil.rmtree(out_dir, ignore_errors=True)
    report = {}
    for q, r in results.items():
        ratios = sorted(h / b for h, b in zip(r["head"], r["r10"]))
        report[q] = {
            "head_med": round(statistics.median(r["head"]), 3),
            "r10_med": round(statistics.median(r["r10"]), 3),
            "head_min": round(min(r["head"]), 3),
            "r10_min": round(min(r["r10"]), 3),
            "paired_ratio_med": round(statistics.median(ratios), 3),
            "head_runs": [round(x, 3) for x in r["head"]],
            "r10_runs": [round(x, 3) for x in r["r10"]],
        }
    print(json.dumps({"rounds": rounds, "sf_dir": SF_DIR, "ab": report}))


if __name__ == "__main__":
    main()

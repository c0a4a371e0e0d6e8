"""Round-19 adjudication of the three driver-bench prod regressions
(VERDICT r18 item 1): paired, interleaved, SAME-SESSION A/B of the two
r18 config changes in isolation —

  floor  = spark.sql.adaptive.coalescePartitions.minPartitionSize
           (debe23f: 256k vs the 1m Spark default)
  limit  = spark.sql.limit.initialNumPartitions
           (9c39e19: defaultParallelism vs the 1 Spark default)

Both are runtime-settable SQL confs, so each variant is a conf flip in
one process: no worktrees, no module swapping, and every round times
all four variants back-to-back so shared-box drift inflates them
together (the tools/ab_interleaved.py pairing rationale). Variant order
rotates per round so slot bias cancels.

Usage:
    [SPARK_GRAFT_CPUS=8] python tools/conf_ab_r19.py [rounds] [q1,q2,...]

Defaults: 5 rounds over v11_prod,v12_prod,x26_prod,v14_prod (the three
driver-flagged regressions + the v14 watch item). Emits one JSON line:
per-variant medians and per-round paired ratios vs the "neither"
(r17-posture) variant.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEAD_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HEAD_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FLOOR_ON = os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k")
FLOOR_OFF = "1m"  # Spark default

VARIANTS = ("both", "floor_only", "limit_only", "neither")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    wanted = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["v11_prod", "v12_prod", "x26_prod", "v14_prod"]
    )

    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
    from nyc_taxi_etl_dashboard_spark.plans.llmops import BENCH_ONLY, QUERIES
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="conf_ab_r19")
    cores = spark.sparkContext.defaultParallelism
    limit_on, limit_off = str(cores), "1"

    def apply(variant: str) -> None:
        floor = FLOOR_ON if variant in ("both", "floor_only") else FLOOR_OFF
        lim = limit_on if variant in ("both", "limit_only") else limit_off
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", floor
        )
        spark.conf.set("spark.sql.limit.initialNumPartitions", lim)

    def run_once(q: str) -> float:
        fn = QUERIES.get(q) or BENCH_ONLY[q]
        spark.catalog.clearCache()
        clear_nparts_memo()
        spark.sparkContext.setJobDescription(f"conf_ab {q}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, dict[str, list[float]]] = {
        q: {v: [] for v in VARIANTS} for q in wanted
    }

    # warmup (codegen/worker spinup), excluded
    apply("both")
    for q in wanted:
        run_once(q)

    for r in range(rounds):
        order = list(VARIANTS[r % len(VARIANTS):]) + list(
            VARIANTS[: r % len(VARIANTS)]
        )
        for variant in order:
            apply(variant)
            for q in wanted:
                results[q][variant].append(run_once(q))

    report: dict = {}
    for q, per in results.items():
        entry = {v: round(statistics.median(xs), 3) for v, xs in per.items()}
        for v in ("both", "floor_only", "limit_only"):
            ratios = sorted(
                a / b for a, b in zip(per[v], per["neither"])
            )
            entry[f"{v}_vs_neither"] = round(statistics.median(ratios), 3)
        entry["runs"] = {v: [round(x, 3) for x in xs] for v, xs in per.items()}
        report[q] = entry
    print(
        json.dumps(
            {"cores": cores, "rounds": rounds, "sf_dir": SF_DIR, "ab": report}
        )
    )


if __name__ == "__main__":
    main()

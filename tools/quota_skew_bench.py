"""Planted hot-domain bench for the x10 quota paths (VERDICT r7 item
1's measurement leg): one crawl domain holds 40% of all documents, and
the per-domain quota gate runs both ways —

- ``plain``: one ``row_number().over(partitionBy(source))`` window (the
  pre-round-8 shape) — the hot domain's rows funnel into ONE task;
- ``skew_safe``: ``operators.skew.capped_keep_first`` (per-domain
  count → map-side pass-through for at-quota domains → two-phase
  salted window for the rest) — the hot domain spreads over
  ``salt_buckets`` tasks.

Both paths are asserted to produce the identical keep-set cardinality
here (full keep-set equality is pinned at pytest scale) before timing.
Rows are slim (id, source) — exactly what the production operator
windows; timings are min of N_RUNS via the noop sink.

Usage: python tools/quota_skew_bench.py [n_rows]   (default 5,000,000)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
HOT_QUOTA = 50_000
DEFAULT_QUOTA = 2_000


def _timed(fn) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators.skew import capped_keep_first
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="quota-skew-bench")
    # 40% of rows land on the hot domain; the rest spread over 1000
    # long-tail sources (each ~0.06% — far under the default quota path
    # only when n is small; at 5 M rows each tail source holds ~3 k rows
    # so the default ALSO binds — both regimes stay live)
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.pmod("id", 10) < 4, F.lit("hotdomain"))
            .otherwise(F.concat(F.lit("src"), F.pmod("id", 1000).cast("string")))
            .alias("source"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze the input so both paths scan identical data
    )
    quota = F.when(F.col("source") == "hotdomain", F.lit(HOT_QUOTA)).otherwise(
        F.lit(DEFAULT_QUOTA)
    )

    def plain():
        w = Window.partitionBy("source").orderBy("doc_id")
        (
            docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= quota)
            .select("doc_id", "source")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    def safe():
        capped_keep_first(docs, "source", "doc_id", quota).select(
            "doc_id", "source"
        ).write.format("noop").mode("overwrite").save()

    w = Window.partitionBy("source").orderBy("doc_id")
    n_plain = (
        docs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= quota).count()
    )
    n_safe = capped_keep_first(docs, "source", "doc_id", quota).count()
    assert n_plain == n_safe, (n_plain, n_safe)

    t_plain = _timed(plain)
    t_safe = _timed(safe)
    hot_rows = docs.filter(F.col("source") == "hotdomain").count()
    print(
        f"\nQUOTA_SKEW_BENCH n={n} hot_rows={hot_rows} kept={n_safe} "
        f"plain={t_plain:.2f}s skew_safe={t_safe:.2f}s "
        f"speedup={t_plain / t_safe:.2f}x runs={N_RUNS}"
    )


if __name__ == "__main__":
    main()

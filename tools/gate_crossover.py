"""Measure the t12 (exact per-stratum percentile window) vs t13
(percentile_approx sketch) crossover — VERDICT r6 item 2's "the pair is
the whole point" experiment.

The two paths compute the same per-language decile threshold table from
a ``(doc_id, lang, avg_logprob)`` score frame:

- exact (``lm_thresholds_exact``): percent_rank window => a full
  shuffle+sort of every score row into its stratum.
- sketch (``lm_thresholds_sketch``): one-pass mergeable GK sketch with
  map-side partial aggregation => no row-level sort anywhere.

The fixture corpus (5 k-500 k docs) cannot show where the sort starts
to lose, so this synthesizes score frames directly (deterministic
xxhash64-derived scores — no data files, no tokenize/join noise) across
row counts and stratum counts, and times threshold-table
materialization for both paths. Usage::

    python tools/gate_crossover.py [rows ...]

Defaults: rows in {1e6, 1e7, 5e7} x strata in {5, 2000}, min of 2 runs.
Prints one JSON line per cell; SCALE10X.md records the verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.plans.llmops import (
        lm_thresholds_exact,
        lm_thresholds_sketch,
    )
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="gate-crossover")
    rows_list = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000, 50_000_000]

    def scores(n: int, strata: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("l"), F.pmod(F.xxhash64("id"), F.lit(strata))).alias("lang"),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1_000_000)) / 1e6).alias(
                "avg_logprob"
            ),
        )

    def timed(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    for n in rows_list:
        for strata in (5, 2000):
            s = scores(n, strata)
            exact = timed(lm_thresholds_exact(s))
            sketch = timed(lm_thresholds_sketch(s))
            print(
                json.dumps(
                    {
                        "rows": n,
                        "strata": strata,
                        "exact_sec": exact,
                        "sketch_sec": sketch,
                        "sketch_speedup": round(exact / sketch, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Interleaved A/B of the two x25 plan forms (VERDICT r13 item 3: the
x25 docstring cited a 100x A/B that was never committed — this tool
produces it, or the number that replaces the claim):

- SLIM (shipped, plans/llmops.py:q_dsir_balanced): the per-language
  target rank window runs over ``(doc_id, lang)`` only, and the
  selected target ids broadcast back into membership join/anti-join —
  the text column never rides the lang-partitioned window shuffle.
- FIRST-CUT (reconstructed here): the naive form — rank the FULL
  document rows (text included) in the window, filter target/candidate
  directly from the ranked frame. Same answer, but every document's
  text crosses the |langs|-keyed shuffle.

Both forms feed the identical DSIR tail (dsir_log_weights + top-k per
language), so the paired ratio isolates exactly the
text-on-the-shuffle cost. Interleaved per round in ONE session so
shared-box drift cancels (the repo's standing A/B pattern).

Usage: python tools/x25_form_ab.py [dir] [rounds]
  (default: /tmp/sf1x100, 5 rounds)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
    from nyc_taxi_etl_dashboard_spark.operators.text import dsir_log_weights
    from nyc_taxi_etl_dashboard_spark.plans.llmops import (
        X23_BUCKETS,
        X25_TARGET_PER_LANG,
        _docs,
        q_dsir_balanced,
    )
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="x25_form_ab")

    def first_cut(spark, sf_dir):
        """The naive form: full rows (text included) through the rank
        window. Kept OUT of the library deliberately — this tool is its
        only home, as the measured counterexample."""
        dd = _docs(spark, sf_dir)
        rn = F.row_number().over(Window.partitionBy("lang").orderBy("doc_id"))
        ranked = dd.withColumn("rn", rn)
        target = ranked.filter(F.col("rn") <= X25_TARGET_PER_LANG).drop("rn")
        cand = ranked.filter(F.col("rn") > X25_TARGET_PER_LANG).drop("rn")
        w = dsir_log_weights(cand, target, n_buckets=X23_BUCKETS).select(
            F.col("id").alias("doc_id"), "log_w"
        )
        win = Window.partitionBy("lang").orderBy(F.desc("log_w"), F.asc("doc_id"))
        from nyc_taxi_etl_dashboard_spark.plans.llmops import X23_PER_LANG

        return (
            w.join(dd.select("doc_id", "lang"), "doc_id")
            .withColumn("rnk", F.row_number().over(win))
            .select(
                "doc_id", "lang", "log_w", "rnk",
                (F.col("rnk") <= X23_PER_LANG).alias("keep"),
            )
        )

    def run(fn) -> float:
        spark.catalog.clearCache()
        clear_nparts_memo()
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up both forms once (codegen), excluded
    run(q_dsir_balanced)
    run(first_cut)

    slim, naive = [], []
    for r in range(rounds):
        order = [(slim, q_dsir_balanced), (naive, first_cut)]
        if r % 2:
            order.reverse()
        for sink, fn in order:
            sink.append(run(fn))

    ratios = sorted(n / s for n, s in zip(naive, slim))
    print(
        json.dumps(
            {
                "dir": d,
                "rounds": rounds,
                "slim_med": round(statistics.median(slim), 3),
                "naive_med": round(statistics.median(naive), 3),
                "slim_runs": [round(x, 3) for x in slim],
                "naive_runs": [round(x, 3) for x in naive],
                "paired_ratio_med": round(statistics.median(ratios), 3),
                "paired_ratio_min": round(ratios[0], 3),
            }
        )
    )


if __name__ == "__main__":
    main()

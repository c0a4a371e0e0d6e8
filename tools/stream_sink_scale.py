"""Streaming-sink scale rehearsal (VERDICT r14 item 8): per-batch
latency of the two warehouse-backed foreachBatch sinks as their
persistent state grows 10x (and 100x for the incremental-dedup
signature warehouse).

The claim under test: each sink's per-batch cost is bounded by the
INCREMENT, not the history — incremental_dedup probes the signature
warehouse through a banded equi-join (only matching band-hash buckets
are read), and line_dedup_sink probes the segment warehouse through
one seg_hash equi-join — so a batch of fixed size should cost ~the
same against a 5k-doc warehouse and a 500k-doc one, modulo the scan
of a bigger (but columnar, filter-pruned) parquet table.

Method: seed each sink's warehouse from a scale fixture's documents
table by running the sink once on the whole seed frame (untimed), then
feed the IDENTICAL synthetic increment batches (deterministic text
variations, doc_ids disjoint from every fixture) and time each
sink(batch_df, batch_id) call — foreachBatch sinks are plain callables,
so no stream machinery pollutes the timing. Reports per-batch seconds
per warehouse size and the big/small ratio per batch position.

Usage: python tools/stream_sink_scale.py [seed_dir1 seed_dir2 ...]
  (default: /root/testdata/sf0.1 /tmp/sf1x10 /tmp/sf1x100)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_BATCHES = int(os.environ.get("SPARK_GRAFT_SINK_BATCHES", "3"))
BATCH_DOCS = int(os.environ.get("SPARK_GRAFT_SINK_BATCH_DOCS", "500"))


def _increment(spark, batch_idx: int):
    """A deterministic 500-doc batch, identical across warehouse scales
    (doc_ids start at 10M — disjoint from every fixture)."""
    from pyspark.sql import functions as F

    base = 10_000_000 + batch_idx * BATCH_DOCS
    return (
        spark.range(base, base + BATCH_DOCS)
        .select(
            F.col("id").cast("long").alias("doc_id"),
            F.concat(
                F.lit(f"increment batch {batch_idx} document "),
                F.col("id") % 977,
                F.lit(" the quick brown fox jumps over the lazy dog segment "),
                F.col("id") % 13,
                F.lit(" tail words vary per doc "),
                F.col("id"),
            ).alias("text"),
            F.lit("stream").alias("source"),
            F.lit("en").alias("lang"),
        )
    )


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/sf1x10",
        "/tmp/sf1x100",
    ]

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators import clear_nparts_memo
    from nyc_taxi_etl_dashboard_spark.session import get_spark
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        incremental_dedup_sink,
        line_dedup_sink,
    )

    spark = get_spark(app_name="stream_sink_scale")
    report: dict = {}
    for d in dirs:
        seed = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text", "source", "lang"
        )
        n_seed = seed.count()
        work = tempfile.mkdtemp(prefix="sink_scale_")
        try:
            entry: dict = {"seed_docs": n_seed}
            # --- incremental MinHash dedup sink ---
            sink, _ = incremental_dedup_sink(os.path.join(work, "sigs"))
            sink(seed, 0)  # seed the warehouse (untimed)
            clear_nparts_memo()
            times = []
            for b in range(1, N_BATCHES + 1):
                inc = _increment(spark, b)
                t0 = time.perf_counter()
                sink(inc, b)
                times.append(round(time.perf_counter() - t0, 2))
            entry["incremental_dedup_per_batch"] = times
            # --- segment line-dedup sink ---
            lsink, _ = line_dedup_sink(
                os.path.join(work, "segs"), os.path.join(work, "out")
            )
            lsink(seed, 0)  # seed (untimed)
            clear_nparts_memo()
            ltimes = []
            for b in range(1, N_BATCHES + 1):
                inc = _increment(spark, b)
                t0 = time.perf_counter()
                lsink(inc, b)
                ltimes.append(round(time.perf_counter() - t0, 2))
            entry["line_dedup_per_batch"] = ltimes
            report[d.rstrip("/")] = entry
            print(d, json.dumps(entry), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        spark.catalog.clearCache()
        clear_nparts_memo()

    labels = list(report)
    lo, hi = labels[0], labels[-1]
    ratios = {
        k: round(
            sum(report[hi][k]) / max(sum(report[lo][k]), 1e-3), 2
        )
        for k in ("incremental_dedup_per_batch", "line_dedup_per_batch")
    }
    print(
        "\nSINKSCALE:",
        json.dumps(
            {
                "results": report,
                "warehouse_growth": round(
                    report[hi]["seed_docs"] / report[lo]["seed_docs"], 1
                ),
                "per_batch_cost_ratio": ratios,
            }
        ),
    )


if __name__ == "__main__":
    main()

"""Interleaved A/B of the pair-verify kernels (HOF sequential fold vs
Arrow einsum) across embedding DIMENSION — round-14 agenda item 3.

The round-11 measurement recorded the einsum kernel SLOWER at dim 64
(pair rows ship both vectors through Arrow; the transfer outweighed the
~130 interpreted evals/pair it saved) and predicted a crossover at high
dim "where the eval/byte ratio flips". A prediction is not a policy:
this harness measures both kernels on the SAME candidate-pair workload
at dim 64 / 512 / 1024 in one session, interleaved (A,B,A,B,...) so box
drift hits both legs equally, and prints one JSON line per (dim,
kernel) with the median and min of 3.

Workload: n_vec hash-random vectors per dim (same xxhash64-LCG recipe
as tools/make_scale100x.py, deterministic), n_pairs candidate pairs
drawn as (i, (i*2654435761+k) % n_vec) — the verify leg's shape exactly:
join both vector sides onto slim id-pairs, score cosine, aggregate a
checksum (sum of cosines) so neither leg can dead-code-eliminate.

Usage: python tools/highdim_ab.py [n_vec] [n_pairs]
       (defaults 20000 vectors, 300000 pairs)
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

DIMS = (64, 512, 1024)
RUNS = 3


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators.similarity import dot, dot_arrow
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="highdim-ab")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for dim in DIMS:
        vecs = (
            spark.range(n_vec)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    f"transform(sequence(0, {dim - 1}), j -> "
                    f"cast((pmod(xxhash64(id * {dim} + j), 600001) - 300000) "
                    "/ 1000000.0 as double))"
                ).alias("v"),
            )
            .persist()
        )
        vecs.count()
        pairs = (
            spark.range(n_pairs)
            .select(
                (F.col("id") % n_vec).alias("id_a"),
                ((F.col("id") * 2654435761 + 17) % n_vec).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .persist()
        )
        pairs.count()
        scored = (
            pairs.join(vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")), "id_a")
            .join(vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        )

        def leg(kernel_fn):
            out = scored.withColumn("c", kernel_fn("va", "vb")).agg(
                F.sum("c").alias("chk")
            )
            t0 = time.monotonic()
            chk = out.first()["chk"]
            return time.monotonic() - t0, chk

        times: dict = {"hof": [], "arrow": []}
        chks: dict = {}
        for _ in range(RUNS):  # interleaved: drift hits both legs equally
            for name, fn in (("hof", dot), ("arrow", dot_arrow)):
                t, chk = leg(fn)
                times[name].append(t)
                chks[name] = chk
        agree = abs(chks["hof"] - chks["arrow"]) <= 1e-6 * max(
            1.0, abs(chks["hof"])
        )
        for name in ("hof", "arrow"):
            row = {
                "dim": dim,
                "kernel": name,
                "n_pairs": n_pairs,
                "median_s": round(statistics.median(times[name]), 3),
                "min_s": round(min(times[name]), 3),
                "checksum_agree": agree,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        vecs.unpersist()
        pairs.unpersist()
        spark.catalog.clearCache()

    by_dim = {
        d: {
            r["kernel"]: r["min_s"]
            for r in results
            if r["dim"] == d
        }
        for d in DIMS
    }
    summary = {
        d: round(by_dim[d]["hof"] / by_dim[d]["arrow"], 2) for d in DIMS
    }
    print(json.dumps({"hof_over_arrow_speedup_by_dim": summary}), flush=True)


if __name__ == "__main__":
    main()

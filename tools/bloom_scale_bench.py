"""A/B the two decontamination probe shapes as the EVAL SET grows —
the axis that motivates t15 (tools for VERDICT-style scale evidence).

t8's shape broadcasts the eval set's distinct n-gram STRINGS and
semi-joins; its broadcast relation grows linearly with the benchmark
suite. t15's shape compresses membership into an m-bit Bloom filter
(m chosen for ~0.1-1% fp) probed map-side; the shipped state is m/8
bytes regardless of member count, and the probe does no hash-table
lookup of strings.

Fixture: synthetic — members are n_eval distinct 3-gram strings
('w{i} w{i+1} w{i+2}'); the probe corpus is n_probe shingles of which
10% are planted members (so both paths do real matching work, and the
bloom path's hit count can be sanity-checked against ~0.1·n_probe plus
the fp floor). Timings are the median of 3 actions per leg.

Usage: python tools/bloom_scale_bench.py [n_probe]  (default 6M)
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


def timed(fn, runs=3):
    outs = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        outs.append(time.monotonic() - t0)
    return round(statistics.median(outs), 3)


def main() -> None:
    n_probe = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators import bloom
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="bloom-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # probe corpus: 10% planted members, 90% strangers. Planted ids wrap
    # into 0..100k — a subset of EVERY eval size below — so exact_hits
    # is genuinely 0.1·n_probe at every round (an earlier draft mapped
    # planted ids across 0..n_probe/10, so smaller eval sets only
    # matched a fraction of the "planted" rows).
    probe = (
        spark.range(n_probe, numPartitions=32)
        .select(
            F.when(
                F.col("id") % 10 == 0,
                F.concat(
                    F.lit("w"),
                    ((F.col("id") / 10).cast("long") % 100_000).cast("string"),
                ),
            )
            .otherwise(F.concat(F.lit("s"), F.col("id").cast("string")))
            .alias("stem"),
        )
        .select(
            F.concat_ws(
                " ", F.col("stem"), F.concat(F.col("stem"), F.lit("b")), F.concat(F.col("stem"), F.lit("c"))
            ).alias("sg")
        )
        .withColumn("H", bloom.shingle_hash("sg"))
        .localCheckpoint()
    )

    results = {}
    for n_eval in (100_000, 1_000_000, 4_000_000):
        members = (
            spark.range(n_eval, numPartitions=32)
            .select(F.concat(F.lit("w"), F.col("id").cast("string")).alias("stem"))
            .select(
                F.concat_ws(
                    " ", F.col("stem"), F.concat(F.col("stem"), F.lit("b")), F.concat(F.col("stem"), F.lit("c"))
                ).alias("sh")
            )
            .localCheckpoint()
        )
        # m sized for ~0.2% fp at this n (load ~25%): m = 16n rounded up
        # to a power of two
        m = 1 << max(18, (16 * n_eval - 1).bit_length())
        built = {}

        def build_once():
            built["words"] = bloom.bloom_build_agg(members, "sh", m=m)

        t_build = timed(build_once, runs=1)
        words = built["words"]

        def bloom_leg():
            return (
                bloom.bloom_member_arrow(probe, "H", words, m=m)
                .filter("bloom_hit")
                .count()
            )

        def join_leg():
            return probe.join(
                F.broadcast(members), probe.sg == members.sh
            ).count()

        n_bloom = bloom_leg()
        n_exact = join_leg()
        results[f"eval_{n_eval}"] = {
            "m_bits": m,
            "bitset_mb": round(m / 8 / 2**20, 1),
            "bloom_build_s": t_build,
            "bloom_probe_s": timed(bloom_leg),
            "broadcast_join_s": timed(join_leg),
            "exact_hits": n_exact,
            "bloom_hits": n_bloom,
            "fp_rate": round((n_bloom - n_exact) / max(1, n_probe - n_exact), 6),
        }
        print(json.dumps({f"eval_{n_eval}": results[f"eval_{n_eval}"]}), flush=True)

    print(json.dumps({"n_probe": n_probe, "results": results}))


if __name__ == "__main__":
    main()

"""v10_prod-style semantic dedup END-TO-END at production embedding
dimension (512-d) — round-15 agenda item 1 (the round-14 A/B settled
the pair-verify kernel; this measures where the whole pipeline's cost
sits at high dim, and that the dim-probe fix actually carries the
512-d path: before it, the GEMM signature kernel crashed on shape
mismatch and the HOF fold silently signed only the first 64
components).

Fixture (deterministic, synthetic, /tmp): n_src source vectors at dim
512 from the xxhash64-LCG recipe, one planted near-dup per source
(±1 % multiplicative perturbation, cosine ≈ 0.9999), and (replicas−2)
hash-random distractors per source — the write_embeddings_100x recipe
at dim 512.

Legs, interleaved in one session: signature kernel hof vs arrow
(bits pinned equal; throughput is the question at 512-d), each leg =
full embedding_dedup_pairs at threshold 0.92, n_planes='auto',
measuring wall time and planted-pair recall.

Usage: python tools/semantic_highdim_run.py [n_src] [replicas]
       (defaults 5000 sources × 10 replicas = 50k vectors)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DIM = 512
RUNS = 2


def main() -> None:
    n_src = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.operators.similarity import (
        embedding_dedup_pairs,
    )
    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="semantic-highdim")
    spark.sparkContext.setLogLevel("ERROR")

    src = spark.range(n_src).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), j -> "
            f"cast((pmod(xxhash64(id * {DIM} + j), 600001) - 300000) "
            "/ 1000000.0 as double))"
        ).alias("embedding"),
    )
    reps = spark.range(replicas).toDF("__rep")
    # sequential withColumns (the write_embeddings_100x shape) so the
    # distractor expression sees the OFFSET vec_id — a single select
    # binds the pre-alias vec_id and silently makes replicas 2+ of one
    # source identical copies (caught by the pair count on first run)
    big = (
        src.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * n_src)
        .withColumn(
            "embedding",
            F.when(F.col("__rep") == 0, F.col("embedding"))
            .when(
                F.col("__rep") == 1,
                F.expr(
                    "transform(embedding, (x, j) -> x * (1.0 + "
                    "(pmod(xxhash64(vec_id, j), 100) - 50) / 5000.0))"
                ),
            )
            .otherwise(
                F.expr(
                    f"transform(sequence(0, {DIM - 1}), j -> "
                    f"cast((pmod(xxhash64(vec_id * {DIM} + j + 7), 600001) - 300000) "
                    "/ 1000000.0 as double))"
                )
            ),
        )
        .select("vec_id", "embedding")
    )
    path = f"/tmp/highdim512_{n_src}x{replicas}"
    if not os.path.exists(path):
        big.repartition(32).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    n_vec = df.count()
    print(json.dumps({"fixture": path, "n_vec": n_vec, "dim": DIM}), flush=True)

    def leg(signature_kernel: str):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        pairs = embedding_dedup_pairs(
            df,
            threshold=0.92,
            n_planes="auto",
            signature_kernel=signature_kernel,
        )
        planted = pairs.filter(
            (F.col("id_b") - F.col("id_a")) == n_src
        ).filter(F.col("id_a") < n_src)
        n_pairs, n_planted = (
            pairs.count(),
            planted.count(),
        )
        return time.monotonic() - t0, n_pairs, n_planted

    out = {}
    for _ in range(RUNS):  # interleaved
        for k in ("hof", "arrow"):
            t, n_pairs, n_planted = leg(k)
            out.setdefault(k, []).append(
                {"wall_s": round(t, 2), "pairs": n_pairs, "planted_recall": round(n_planted / n_src, 4)}
            )
            print(json.dumps({"kernel": k, **out[k][-1]}), flush=True)
    best = {k: min(r["wall_s"] for r in v) for k, v in out.items()}
    print(json.dumps({"min_wall_by_kernel": best}), flush=True)


if __name__ == "__main__":
    main()

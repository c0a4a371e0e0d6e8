"""Synthesize a 100× dataset from sf0.1 — the round-8 scale push
(VERDICT r7 item 3: "plans you'd want at 100×" was argued at 10× twice
and never measured beyond it).

Same replica-offset recipe as tools/make_scale10x.py (facts grow with
key offsets so uniqueness and join lockstep survive; dimensions stay
fixed), at 100 replicas and restricted to the tables the 100× suite
reads — lineitem/orders (60 M / 15 M rows: the row-stream parity ops),
events (10 M: sessionize + as-of), documents (500 k: the dd11
increment-mode corpus), and since round 10 embeddings (200 k vectors:
the semantic-suite warehouse — VERDICT r8 item 3). Dims copy at 1×.

Embeddings do NOT replicate verbatim: 100 identical copies of every
vector would make each RHP bucket a clique of true dups and every
semantic query output-bound on the 100·99/2 pairs per source vector —
measuring pair-emission, not the machinery. Instead replica 1 is a
±1 % multiplicative perturbation of the source (cos ≈ 0.9999 — a
planted true near-dup per source vector, so the verify leg has real
work), and replicas 2..99 are hash-derived pseudo-random vectors in
[-0.3, 0.3]^64 (matching the source scale, spreading buckets the way
a real corpus does). All arithmetic is deterministic SQL (xxhash64
LCG), so the fixture is reproducible bit-for-bit.

Output layout is repartition(64) multi-row-group parquet (~2 GB total)
so scans parallelize; 64 not 32 because the 60 M-row lineitem otherwise
yields ~1 M-row single-task partitions at the default split size.

Usage: python tools/make_scale100x.py [out_dir]  (default /tmp/sf1x100)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = 100
SRC = "/root/testdata/sf0.1"

OFFSET_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]


def write_embeddings_100x(spark, out_dir: str) -> None:
    """200 k-vector semantic warehouse: vec_id offset like doc_ids;
    replica 1 = planted near-dup (±1 % multiplicative noise), replicas
    2+ = hash-random vectors at source scale (see module docstring)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SRC}/embeddings.parquet")
    stride = df.agg(F.max("vec_id")).first()[0] + 1
    reps = spark.range(REPLICAS).toDF("__rep")
    big = (
        df.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(stride))
        .withColumn(
            "embedding",
            F.when(F.col("__rep") == 0, F.col("embedding"))
            .when(
                F.col("__rep") == 1,
                F.expr(
                    "transform(embedding, (x, j) -> cast(x * (1.0 + "
                    "(pmod(xxhash64(vec_id, j), 100) - 50) / 5000.0) as float))"
                ),
            )
            .otherwise(
                F.expr(
                    "transform(sequence(0, size(embedding) - 1), j -> "
                    "cast((pmod(xxhash64(vec_id * 64 + j), 600001) - 300000) "
                    "/ 1000000.0 as float))"
                )
            ),
        )
        .drop("__rep")
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    print(
        "embeddings",
        spark.read.parquet(f"{out_dir}/embeddings.parquet").count(),
        flush=True,
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="make-scale100x")
    os.makedirs(out_dir, exist_ok=True)
    write_embeddings_100x(spark, out_dir)
    for table, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        strides = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        reps = spark.range(REPLICAS).toDF("__rep")
        big = df.crossJoin(reps)
        for k, stride in strides.items():
            big = big.withColumn(k, F.col(k) + F.col("__rep") * F.lit(stride))
        big = big.drop("__rep")
        big.repartition(64).write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(table, spark.read.parquet(f"{out_dir}/{table}.parquet").count(), flush=True)
    for table in COPY_TABLES:
        spark.read.parquet(f"{SRC}/{table}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        print(table, "copied", flush=True)


if __name__ == "__main__":
    main()

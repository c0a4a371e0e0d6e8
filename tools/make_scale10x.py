"""Synthesize an sf1-equivalent dataset by replicating sf0.1 10x with
key offsets — the round-3 scale rehearsal (VERDICT r02 item 8).

Scale model: the FACT tables (lineitem, orders, events, documents,
embeddings) grow 10x with replica-offset primary keys so uniqueness and
join relationships survive; the DIMENSIONS (region, nation, customer,
supplier, part) stay fixed — the realistic shape of a 10x scale-up
(more transactions, same reference data). Notes per table:

- lineitem/orders: l_orderkey/o_orderkey offset in lockstep, so every
  fact row still resolves to exactly one order and the order:line
  ratio is preserved. cust/part/supp keys untouched (dims fixed).
- events: event_id and user_id both offset — 10x users at the same
  per-user activity skew, so sessionization/funnel state grows in
  KEYS (the scale axis that matters for streaming state), not in
  per-key depth.
- documents/embeddings: doc_id/vec_id offset, CONTENT unchanged —
  every document gains 9 exact cross-replica duplicates, turning the
  dedup suite into a deliberate stress test (clusters of 10; shingle
  document-frequency 10x, which exercises the dd2 df-cap's hot-shingle
  path at scale).

Output is written through repartition(32) so the layout is
multi-row-group (the bronze shape) rather than the fixtures'
single-row-group files — the rehearsal measures operator scaling, not
the known single-file scan bottleneck.

Usage: python tools/make_scale10x.py [out_dir]  (default /tmp/sf1x10)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = 10
SRC = "/root/testdata/sf0.1"

#: table -> columns that must stay unique / in join-lockstep across
#: replicas (each gets +replica * (max+1))
OFFSET_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x10"
    from pyspark.sql import functions as F

    from nyc_taxi_etl_dashboard_spark.session import get_spark

    spark = get_spark(app_name="make-scale10x")
    os.makedirs(out_dir, exist_ok=True)
    for table, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        strides = {
            k: df.agg(F.max(k)).first()[0] + 1 for k in keys
        }
        reps = spark.range(REPLICAS).toDF("__rep")
        big = df.crossJoin(reps)
        for k, stride in strides.items():
            big = big.withColumn(k, F.col(k) + F.col("__rep") * F.lit(stride))
        big = big.drop("__rep")
        big.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(table, spark.read.parquet(f"{out_dir}/{table}.parquet").count())
    for table in COPY_TABLES:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(table, "copied")


if __name__ == "__main__":
    main()

"""The reference's three-stage ETL as engine entry points, on the NATIVE
NYC taxi schema (``reference:Scripts_ETL/{extract,transform,load}.py``).

A user of the reference runs three scripts communicating via parquet
files and a Postgres DSN; here the same stages are functions (and a CLI:
``python -m nyc_taxi_etl_dashboard_spark.etl <stage> ...``) that accept
any Spark-readable path. Unlike the reference, stages can also be FUSED
(``run_pipeline``) into one lazy plan — no intermediate materialization,
Catalyst optimizes across stage boundaries; per-stage file hops remain
available for drop-in parity.

Stage contracts mirror the reference exactly:
- extract  (``extract.py:21-76``): 11-column projection, coercive
  timestamp parse, null-drop on timestamps, int null-fill + narrowing.
- transform (``transform.py:146-184``): trip metrics, 5-rule
  priority-ordered anomaly split, time features, label decodes, dedup
  on the timestamp pair, JSON run report, timestamped anomaly
  side-output.
- load     (``load.py:71-228``): star schema — dims deduped + upserted,
  fact resolved via broadcast inner joins, NUMERIC(8,2) casts; sink is
  Spark-managed tables or JDBC (Postgres parity mode).
"""

from __future__ import annotations

import argparse
import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: S13 log-sink parity: the reference logs row counts and the anomaly
#: breakdown per run (transform.py:10-14,27,70-71 -> transform.log);
#: counts here come from the same Spark actions the report performs, so
#: logging adds no extra jobs
logger = logging.getLogger("nyc_taxi_etl_dashboard_spark.etl")

from .operators.classify import anomaly_breakdown, split_valid_anomalies, taxi_rules
from .operators.cleanse import (
    FACT_TRIPS_CHECKS,
    cleanse,
    require_nonempty,
    validate_domain,
)
from .operators.dedup import exact_dedup
from .operators.features import add_time_features, add_trip_metrics, encode_labels
from .operators.star import build_dim, resolve_fact, union_distinct_dim
from .sources import write_json_report, write_parquet, write_parquet_timestamped

#: the reference's explicit projection (extract.py:7-19)
SELECTED_COLUMNS = [
    "VendorID",
    "tpep_pickup_datetime",
    "tpep_dropoff_datetime",
    "passenger_count",
    "trip_distance",
    "PULocationID",
    "DOLocationID",
    "RatecodeID",
    "payment_type",
    "fare_amount",
    "total_amount",
]
TIMESTAMP_COLUMNS = ["tpep_pickup_datetime", "tpep_dropoff_datetime"]
INT_FILL_COLUMNS = ["VendorID", "passenger_count", "PULocationID", "DOLocationID"]


def extract(spark: SparkSession, input_path: str) -> DataFrame:
    """Extract stage as one lazy chain (extract.py:21-76)."""
    raw = spark.read.parquet(input_path)
    return require_nonempty(
        cleanse(raw, SELECTED_COLUMNS, TIMESTAMP_COLUMNS, INT_FILL_COLUMNS)
    )


def transform(df: DataFrame) -> tuple[DataFrame, DataFrame, dict]:
    """Transform stage (transform.py:146-184): returns (valid,
    anomalies, report). One classification pass over a persisted frame
    feeds both branches and the report aggregates (SURVEY §3.2)."""
    with_metrics = add_trip_metrics(df)
    valid, anomalies = split_valid_anomalies(with_metrics, taxi_rules())
    valid = add_time_features(valid)
    valid = encode_labels(valid)
    valid = exact_dedup(valid, TIMESTAMP_COLUMNS)
    stats = valid.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("trip_duration").alias("avg_dur"),
        F.avg("avg_speed").alias("avg_spd"),
        F.sum("fare_amount").alias("fare_sum"),
    ).collect()[0]
    n_anom = anomalies.count()
    total = stats["n"] + n_anom
    report = {
        "total_processed": total,
        "valid_count": stats["n"],
        "anomaly_count": n_anom,
        "anomaly_rate": f"{(100.0 * n_anom / total if total else 0.0):.2f}%",
        "avg_trip_duration_min": stats["avg_dur"],
        "avg_speed_mph": stats["avg_spd"],
        "total_fare": stats["fare_sum"],
        "anomaly_breakdown": {
            r["rejection_reason"]: r["n"] for r in anomaly_breakdown(anomalies).collect()
        },
    }
    logger.info(
        "transform: %d rows processed, %d anomalies (%s)",
        total,
        n_anom,
        report["anomaly_rate"],
    )
    for reason, n in report["anomaly_breakdown"].items():
        logger.info("transform: - %s: %d", reason, n)
    return valid, anomalies, report


def load(valid: DataFrame, warehouse_path: str) -> dict[str, int]:
    """Load stage (load.py:71-228): star schema to parquet-managed
    tables under ``warehouse_path``. Dims get hash surrogate keys; the
    fact resolves them via broadcast inner joins (row-loss semantics on
    NULL labels preserved); measures narrow to NUMERIC(8,2) like the
    warehouse DDL (load.py:52-57).

    Two warehouse-boundary guarantees from the reference's DDL:
    - CHECK parity (load.py:52-57): rows violating a fact CHECK domain
      are quarantined to ``fact_trips_rejects`` (with the violated
      constraint named), never loaded — Parquet can't enforce CHECK, so
      it's a write-time validation filter (S11).
    - Index parity (load.py:62-67): the fact is partitioned by pickup
      date, so date-sliced dashboard queries prune partitions — the
      Parquet equivalent of the reference's btree index on time_pk.
    """
    dim_time = build_dim(
        valid.select(
            F.col("tpep_pickup_datetime").alias("datetime"),
            F.col("pickup_hour").alias("hour"),
            "day_of_week",
            "time_period",
        ),
        ["datetime"],
        "time_pk",
        attr_cols=["hour", "day_of_week", "time_period"],
    )
    # borough: declared NOT NULL DEFAULT 'Inconnu' in the reference DDL
    # (load.py:33) and never back-filled — parity is the constant default
    dim_location = union_distinct_dim(
        valid, ["PULocationID", "DOLocationID"], "location_id", "location_pk"
    ).withColumn("borough", F.lit("Inconnu"))
    dim_payment = build_dim(
        valid.select(F.col("payment_label").alias("payment_type")),
        ["payment_type"],
        "payment_pk",
    )
    fact = resolve_fact(
        valid,
        [
            (dim_time, F.col("tpep_pickup_datetime") == F.col("t.datetime"), "t"),
            (dim_location, F.col("PULocationID") == F.col("pu.location_id"), "pu"),
            (dim_location, F.col("DOLocationID") == F.col("do.location_id"), "do"),
            (dim_payment, F.col("payment_label") == F.col("p.payment_type"), "p"),
        ],
        [
            F.col("t.time_pk").alias("time_pk"),
            F.col("pu.location_pk").alias("pickup_loc_pk"),
            F.col("do.location_pk").alias("dropoff_loc_pk"),
            F.col("p.payment_pk").alias("payment_pk"),
            F.col("passenger_count").cast("smallint").alias("passenger_count"),
            F.col("trip_distance").cast("decimal(8,2)").alias("trip_distance"),
            F.col("fare_amount").cast("decimal(8,2)").alias("fare_amount"),
            F.col("total_amount").cast("decimal(8,2)").alias("total_amount"),
            F.col("trip_duration").cast("decimal(8,2)").alias("duration_min"),
            F.col("avg_speed").cast("decimal(8,2)").alias("avg_speed"),
            F.to_date(F.col("t.datetime")).alias("pickup_date"),
        ],
    )
    fact_ok, fact_rejects = validate_domain(fact, FACT_TRIPS_CHECKS)
    counts: dict[str, int] = {}
    for name, df, part in [
        ("dim_time", dim_time, None),
        ("dim_location", dim_location, None),
        ("dim_payment", dim_payment, None),
        ("fact_trips", fact_ok, ["pickup_date"]),
        ("fact_trips_rejects", fact_rejects, None),
    ]:
        write_parquet(df, f"{warehouse_path}/{name}", partition_by=part)
        counts[name] = df.count()
    return counts


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    warehouse_path: str | None = None,
) -> dict:
    """All three stages fused into one Spark application: parquet in →
    cleaned/valid parquet + anomaly side-output + JSON report (+ star
    schema if ``warehouse_path``). The only materialization points are
    the sinks themselves."""
    valid, anomalies, report = transform(extract(spark, input_path))
    # pickup-date partitioning = the reference's btree-index parity for
    # the valid output too: one-day slicers read one directory
    write_parquet(
        valid.withColumn("pickup_date", F.to_date("tpep_pickup_datetime")),
        f"{output_path}/valid",
        partition_by=["pickup_date"],
    )
    anomaly_path = write_parquet_timestamped(anomalies, output_path, "anomalies")
    write_json_report(report, f"{output_path}/transformation_report.json")
    report["anomaly_output"] = anomaly_path
    if warehouse_path:
        report["warehouse_counts"] = load(valid, warehouse_path)
    return report


def main() -> None:  # pragma: no cover - thin CLI
    from .session import get_spark

    parser = argparse.ArgumentParser(description="Taxi ETL pipeline (Spark)")
    parser.add_argument("stage", choices=["extract", "pipeline"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--warehouse")
    args = parser.parse_args()
    spark = get_spark(app_name=f"taxi-etl-{args.stage}")
    if args.stage == "extract":
        write_parquet(extract(spark, args.input), args.output)
    else:
        print(run_pipeline(spark, args.input, args.output, args.warehouse))


if __name__ == "__main__":  # pragma: no cover
    main()

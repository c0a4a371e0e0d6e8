"""End-to-end taxi ETL pipeline test on the native schema (SURVEY §5.2
layer 2): run extract → transform → load over a crafted taxi parquet and
assert the reference's invariants — split conservation, per-reason
counts, report contents, star-schema key integrity."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row


@pytest.fixture(scope="module")
def taxi_input(spark, tmp_path_factory):
    base = dt.datetime(2024, 3, 15, 8, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            Row(
                VendorID=1 + i % 2,
                tpep_pickup_datetime=base + dt.timedelta(hours=i % 24, minutes=i),
                tpep_dropoff_datetime=base
                + dt.timedelta(hours=i % 24, minutes=i + 5 + (i % 20)),
                passenger_count=(i % 5),  # 0 => anomaly rows
                trip_distance=0.5 + (i % 40) * 0.5,
                PULocationID=i % 10,
                DOLocationID=(i + 3) % 10,
                RatecodeID=1 + i % 7,  # 7 => unmapped => NULL label
                payment_type=1 + i % 5,  # 5 => unmapped => NULL label
                fare_amount=float(i % 30) - 2.0,  # some <= 0
                total_amount=float(i % 30) * 1.2,
                extra_col="dropped by projection",
            )
        )
    df = spark.createDataFrame(rows)
    path = str(tmp_path_factory.mktemp("taxi") / "trips.parquet")
    df.write.parquet(path)
    return path


def test_extract_projects_and_narrows(spark, taxi_input):
    from nyc_taxi_etl_dashboard_spark.etl import SELECTED_COLUMNS, extract

    out = extract(spark, taxi_input)
    assert out.columns == SELECTED_COLUMNS
    dtypes = dict(out.dtypes)
    assert dtypes["passenger_count"] == "smallint"
    assert out.count() == 200


def test_transform_invariants(spark, taxi_input):
    from nyc_taxi_etl_dashboard_spark.etl import extract, transform

    valid, anomalies, report = transform(extract(spark, taxi_input))
    assert report["valid_count"] + report["anomaly_count"] == report["total_processed"]
    assert report["total_processed"] == 200
    reasons = set(report["anomaly_breakdown"])
    assert reasons <= {
        "Durée invalide",
        "Distance hors limites",
        "Montant de course invalide",
        "Passagers invalides",
        "Vitesse irréaliste",
    }
    # crafted data: passenger_count==0 rows exist and fare<=0 rows exist
    assert report["anomaly_count"] > 0
    assert "payment_label" in valid.columns and "time_period" in valid.columns


def test_full_pipeline_and_star_load(spark, taxi_input, tmp_path):
    from nyc_taxi_etl_dashboard_spark.etl import run_pipeline

    out = str(tmp_path / "out")
    wh = str(tmp_path / "wh")
    report = run_pipeline(spark, taxi_input, out, warehouse_path=wh)
    # sinks exist and reconcile
    valid = spark.read.parquet(f"{out}/valid")
    anoms = spark.read.parquet(report["anomaly_output"])
    assert valid.count() == report["valid_count"]
    assert anoms.count() == report["anomaly_count"]
    disk_report = json.load(open(f"{out}/transformation_report.json"))
    assert disk_report["total_processed"] == 200
    # star schema: every fact FK resolves, row loss only from NULL labels
    fact = spark.read.parquet(f"{wh}/fact_trips")
    dim_p = spark.read.parquet(f"{wh}/dim_payment")
    assert report["warehouse_counts"]["fact_trips"] == fact.count()
    n_null_label = valid.filter(valid.payment_label.isNull()).count()
    assert fact.count() == valid.count() - n_null_label
    # FK integrity
    assert (
        fact.join(dim_p, "payment_pk", "left_anti").count() == 0
    ), "dangling payment_pk"
    assert dict(fact.dtypes)["fare_amount"] == "decimal(8,2)"

"""Reference-semantics parity on the NATIVE taxi schema (SURVEY §5.3
traps): the synthetic-table queries exercise the operators; this suite
pins the exact reference behaviors on crafted taxi-shaped rows —
priority ordering, between-boundary inclusivity, div-by-zero handling,
decode null-on-miss, dedup determinism.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _trips(spark, rows):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    data = []
    for i, r in enumerate(rows):
        data.append(
            Row(
                VendorID=1,
                tpep_pickup_datetime=base,
                tpep_dropoff_datetime=base + dt.timedelta(minutes=r.get("dur", 10)),
                passenger_count=r.get("pax", 1),
                trip_distance=r.get("dist", 2.0),
                PULocationID=i,
                DOLocationID=i,
                RatecodeID=r.get("rate", 1),
                payment_type=r.get("pay", 1),
                fare_amount=r.get("fare", 10.0),
                total_amount=r.get("fare", 10.0) * 1.2,
            )
        )
    return spark.createDataFrame(data)


def _classify(spark, rows):
    from nyc_taxi_etl_dashboard_spark.operators.classify import classify, taxi_rules
    from nyc_taxi_etl_dashboard_spark.operators.features import add_trip_metrics

    df = add_trip_metrics(_trips(spark, rows))
    return classify(df, taxi_rules()).select("PULocationID", "rejection_reason").collect()


def test_priority_first_match(spark):
    """A row violating several rules gets the FIRST reason in priority
    order (transform.py:56-61): Durée > Distance > Montant > Passagers >
    Vitesse."""
    out = _classify(
        spark,
        [
            # dur<=0 AND fare<=0 AND pax<=0 => Durée wins
            {"dur": 0, "fare": -1.0, "pax": 0},
            # distance out AND pax<=0 => Distance wins
            {"dist": 0.05, "pax": 0},
            # fare<=0 AND pax<=0 => Montant wins
            {"fare": 0.0, "pax": 0},
        ],
    )
    reasons = [r.rejection_reason for r in sorted(out, key=lambda r: r.PULocationID)]
    assert reasons == [
        "Durée invalide",
        "Distance hors limites",
        "Montant de course invalide",
    ]


def test_between_boundaries_inclusive(spark):
    """between() is inclusive at both ends in pandas AND Spark
    (transform.py:49,52): distance exactly 0.1 or 100 is VALID."""
    # durations chosen so avg_speed stays within [1, 100] and only the
    # distance rule can fire
    out = _classify(
        spark,
        [
            {"dist": 0.1, "dur": 3},
            {"dist": 100.0, "dur": 120},
            {"dist": 100.01, "dur": 120},
        ],
    )
    reasons = [r.rejection_reason for r in sorted(out, key=lambda r: r.PULocationID)]
    assert reasons == [None, None, "Distance hors limites"]


def test_zero_duration_division_parity(spark):
    """pandas: dist/0 -> inf -> fails speed between -> rejected; Spark:
    dist/0 -> NULL (non-ANSI) -> coalesce treats as out-of-range. Either
    way the row must be rejected, and with dur=0 the DURATION rule wins
    (first match)."""
    out = _classify(spark, [{"dur": 0}])
    assert out[0].rejection_reason == "Durée invalide"


def test_speed_null_rejected_when_duration_positive(spark):
    """Speed NULL/out-of-range with positive duration => 'Vitesse
    irréaliste' (the NULL-propagation parity trap, SURVEY §5.3)."""
    # 0.2 distance over 12h => speed ~0.0167 mph, below 1 => rejected
    out = _classify(spark, [{"dur": 720, "dist": 0.2}])
    assert out[0].rejection_reason == "Vitesse irréaliste"


def test_decode_null_on_miss(spark):
    """payment_type 5/6 and RatecodeID 99 decode to NULL labels, exactly
    like pandas .map() (transform.py:93-109)."""
    from nyc_taxi_etl_dashboard_spark.operators.features import encode_labels

    df = encode_labels(_trips(spark, [{"pay": 5, "rate": 99}, {"pay": 1, "rate": 2}]))
    rows = sorted(df.select("payment_label", "ratecode_label").collect(), key=lambda r: (r.payment_label is None))
    assert rows[0].payment_label == "Carte de crédit" and rows[0].ratecode_label == "JFK"
    assert rows[1].payment_label is None and rows[1].ratecode_label is None


def test_speed_rounding_2dp(spark):
    """avg_speed is rounded to 2dp like transform.py:40."""
    from nyc_taxi_etl_dashboard_spark.operators.features import add_trip_metrics

    df = add_trip_metrics(_trips(spark, [{"dur": 7, "dist": 1.0}]))
    # 1.0 mile / (7/60 h) = 8.571428... -> 8.57
    assert df.select("avg_speed").collect()[0][0] == pytest.approx(8.57)


def test_time_features_and_buckets(spark):
    from nyc_taxi_etl_dashboard_spark.operators.features import add_time_features

    df = add_time_features(_trips(spark, [{}]))
    row = df.select("pickup_hour", "day_of_week", "time_period").collect()[0]
    # 2024-01-01 10:00 is a Monday morning
    assert (row.pickup_hour, row.day_of_week, row.time_period) == (10, "Monday", "Matin")


def test_cleanse_coercion_and_nulldrop(spark):
    """F1/P2/P3: unparseable timestamps coerce to NULL then drop;
    integer nulls fill to 0 and narrow to smallint (extract.py:42-52)."""
    from nyc_taxi_etl_dashboard_spark.operators.cleanse import cleanse

    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", "2024-01-01 10:30:00", 2),
            ("not a timestamp", "2024-01-01 11:00:00", None),
            (None, "2024-01-01 12:00:00", 3),
        ],
        ["pickup", "dropoff", "pax"],
    )
    out = cleanse(df, ["pickup", "dropoff", "pax"], ["pickup", "dropoff"], ["pax"])
    rows = out.collect()
    assert len(rows) == 1  # rows 2 and 3 dropped via coerce+dropna
    assert rows[0].pax == 2
    assert dict(out.dtypes)["pax"] == "smallint"
    assert dict(out.dtypes)["pickup"] == "timestamp"


def test_split_conservation_and_dedup(spark):
    from nyc_taxi_etl_dashboard_spark.operators.classify import split_valid_anomalies, taxi_rules
    from nyc_taxi_etl_dashboard_spark.operators.dedup import exact_dedup
    from nyc_taxi_etl_dashboard_spark.operators.features import add_trip_metrics

    df = add_trip_metrics(
        _trips(spark, [{}, {"pax": 0}, {"fare": -5.0}, {}, {"dist": 500.0}])
    )
    valid, anom = split_valid_anomalies(df, taxi_rules())
    assert valid.count() + anom.count() == 5
    assert "rejection_reason" not in valid.columns
    # D1: dedup on the timestamp pair (all rows share one) leaves 1 row
    assert exact_dedup(df, ["tpep_pickup_datetime", "tpep_dropoff_datetime"]).count() == 1

"""Derived metrics, time features, categorical encodings
(SURVEY §2.9 F3-F9; ``transform.py:33-42,75-111``).

All pure column expressions — one codegen stage, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    PAYMENT_LABELS,
    RATECODE_LABELS,
    day_name,
    decode_map,
    minutes_between,
    time_period,
)


def add_trip_metrics(
    df: DataFrame,
    pickup: str = "tpep_pickup_datetime",
    dropoff: str = "tpep_dropoff_datetime",
    distance: str = "trip_distance",
    duration_col: str = "trip_duration",
    speed_col: str = "avg_speed",
) -> DataFrame:
    """F3/F4: trip duration (minutes) and average speed, rounded 2dp
    (``transform.py:35-40``). Spark yields NULL on division by zero where
    pandas yields inf — both are rejected by the speed rule, see
    ``classify.taxi_rules``."""
    df = df.withColumn(duration_col, minutes_between(dropoff, pickup))
    return df.withColumn(
        speed_col,
        F.round(F.col(distance) / (F.col(duration_col) / F.lit(60.0)), 2),
    )


def add_time_features(
    df: DataFrame,
    ts: str = "tpep_pickup_datetime",
    hour_col: str = "pickup_hour",
    dow_col: str = "day_of_week",
    period_col: str = "time_period",
) -> DataFrame:
    """F5-F7: hour, English day name, 4-bucket day segment
    (``transform.py:77-88``)."""
    df = df.withColumn(hour_col, F.hour(ts))
    df = df.withColumn(dow_col, day_name(ts))
    return df.withColumn(period_col, time_period(hour_col))


def encode_labels(
    df: DataFrame,
    payment: str = "payment_type",
    ratecode: str = "RatecodeID",
    payment_col: str = "payment_label",
    ratecode_col: str = "ratecode_label",
) -> DataFrame:
    """F8/F9: dict decodes with null-on-miss (``transform.py:91-111``).
    Unmapped payment codes (5 Unknown / 6 Voided) become NULL labels —
    required for the inner-join row-loss parity at load (SURVEY §2.3)."""
    df = df.withColumn(payment_col, decode_map(payment, PAYMENT_LABELS))
    return df.withColumn(ratecode_col, decode_map(ratecode, RATECODE_LABELS))

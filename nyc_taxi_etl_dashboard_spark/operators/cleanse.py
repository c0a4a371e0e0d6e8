"""Extract-stage cleansing (SURVEY §2.2 P1-P4, §2.9 F1/F2/F10).

The reference's extract stage (``extract.py:21-76``) is: project 11
columns, coerce timestamps with null-on-error, drop rows with null
timestamps, fill integer nulls with 0, narrow integer types, guard
against an empty result. Here it is one lazy chain — Catalyst pushes the
projection into the Parquet scan (ColumnPruning) and the not-null
predicates into the scan's PushedFilters, so at 100 TB the scan reads
only the projected columns' pages and skips row groups whose stats prove
all-null keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import coerce_timestamp


def project(df: DataFrame, cols: list[str]) -> DataFrame:
    """P1: explicit column projection (``extract.py:7-19,39``)."""
    return df.select(*cols)


def coerce_timestamps(df: DataFrame, cols: list[str]) -> DataFrame:
    """F1/F2: parse-with-coercion on each timestamp column
    (``extract.py:42-44``). Session timezone is pinned UTC so the result
    behaves tz-naive, matching ``dt.tz_localize(None)``."""
    for c in cols:
        df = df.withColumn(c, coerce_timestamp(c))
    return df


def drop_null_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """P2: ``dropna(subset=...)`` (``extract.py:47``)."""
    return df.na.drop(subset=cols)


def fill_int_nulls(df: DataFrame, cols: list[str], value: int = 0, cast_to: str = "smallint") -> DataFrame:
    """P3 + F10: ``fillna(0).astype('int16')`` (``extract.py:51-52``)."""
    df = df.na.fill(value, subset=cols)
    for c in cols:
        df = df.withColumn(c, F.col(c).cast(cast_to))
    return df


def require_nonempty(df: DataFrame) -> DataFrame:
    """P4: empty-relation guard (``extract.py:56-57``).

    Driver-side action by design — call it only at pipeline boundaries;
    ``isEmpty`` runs a LIMIT-1 job, not a full count.
    """
    if df.isEmpty():
        raise ValueError("extract produced an empty relation")
    return df


def cleanse(
    df: DataFrame,
    keep_cols: list[str],
    timestamp_cols: list[str],
    int_fill_cols: list[str],
) -> DataFrame:
    """The extract stage as one composable lazy plan (``extract.py:21-76``)."""
    out = project(df, keep_cols)
    out = coerce_timestamps(out, timestamp_cols)
    out = drop_null_rows(out, timestamp_cols)
    out = fill_int_nulls(out, int_fill_cols)
    return out


#: S11 CHECK-constraint parity (reference ``load.py:23,52-57``): the
#: warehouse DDL enforces these domains with Postgres CHECK constraints;
#: Spark tables don't enforce CHECK, so they become write-time validation
#: filters. Keys are the constraint names, values build the predicate
#: over the fact frame's column names.
FACT_TRIPS_CHECKS: dict[str, str] = {
    "passenger_count_positive": "passenger_count > 0",
    "trip_distance_positive": "trip_distance > 0",
    "fare_amount_positive": "fare_amount > 0",
    "total_amount_positive": "total_amount > 0",
    "duration_min_positive": "duration_min > 0",
    "avg_speed_positive": "avg_speed > 0",
}

DIM_TIME_CHECKS: dict[str, str] = {
    "hour_in_domain": "hour BETWEEN 0 AND 23",
}


def validate_domain(
    df: DataFrame, checks: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """S11: CHECK constraints as write-time validation filters.

    Returns ``(ok, rejects)``: ``ok`` satisfies every check; ``rejects``
    carries a ``violated_check`` column naming the first failed
    constraint (declaration order — same first-match discipline as the
    anomaly classifier). NULLs fail a CHECK's sibling NOT NULL intent,
    so a NULL predicate result counts as a violation, matching the
    warehouse's refusal to load the row.

    Scale shape: both branches are narrow filters over one scan — no
    shuffle, no action; callers write each branch (partition-column
    branching as in ``plans.pipeline.dual_sink_write`` is the
    single-write alternative when both land in the same sink).
    """
    passed = F.lit(True)
    for expr in checks.values():
        passed = passed & F.coalesce(F.expr(expr), F.lit(False))
    first_violation = F.lit(None).cast("string")
    for name, expr in reversed(list(checks.items())):
        first_violation = F.when(
            ~F.coalesce(F.expr(expr), F.lit(False)), F.lit(name)
        ).otherwise(first_violation)
    ok = df.filter(passed)
    rejects = df.filter(~passed).withColumn("violated_check", first_violation)
    return ok, rejects

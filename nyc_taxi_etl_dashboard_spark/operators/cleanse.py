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

"""Temporal join operators Spark lacks as primitives (brief §custom
operators): as-of join and event-to-interval range join, composed from
stock DataFrame ops — no UDFs, no mapPartitions.

As-of join strategy (the union trick — same idea Flink/kdb use for
distributed as-of):
  1. tag both sides, union on the (by, time) axis
  2. one window sort per ``by`` group: last_value(right payload) over
     rows up to current = "most recent right row at or before me"
  3. keep left rows
One shuffle on ``by`` (the window partition), no range explosion, skew
bounded by the hottest ``by`` key — the scalable formulation; a naive
range join would be O(|L|·|R|) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` within the same ``by`` group (``backward``,
    the default; nulls where no right row precedes), or the earliest
    right row with ``right_ts >= left_ts`` (``forward``). Both
    directions share the union-window kernel — forward mirrors the
    frame ([current, unboundedFollowing] + ``first``) and flips the
    tie order so an exact timestamp tie still matches (>= semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    lt = left.withColumn("__t", F.col(left_ts).cast("timestamp")).withColumn(
        "__is_left", F.lit(1)
    )
    rt = (
        right.withColumn("__t", F.col(right_ts).cast("timestamp"))
        .withColumn("__is_left", F.lit(0))
        .drop(right_ts)
    )
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    left_only = [c for c in lt.columns if c not in rt.columns]
    for c in left_only:
        rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    unioned = lt.select(sorted(lt.columns)).unionByName(rt.select(sorted(rt.columns)))
    if direction == "backward":
        # right rows sort BEFORE left rows at equal timestamps so an
        # exact tie falls inside the trailing frame (asof semantics: <=)
        w = (
            Window.partitionBy(by)
            .orderBy(F.col("__t"), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # forward: right rows sort AFTER left rows at equal timestamps
        # so an exact tie falls inside the leading frame (>=)
        w = (
            Window.partitionBy(by)
            .orderBy(F.col("__t"), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    filled = unioned
    for c in payload_cols:
        filled = filled.withColumn(c, pick(c))
    return filled.filter(F.col("__is_left") == 1).drop("__is_left", "__t")


def range_join_intervals(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Event ⋈ interval containment join, bucketized: both sides key on
    coarse time buckets (intervals explode to every bucket they span) so
    the match becomes an equi-join + residual filter — the standard
    scale-safe range-join rewrite (Databricks' range-join hints do the
    same under the hood). Naive theta-join compares every pair.

    Pick ``bucket_seconds`` near the typical interval length: too small
    explodes the interval side, too large inflates the residual filter.
    """

    def floor_bucket(c: str) -> F.Column:
        secs = F.col(c).cast("timestamp").cast("long")
        return F.floor(secs / bucket_seconds).cast("long") * bucket_seconds

    ev = events.withColumn("__b", floor_bucket(event_ts))
    iv = (
        intervals.withColumn(
            "__bs",
            F.sequence(
                floor_bucket(start_col), floor_bucket(end_col), F.lit(bucket_seconds)
            ),
        )
        .withColumn("__b", F.explode("__bs"))
        .drop("__bs")
    )
    return (
        ev.join(iv, "__b")
        .filter((F.col(event_ts) >= F.col(start_col)) & (F.col(event_ts) <= F.col(end_col)))
        .drop("__b")
    )

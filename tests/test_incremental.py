"""Incremental materialized-view maintenance: the refresh path must be
indistinguishable from a full recompute, including when late data lands
in hours that were already materialized."""

from __future__ import annotations

from pyspark.sql import functions as F


def _as_map(rows):
    return {
        (str(r.bucket_day), r.bucket_hour, r.event_type): (r.n, r.total_value)
        for r in rows
    }


def test_incremental_rollup_equals_full_recompute(spark, sf_dir, tmp_path):
    """Two refreshes over an even/odd event split (every hour appears in
    BOTH halves => the second refresh is pure late-data combine) must
    produce exactly the full recompute — decimal sums make the equality
    exact, not approximate."""
    from nyc_taxi_etl_dashboard_spark.plans.events import (
        hourly_rollup,
        refresh_hourly_rollup,
    )
    from nyc_taxi_etl_dashboard_spark.sources import read_table

    e = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup")
    refresh_hourly_rollup(spark, path, e.filter(F.col("event_id") % 2 == 0))
    refresh_hourly_rollup(spark, path, e.filter(F.col("event_id") % 2 == 1))
    got = _as_map(spark.read.parquet(path).collect())
    want = _as_map(hourly_rollup(e).collect())
    assert got == want
    # sanity: the overlap actually exercised the combine path
    overlap = (
        hourly_rollup(e.filter(F.col("event_id") % 2 == 0))
        .select("bucket_hour", "event_type")
        .intersect(
            hourly_rollup(e.filter(F.col("event_id") % 2 == 1)).select(
                "bucket_hour", "event_type"
            )
        )
        .count()
    )
    assert overlap > 0

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine lives in ``nyc_taxi_etl_dashboard_spark/`` (reference:
1slem/1slem-nyc-taxi-etl-dashboard; the leading '1' is dropped because
Python identifiers cannot start with a digit). Query name prefixes map
to SURVEY.md §2 operator ids (pipe_=P5-P8/F3-F9 pipeline, a*=§2.4
aggregations, w*=§2.5 windows, j*=§2.3 joins, u*/d*=§2.7-2.8,
s*=§2.1 sources, e*=events/streaming-batch, t*/dd*=NEW text/dedup,
v*=NEW similarity).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust to
# the harness running with a different working directory
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def _pin(spark: SparkSession) -> SparkSession:
    from nyc_taxi_etl_dashboard_spark.session import pin_session

    return pin_session(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full extract→transform pipeline (join, metric
    derivation, first-match anomaly classification, split) reduced to its
    run-report aggregates. Exercises scan→join→classify→agg end-to-end."""
    from nyc_taxi_etl_dashboard_spark.plans.pipeline import q_report_stats

    return q_report_stats(_pin(spark), SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nyc_taxi_etl_dashboard_spark.plans import analytics_ext, dashboard, events, llmops, pipeline, star

    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for module in (pipeline, dashboard, star, llmops, events, analytics_ext):
        registry.update(module.QUERIES)

    def pinned(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_pin(spark), sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: pinned(fn) for name, fn in registry.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted => driver
    records a weaker rows-only check; see individual QUERIES docstrings)."""
    from nyc_taxi_etl_dashboard_spark.plans import analytics_ext, dashboard, events, llmops, pipeline, star

    sql: dict[str, str] = {}
    for module in (pipeline, dashboard, star, llmops, events, analytics_ext):
        sql.update(module.ORACLES)
    return sql

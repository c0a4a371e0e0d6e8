"""Rule-based anomaly classification + relation split (SURVEY §2.2 P5-P8).

The reference iterates five predicates in dict order and assigns each row
the FIRST matching rejection reason (``transform.py:47-61``), then splits
the frame into valid/anomaly relations (``transform.py:64-65``) and
accumulates anomalies across runs (``transform.py:69``).

Spark-first shape: the priority cascade is exactly SQL ``CASE WHEN``
first-match semantics — one ``F.when(...).when(...)`` chain, evaluated in
a single whole-stage-codegen pass. The split classifies ONCE over a
persisted frame and filters twice; without the persist each consumer
would rescan the source (SURVEY §7.3 "recompute hazards").

Scale note: classification is embarrassingly parallel (no shuffle). The
persist uses MEMORY_AND_DISK so a 100 TB classified frame spills rather
than OOMs; at that scale prefer writing the classified frame once and
reading it back for the two branches if executor cache churn shows up.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass(frozen=True)
class Rule:
    """One anomaly predicate: rows matching ``condition`` get ``reason``
    unless an earlier rule already matched (priority = list order)."""

    reason: str
    condition: Column


def taxi_rules(
    duration: str = "trip_duration",
    distance: str = "trip_distance",
    fare: str = "fare_amount",
    passengers: str = "passenger_count",
    speed: str = "avg_speed",
    distance_range: tuple[float, float] = (0.1, 100.0),
    speed_range: tuple[float, float] = (1.0, 100.0),
) -> list[Rule]:
    """The reference's five rules, in its priority order
    (``transform.py:47-53``): Durée > Distance > Montant > Passagers >
    Vitesse. ``between`` is inclusive at both bounds in pandas and Spark
    (parity trap, SURVEY §5.3).

    Division-by-zero parity: pandas ``distance/0 -> inf`` fails
    ``between(1,100)``; Spark ``x/0 -> NULL`` and ``NULL between -> NULL``
    which ``~`` keeps NULL => the speed rule must treat NULL speed as
    out-of-range to match. We encode that explicitly with a coalesce.
    """
    spd = F.col(speed)
    return [
        Rule("Durée invalide", F.col(duration) <= 0),
        Rule("Distance hors limites", ~F.col(distance).between(*distance_range)),
        Rule("Montant de course invalide", F.col(fare) <= 0),
        Rule("Passagers invalides", F.col(passengers) <= 0),
        Rule("Vitesse irréaliste", ~F.coalesce(spd.between(*speed_range), F.lit(False))),
    ]


def first_match_reason(rules: list[Rule]) -> Column:
    """P6: priority-ordered first-match classification as one CASE WHEN
    chain (``transform.py:56-61``)."""
    expr = None
    for rule in rules:
        expr = (
            F.when(rule.condition, rule.reason)
            if expr is None
            else expr.when(rule.condition, rule.reason)
        )
    if expr is None:
        return F.lit(None).cast("string")
    return expr.otherwise(F.lit(None).cast("string"))


def classify(df: DataFrame, rules: list[Rule], reason_col: str = "rejection_reason") -> DataFrame:
    """Attach the first-match rejection reason (null => valid row)."""
    return df.withColumn(reason_col, first_match_reason(rules))


def split_valid_anomalies(
    df: DataFrame,
    rules: list[Rule],
    reason_col: str = "rejection_reason",
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """P7/P8: classify once, split into (valid, anomalies)
    (``transform.py:64-65``). Valid branch drops the reason column like
    the reference; anomaly branch keeps it for the audit counts
    (``transform.py:70-71``)."""
    classified = classify(df, rules, reason_col)
    if persist:
        classified = classified.persist(StorageLevel.MEMORY_AND_DISK)
    valid = classified.filter(F.col(reason_col).isNull()).drop(reason_col)
    anomalies = classified.filter(F.col(reason_col).isNotNull())
    return valid, anomalies


def anomaly_breakdown(anomalies: DataFrame, reason_col: str = "rejection_reason") -> DataFrame:
    """A2/O1: per-reason counts, descending (``transform.py:71,135``)."""
    return (
        anomalies.groupBy(reason_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc(reason_col))
    )

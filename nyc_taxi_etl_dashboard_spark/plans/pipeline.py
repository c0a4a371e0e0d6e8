"""The reference ETL pipeline (extract → transform) over the synthetic
tables, per the FIXTURES.md §3 role mapping.

Taxi semantics → synthetic stand-ins:
  pickup/dropoff ts   = o_orderdate / l_shipdate
  trip_distance       = l_quantity
  fare_amount         = l_extendedprice * (1 - l_discount)
  total_amount        = fare * (1 + l_tax)
  passenger_count     = l_linenumber
  payment decode      = l_returnflag {N,A,R} (unmapped parity: none here,
                        so ratecode uses l_linestatus with an
                        intentionally partial map {O} to preserve the
                        null-on-miss path, ``transform.py:99``)
  locations           = l_partkey % 250 / l_suppkey % 250

Rule thresholds are retuned to the synthetic distributions (the taxi
thresholds live in ``operators.classify.taxi_rules``); the OPERATORS are
identical — first-match CASE priority, split, audit counts
(``transform.py:47-71``).

Scale notes
-----------
- lineitem ⋈ orders is the one big-big join: at 100 TB both sides
  shuffle on l_orderkey/o_orderkey. Pre-bucketing both tables on the
  order key (``bucketBy(1024, 'l_orderkey')``) makes it shuffle-free;
  AQE handles residual skew. On the synthetic parquet (no buckets) it's
  a sort-merge join, which is the right default.
- Everything after the join is shuffle-free narrow work in one
  whole-stage-codegen pass.
- avg_speed stays an unrounded double here: per-row IEEE division is
  bit-identical across engines, so the DuckDB oracle matches exactly;
  rounding would only add tie-break risk (taxi mode rounds 2dp per
  ``transform.py:40``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import decode_map, minutes_between, tie_safe_round
from ..operators.classify import Rule, split_valid_anomalies
from ..sources import read_table

#: decode maps for the synthetic categorical columns (F8/F9 parity —
#: the ratecode map is intentionally partial so unmapped codes yield
#: NULL labels like payment_type 5/6 in the reference)
RETURNFLAG_LABELS = {"N": "Aucune", "A": "Acceptée", "R": "Retournée"}
LINESTATUS_LABELS = {"O": "Ouverte"}

#: synthetic-tuned anomaly thresholds (distribution measured at sf0.01:
#: ~48% of rows have l_shipdate <= o_orderdate, quantity spans 1-50,
#: fare spans ~900-105k, linenumber 1-7, speed median ~0.03/day)
DISTANCE_RANGE = (2.0, 45.0)
FARE_MIN = 2000.0
PASSENGER_MIN = 1
SPEED_RANGE = (0.02, 2.0)


def trips(spark: SparkSession, sf_dir: str, rebalance: bool = False) -> DataFrame:
    """Build the trips-shaped fact frame from lineitem ⋈ orders.

    ``rebalance=True`` repartitions the lineitem scan before anything
    else touches it: on unsplittable inputs (single-row-group parquet)
    the scan is 1 task, and with the orders side broadcast there is no
    other exchange — so without the rebalance the ENTIRE
    join+derive+classify chain would inherit the scan's serial
    parallelism. Placed directly after the scan, only the raw parquet
    parse is serial; every downstream expression runs cluster-wide. On
    real multi-file layouts the guard is a no-op (scan already wide).
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    if rebalance:
        from ..operators import scale_out

        lineitem = scale_out(lineitem)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    fare = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            # o_orderdate/l_shipdate are date-granular; spread pickups
            # deterministically across the day so hour/day-part features
            # (F5-F7) have real coverage instead of a constant hour 0
            F.timestamp_add(
                "SECOND",
                ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 86400).cast("int"),
                F.col("o_orderdate"),
            ).alias("pickup_ts"),
            F.col("l_shipdate").alias("dropoff_ts"),
            F.col("l_linenumber").cast("int").alias("passenger_count"),
            F.col("l_quantity").alias("trip_distance"),
            fare.alias("fare_amount"),
            # the reference's README defines Total Revenue over a
            # tip_amount column its own extract never loads (doc
            # inconsistency, SURVEY §2.4); this schema variant carries
            # an explicit tip so A7/Tipping-Rate have an EXACT form
            # (a7b) alongside the analogous one (a7/a12)
            (fare * F.col("l_tax")).alias("tip_amount"),
            (fare * (F.lit(1.0) + F.col("l_tax"))).alias("total_amount"),
            F.col("l_returnflag").alias("payment_code"),
            F.col("l_linestatus").alias("ratecode"),
            (F.col("l_partkey") % 250).cast("int").alias("pu_location_id"),
            (F.col("l_suppkey") % 250).cast("int").alias("do_location_id"),
        )
    )


def synth_rules() -> list[Rule]:
    """The five-rule bank (P5) retuned to synthetic ranges, reference
    priority order preserved (``transform.py:47-53``)."""
    spd = F.col("avg_speed")
    return [
        Rule("Durée invalide", F.col("trip_duration") <= 0),
        Rule("Distance hors limites", ~F.col("trip_distance").between(*DISTANCE_RANGE)),
        Rule("Montant de course invalide", F.col("fare_amount") <= FARE_MIN),
        Rule("Passagers invalides", F.col("passenger_count") <= PASSENGER_MIN),
        Rule("Vitesse irréaliste", ~F.coalesce(spd.between(*SPEED_RANGE), F.lit(False))),
    ]


def with_metrics(df: DataFrame) -> DataFrame:
    """F3/F4 on the synthetic frame: duration in minutes, speed in
    distance-units/day (taxi uses mph; unit change only rescales the
    thresholds)."""
    df = df.withColumn("trip_duration", minutes_between("dropoff_ts", "pickup_ts"))
    return df.withColumn(
        "avg_speed", F.col("trip_distance") / (F.col("trip_duration") / F.lit(1440.0))
    )


def with_features(df: DataFrame) -> DataFrame:
    """F5-F9 on the synthetic frame: time features + label decodes."""
    from ..functions import day_name, time_period

    df = df.withColumn("pickup_hour", F.hour("pickup_ts"))
    df = df.withColumn("day_of_week", day_name("pickup_ts"))
    df = df.withColumn("time_period", time_period("pickup_hour"))
    df = df.withColumn("payment_label", decode_map("payment_code", RETURNFLAG_LABELS))
    return df.withColumn("ratecode_label", decode_map("ratecode", LINESTATUS_LABELS))


def transform(
    spark: SparkSession, sf_dir: str, persist: bool = True
) -> tuple[DataFrame, DataFrame]:
    """The full transform stage (``transform.py:146-184``): metrics →
    classify/split → features on the valid branch. Returns
    (valid, anomalies)."""
    base = with_metrics(trips(spark, sf_dir))
    valid, anomalies = split_valid_anomalies(base, synth_rules(), persist=persist)
    return with_features(valid), anomalies


def _fmt_ts(c: str):
    return F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss").alias(c)


def q_valid_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full valid branch of the transform (P5-P8 + F3-F9 end-to-end).

    Row-level oracle: every derived column is per-row IEEE arithmetic,
    so the hash must match bit-for-bit with DuckDB without rounding.
    """
    valid, _ = transform(spark, sf_dir, persist=False)
    return valid.select(
        "order_key",
        "line_number",
        _fmt_ts("pickup_ts"),
        _fmt_ts("dropoff_ts"),
        "passenger_count",
        "trip_distance",
        "fare_amount",
        "total_amount",
        "trip_duration",
        "avg_speed",
        "pickup_hour",
        "day_of_week",
        "time_period",
        "payment_label",
        "ratecode_label",
    )


def q_anomaly_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/O1: per-reason anomaly counts, descending (``transform.py:71``)."""
    from ..operators.classify import anomaly_breakdown

    _, anomalies = transform(spark, sf_dir, persist=False)
    return anomaly_breakdown(anomalies)


def q_report_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSON report's aggregates as a 1-row frame
    (``transform.py:129-144``).

    Single pass over the classified frame with conditional aggregates —
    no persist, no second job: at 100 TB, scanning once and branching
    inside the aggregate beats materializing the split just to count it
    (the split+persist shape remains in ``transform`` for consumers that
    need both branches as relations).
    """
    from ..operators.classify import classify

    classified = classify(with_metrics(trips(spark, sf_dir)), synth_rules())
    is_valid = F.col("rejection_reason").isNull()
    v = lambda c: F.when(is_valid, F.col(c))  # noqa: E731
    return classified.agg(
        F.count(F.lit(1)).alias("total_processed"),
        F.count(F.when(is_valid, 1)).alias("valid_count"),
        F.count(F.when(~is_valid, 1)).alias("anomaly_count"),
        # tie_safe_round (SURVEY §8): count ratios and money averages
        # can terminate at digit N+1 with a 5 (2,5-smooth denominators)
        # and fare sums carry 4 exact digits — bridge through decimal.
        tie_safe_round(
            F.lit(100.0) * F.count(F.when(~is_valid, 1)) / F.count(F.lit(1)), 4
        ).alias("anomaly_rate_pct"),
        tie_safe_round(F.avg(v("trip_duration")), 4).alias("avg_duration_min"),
        tie_safe_round(F.avg(v("avg_speed")), 4).alias("avg_speed_val"),
        tie_safe_round(F.sum(v("fare_amount")), 2).alias("total_fare"),
    )


def dual_sink_write(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """The production shape of the valid/anomaly split at scale: ONE
    scan, one classification pass, one write — the branch becomes a
    partition column, so both 'sinks' (S5 valid + S6 side-output) are
    directories of a single partitioned parquet write. No persist, no
    second job; counts ride along via ``observe`` instead of extra
    aggregation jobs.

    This is the honest comparable to the reference's 300k rows/s full
    transform (load → classify → write both outputs,
    ``transform.log:1,10``).
    """
    from pyspark.sql import Observation

    from ..operators.classify import classify

    # rebalance at the scan (see ``trips``): the only serial work left on
    # unsplittable inputs is the parquet parse itself; join (broadcast),
    # metric derivation, classification, features and the write all run
    # at full parallelism — measured 2.8s -> 2.1s at sf0.1 vs the old
    # post-classification repartition
    classified = classify(with_metrics(trips(spark, sf_dir, rebalance=True)), synth_rules())
    branched = with_features(
        classified.withColumn(
            "branch",
            F.when(F.col("rejection_reason").isNull(), "valid").otherwise("anomaly"),
        )
    )
    obs = Observation("split")
    branched = branched.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("rejection_reason").isNotNull(), 1)).alias("anomalies"),
    )
    branched.write.mode("overwrite").partitionBy("branch").parquet(out_dir)
    return obs.get


def report(valid: DataFrame, anomalies: DataFrame) -> dict:
    """JSON run report (``transform.py:129-144``): counts, anomaly rate,
    means, total fare. Computed over the classified branches explicitly
    (the reference reads a mutated pre-split frame — documented
    divergence, SURVEY §5.3). Two 1-row aggregates; driver-side by
    design."""
    vrow = valid.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("trip_duration").alias("avg_duration"),
        F.avg("avg_speed").alias("avg_speed"),
        F.sum("fare_amount").alias("total_fare"),
    ).collect()[0]
    n_anom = anomalies.count()
    total = vrow["n"] + n_anom
    return {
        "total_processed": total,
        "valid_count": vrow["n"],
        "anomaly_count": n_anom,
        "anomaly_rate": f"{(100.0 * n_anom / total if total else 0.0):.2f}%",
        "avg_trip_duration_min": vrow["avg_duration"],
        "avg_speed": vrow["avg_speed"],
        "total_fare": vrow["total_fare"],
    }


# --------------------------------------------------------------------------
# Oracle registry (driver contract: __spark_entry__.queries/oracle_sql)
# --------------------------------------------------------------------------

from .oracle_common import CLASSIFIED_CTE, VALID_CTE  # noqa: E402

QUERIES = {
    "pipe_valid_rows": q_valid_rows,
    "pipe_anomaly_breakdown": q_anomaly_breakdown,
    "pipe_report_stats": q_report_stats,
}

ORACLES = {
    "pipe_valid_rows": f"""WITH {VALID_CTE}
SELECT order_key, line_number,
       strftime(pickup_ts, '%Y-%m-%d %H:%M:%S') AS pickup_ts,
       strftime(dropoff_ts, '%Y-%m-%d %H:%M:%S') AS dropoff_ts,
       passenger_count, trip_distance, fare_amount, total_amount,
       trip_duration, avg_speed, pickup_hour, day_of_week, time_period,
       payment_label, ratecode_label
FROM valid""",
    "pipe_anomaly_breakdown": f"""WITH {CLASSIFIED_CTE}
SELECT rejection_reason, count(*) AS n
FROM classified WHERE rejection_reason IS NOT NULL
GROUP BY rejection_reason
ORDER BY n DESC, rejection_reason""",
    "pipe_report_stats": f"""WITH {CLASSIFIED_CTE}
SELECT count(*) AS total_processed,
       count(*) FILTER (WHERE rejection_reason IS NULL) AS valid_count,
       count(*) FILTER (WHERE rejection_reason IS NOT NULL) AS anomaly_count,
       CAST(round(CAST(100.0 * (count(*) FILTER (WHERE rejection_reason IS NOT NULL)) / count(*) AS DECIMAL(28,12)), 4) AS DOUBLE) AS anomaly_rate_pct,
       CAST(round(CAST(avg(trip_duration) FILTER (WHERE rejection_reason IS NULL) AS DECIMAL(28,12)), 4) AS DOUBLE) AS avg_duration_min,
       CAST(round(CAST(avg(avg_speed) FILTER (WHERE rejection_reason IS NULL) AS DECIMAL(28,12)), 4) AS DOUBLE) AS avg_speed_val,
       CAST(round(CAST(sum(fare_amount) FILTER (WHERE rejection_reason IS NULL) AS DECIMAL(28,12)), 2) AS DOUBLE) AS total_fare
FROM classified""",
}

"""Dashboard measures and visuals (SURVEY §2.4 A6-A17, §2.5 windows,
§2.6 sorts/top-k) as named queries over the transform's valid branch.

Each Power BI card/visual (``reference:README.md:43-66``,
``Dashboard/nyc taxi.png``) becomes one aggregation plan. All are
single-shuffle (one groupBy) or shuffle-free scans; percent-of-total and
top-k use window functions instead of driver-side math.

Scale notes: these run over the classified valid branch — in production
that frame is written once partitioned by date, so every dashboard query
gets partition pruning on its date slicer (P9) instead of a full scan.
Group-bys here key on low-cardinality columns (labels, hours, location
ids ≤250) => partial aggregation (map-side combine) collapses almost all
rows before the shuffle; AQE coalesces the handful of result partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tie_safe_round
from .oracle_common import VALID_CTE
from .pipeline import transform


def _valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transform(spark, sf_dir, persist=False)[0]


def q_total_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: ``Total Trips = COUNTROWS(trips)`` (README.md:44-47)."""
    return _valid(spark, sf_dir).agg(F.count(F.lit(1)).alias("total_trips"))


def q_total_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: ``Total Revenue = SUM(fare) + SUM(tip)`` (README.md:48-51);
    tip_amount isn't in the extracted columns (doc inconsistency noted in
    SURVEY §2.4), so the engine sums the two available amount columns."""
    return _valid(spark, sf_dir).agg(
        tie_safe_round(F.sum("fare_amount") + F.sum("total_amount"), 2, dec="decimal(28,6)").alias("total_revenue")
    )


def q_total_revenue_tip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7b (VERDICT r12 item 6): the reference's Total Revenue formula
    EXACTLY as documented — ``SUM(fare_amount) + SUM(tip_amount)``
    (README.md:48-51) — plus the exact Tipping-Rate KPI
    (``AVG(tip/fare)``), over the schema variant that carries an
    explicit ``tip_amount`` column (the reference's own extract never
    loads one, extract.py:7-19 — the doc inconsistency a7/a12 work
    around with available-column analogs)."""
    return _valid(spark, sf_dir).agg(
        tie_safe_round(F.sum("fare_amount") + F.sum("tip_amount"), 2, dec="decimal(28,6)").alias("total_revenue"),
        tie_safe_round(F.avg(F.col("tip_amount") / F.col("fare_amount")), 4).alias(
            "tipping_rate"
        ),
    )


def q_avg_fare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: ``Average Fare = AVERAGE(fare_amount)`` (README.md:52-55)."""
    return _valid(spark, sf_dir).agg(tie_safe_round(F.avg("fare_amount"), 4).alias("avg_fare"))


def q_trips_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: trips per pickup date — the CALCULATE/ALLEXCEPT measure
    (README.md:56-59) as a grouped count."""
    return (
        _valid(spark, sf_dir)
        .groupBy(F.to_date("pickup_ts").cast("string").alias("pickup_date"))
        .agg(F.count(F.lit(1)).alias("n_trips"))
    )


def q_daily_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: KPI 'Daily Avg Revenue' — avg over per-day revenue sums
    (two-level aggregation, Dashboard card 1)."""
    daily = (
        _valid(spark, sf_dir)
        .groupBy(F.to_date("pickup_ts").alias("d"))
        .agg(F.sum("total_amount").alias("rev"))
    )
    return daily.agg(tie_safe_round(F.avg("rev"), 2).alias("daily_avg_revenue"))


def q_median_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: KPI 'Median Trip Distance' (Dashboard card 4)."""
    return _valid(spark, sf_dir).agg(
        F.round(F.median("trip_distance"), 4).alias("median_distance")
    )


def q_kpi_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: single-pass ratio KPIs (Dashboard cards 2/3/5): utilization
    (share of multi-passenger trips), tipping rate (total/fare uplift),
    average commercial speed."""
    return _valid(spark, sf_dir).agg(
        tie_safe_round(
            F.lit(100.0) * F.avg(F.when(F.col("passenger_count") >= 3, 1.0).otherwise(0.0)),
            4,
        ).alias("utilization_pct"),
        tie_safe_round(F.avg(F.col("total_amount") / F.col("fare_amount")), 4).alias("tipping_rate"),
        tie_safe_round(F.avg("avg_speed"), 4).alias("avg_commercial_speed"),
    )


def q_revenue_by_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 + O2: 'Total amount by payment type' bar, value-desc order."""
    return (
        _valid(spark, sf_dir)
        .groupBy("payment_label")
        .agg(tie_safe_round(F.sum("total_amount"), 2, dec="decimal(28,6)").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


def q_passengers_by_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 + §2.5: 'Sum of passenger by time period' donut with
    percent-of-total labels via an empty-frame window."""
    grouped = (
        _valid(spark, sf_dir)
        .groupBy("time_period")
        .agg(F.sum("passenger_count").alias("passengers"))
    )
    total = Window.partitionBy()
    return grouped.select(
        "time_period",
        "passengers",
        tie_safe_round(F.lit(100.0) * F.col("passengers") / F.sum("passengers").over(total), 4).alias(
            "pct_of_total"
        ),
    )


def q_fare_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: 'Trip Distance Distribution' histogram — fixed-width binned
    counts (Dashboard top right). Bin = floor(fare/5000)."""
    return (
        _valid(spark, sf_dir)
        .groupBy(F.floor(F.col("fare_amount") / F.lit(5000.0)).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_revenue_by_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: 'Total amount by Location' map — sum per pickup location."""
    return (
        _valid(spark, sf_dir)
        .groupBy("pu_location_id")
        .agg(tie_safe_round(F.sum("total_amount"), 2, dec="decimal(28,6)").alias("revenue"))
    )


def q_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: calendar hierarchy rollup (Year > Quarter > Month) with
    subtotal rows — the Power BI date-hierarchy drilldown as
    ``ROLLUP`` (Dashboard bottom right, README.md:64)."""
    return (
        _valid(spark, sf_dir)
        .rollup(
            F.year("pickup_ts").alias("y"),
            F.quarter("pickup_ts").alias("q"),
            F.month("pickup_ts").alias("m"),
        )
        .agg(tie_safe_round(F.sum("total_amount"), 2, dec="decimal(28,6)").alias("revenue"))
    )


def q_top3_locations_per_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/O2: top-3 pickup locations by revenue within each time
    period — ranking window + filter (the scale-safe 'top locations'
    pattern; never collect-and-sort on the driver)."""
    revenue = (
        _valid(spark, sf_dir)
        .groupBy("time_period", "pu_location_id")
        .agg(tie_safe_round(F.sum("total_amount"), 2, dec="decimal(28,6)").alias("revenue"))
    )
    w = Window.partitionBy("time_period").orderBy(
        F.desc("revenue"), F.asc("pu_location_id")
    )
    return (
        revenue.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("time_period", "pu_location_id", "revenue", "rnk")
    )


def q_trips_per_day_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 as a row-attached measure: ``CALCULATE([Total Trips],
    ALLEXCEPT(trips, pickup_date))`` == count over a partition window
    (README.md:56-59)."""
    w = Window.partitionBy(F.to_date("pickup_ts"))
    return _valid(spark, sf_dir).select(
        "order_key",
        "line_number",
        F.to_date("pickup_ts").cast("string").alias("pickup_date"),
        F.count(F.lit(1)).over(w).alias("trips_that_day"),
    )


QUERIES = {
    "a6_total_trips": q_total_trips,
    "a7_total_revenue": q_total_revenue,
    "a7b_total_revenue_tip": q_total_revenue_tip,
    "a8_avg_fare": q_avg_fare,
    "a9_trips_per_day": q_trips_per_day,
    "a10_daily_avg_revenue": q_daily_avg_revenue,
    "a11_median_distance": q_median_distance,
    "a12_kpi_ratios": q_kpi_ratios,
    "a13_revenue_by_payment": q_revenue_by_payment,
    "a14_passengers_by_period": q_passengers_by_period,
    "a15_fare_histogram": q_fare_histogram,
    "a16_revenue_by_location": q_revenue_by_location,
    "a17_calendar_rollup": q_calendar_rollup,
    "w1_top3_locations_per_period": q_top3_locations_per_period,
    "w2_trips_per_day_measure": q_trips_per_day_measure,
}

_V = f"WITH {VALID_CTE}"

ORACLES = {
    "a6_total_trips": f"{_V} SELECT count(*) AS total_trips FROM valid",
    "a7_total_revenue": f"{_V} SELECT CAST(round(CAST(sum(fare_amount) + sum(total_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS total_revenue FROM valid",
    "a7b_total_revenue_tip": f"""{_V}
SELECT CAST(round(CAST(sum(fare_amount) + sum(tip_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS total_revenue,
       CAST(round(CAST(avg(tip_amount / fare_amount) AS DECIMAL(28,12)), 4) AS DOUBLE) AS tipping_rate
FROM valid""",
    "a8_avg_fare": f"{_V} SELECT CAST(round(CAST(avg(fare_amount) AS DECIMAL(28,12)), 4) AS DOUBLE) AS avg_fare FROM valid",
    "a9_trips_per_day": f"""{_V}
SELECT CAST(CAST(pickup_ts AS DATE) AS VARCHAR) AS pickup_date, count(*) AS n_trips
FROM valid GROUP BY 1""",
    "a10_daily_avg_revenue": f"""{_V},
daily AS (SELECT CAST(pickup_ts AS DATE) AS d, sum(total_amount) AS rev FROM valid GROUP BY 1)
SELECT CAST(round(CAST(avg(rev) AS DECIMAL(28,12)), 2) AS DOUBLE) AS daily_avg_revenue FROM daily""",
    "a11_median_distance": f"{_V} SELECT round(median(trip_distance), 4) AS median_distance FROM valid",
    "a12_kpi_ratios": f"""{_V}
SELECT CAST(round(CAST(100.0 * avg(CASE WHEN passenger_count >= 3 THEN 1.0 ELSE 0.0 END) AS DECIMAL(28,12)), 4) AS DOUBLE) AS utilization_pct,
       CAST(round(CAST(avg(total_amount / fare_amount) AS DECIMAL(28,12)), 4) AS DOUBLE) AS tipping_rate,
       CAST(round(CAST(avg(avg_speed) AS DECIMAL(28,12)), 4) AS DOUBLE) AS avg_commercial_speed
FROM valid""",
    "a13_revenue_by_payment": f"""{_V}
SELECT payment_label, CAST(round(CAST(sum(total_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue
FROM valid GROUP BY payment_label ORDER BY revenue DESC""",
    "a14_passengers_by_period": f"""{_V},
grouped AS (SELECT time_period, CAST(sum(passenger_count) AS BIGINT) AS passengers FROM valid GROUP BY time_period)
SELECT time_period, passengers,
       CAST(round(CAST(100.0 * passengers / sum(passengers) OVER () AS DECIMAL(28,12)), 4) AS DOUBLE) AS pct_of_total
FROM grouped""",
    "a15_fare_histogram": f"""{_V}
SELECT CAST(floor(fare_amount / 5000.0) AS BIGINT) AS bin, count(*) AS n
FROM valid GROUP BY 1""",
    "a16_revenue_by_location": f"""{_V}
SELECT pu_location_id, CAST(round(CAST(sum(total_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue
FROM valid GROUP BY pu_location_id""",
    "a17_calendar_rollup": f"""{_V}
SELECT CAST(year(pickup_ts) AS INTEGER) AS y, CAST(quarter(pickup_ts) AS INTEGER) AS q, CAST(month(pickup_ts) AS INTEGER) AS m,
       CAST(round(CAST(sum(total_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue
FROM valid GROUP BY ROLLUP (y, q, m)""",
    "w1_top3_locations_per_period": f"""{_V},
revenue AS (
  SELECT time_period, pu_location_id, CAST(round(CAST(sum(total_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue
  FROM valid GROUP BY time_period, pu_location_id)
SELECT time_period, pu_location_id, revenue, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY time_period
            ORDER BY revenue DESC, pu_location_id) AS INTEGER) AS rnk
  FROM revenue) WHERE rnk <= 3""",
    "w2_trips_per_day_measure": f"""{_V}
SELECT order_key, line_number,
       CAST(CAST(pickup_ts AS DATE) AS VARCHAR) AS pickup_date,
       count(*) OVER (PARTITION BY CAST(pickup_ts AS DATE)) AS trips_that_day
FROM valid""",
}


def q_sliced_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: slicer-filtered visual — trips per day under a (year,
    time_period) slicer context, the Power BI left-rail filters
    (README.md:41,66). Date predicates push into the scan; on a
    date-partitioned warehouse table this becomes partition pruning."""
    v = _valid(spark, sf_dir)
    return (
        v.filter((F.year("pickup_ts") == 1997) & (F.col("time_period") == "Matin"))
        .groupBy(F.to_date("pickup_ts").cast("string").alias("pickup_date"))
        .agg(F.count(F.lit(1)).alias("n_trips"), tie_safe_round(F.sum("total_amount"), 2, dec="decimal(28,6)").alias("revenue"))
    )


QUERIES["p9_sliced_trips"] = q_sliced_trips
ORACLES["p9_sliced_trips"] = f"""{_V}
SELECT CAST(CAST(pickup_ts AS DATE) AS VARCHAR) AS pickup_date,
       count(*) AS n_trips, CAST(round(CAST(sum(total_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue
FROM valid
WHERE year(pickup_ts) = 1997 AND time_period = 'Matin'
GROUP BY 1"""


def q_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a27: a13's grouped revenue computed through the SKEW-SAFE
    two-phase salted aggregation (``operators.skew.salted_agg`` — the
    skewed-GROUP-BY mitigation AQE's join splitting does not cover):
    phase 1 groups on (key, salt) so a hot key's rows spread over
    salt_buckets reducers, phase 2 merges |keys|×buckets partials.
    Certified EXACTLY equal to the plain aggregation (the oracle IS
    a13's SQL) — salting must never change the answer, only the
    shuffle layout."""
    from ..operators.skew import salted_agg

    out = salted_agg(
        _valid(spark, sf_dir),
        ["payment_label"],
        {"revenue": ("total_amount", "sum")},
    )
    return out.select(
        "payment_label", tie_safe_round(F.col("revenue"), 2, dec="decimal(28,6)").alias("revenue")
    ).orderBy(F.desc("revenue"))


QUERIES["a27_salted_revenue"] = q_salted_revenue
ORACLES["a27_salted_revenue"] = f"""{_V}
SELECT payment_label, CAST(round(CAST(sum(total_amount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue
FROM valid GROUP BY payment_label ORDER BY revenue DESC"""

"""Star-schema load stage as named queries (SURVEY §3.3, J1-J5/U2/D2).

Mirrors ``load.py:71-228``: build dim_time / dim_location / dim_payment
(here dim_ratecode plays dim_payment's unmapped-code role), mint dense
surrogate keys, resolve the fact via four broadcast inner joins — with
the reference's silent row loss on NULL labels preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tie_safe_round
from ..operators.star import build_dim, resolve_fact, union_distinct_dim, upsert_anti_join
from ..sources import read_table
from .oracle_common import VALID_CTE
from .pipeline import transform


def _valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transform(spark, sf_dir, persist=False)[0]


def dim_time(valid: DataFrame, oracle_mode: bool = False) -> DataFrame:
    """dim_time: distinct pickup timestamps + time attributes
    (``load.py:114-124``). Natural key is the raw pickup timestamp —
    cardinality grows with the fact, so the default mints hash keys;
    dense keys (the reference's SERIAL parity) only under
    ``oracle_mode``."""
    return build_dim(
        valid.select(
            F.col("pickup_ts").alias("datetime"),
            F.col("pickup_hour").alias("hour"),
            "day_of_week",
            "time_period",
        ),
        ["datetime"],
        "time_pk",
        attr_cols=["hour", "day_of_week", "time_period"],
        oracle_mode=oracle_mode,
    )


def dim_location(valid: DataFrame, oracle_mode: bool = False) -> DataFrame:
    """dim_location: U2 union of pickup+dropoff ids, dedup, surrogate
    keys (``load.py:127-137``), plus the ``borough`` attribute the
    reference declares as ``VARCHAR(50) NOT NULL DEFAULT 'Inconnu'``
    (``load.py:33``) and never back-fills — so every row carries the
    default, exactly like the reference warehouse."""
    return union_distinct_dim(
        valid, ["pu_location_id", "do_location_id"], "location_id", "location_pk",
        oracle_mode=oracle_mode,
    ).withColumn("borough", F.lit("Inconnu"))


def dim_payment(valid: DataFrame, oracle_mode: bool = False) -> DataFrame:
    """dim_payment: distinct labels (``load.py:140-147``)."""
    return build_dim(
        valid.select(F.col("payment_label").alias("payment_type")),
        ["payment_type"], "payment_pk", oracle_mode=oracle_mode,
    )


def dim_ratecode(valid: DataFrame, oracle_mode: bool = False) -> DataFrame:
    """Second label dim from the intentionally-partial decode map — the
    J4 row-loss trap carrier (unmapped codes have NULL labels and drop
    at fact resolution)."""
    return build_dim(
        valid.select(F.col("ratecode_label").alias("ratecode_type")),
        ["ratecode_type"], "ratecode_pk", oracle_mode=oracle_mode,
    )


def q_dim_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dim_time(_valid(spark, sf_dir), oracle_mode=True)
    return d.select(
        "time_pk",
        F.date_format("datetime", "yyyy-MM-dd HH:mm:ss").alias("datetime"),
        "hour",
        "day_of_week",
        "time_period",
    )


def q_dim_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_location(_valid(spark, sf_dir), oracle_mode=True).select(
        "location_pk", "location_id", "borough"
    )


def q_dim_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_payment(_valid(spark, sf_dir), oracle_mode=True).select("payment_pk", "payment_type")


def q_fact_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J4: the 4-way broadcast-join fact resolution
    (``load.py:155-200``). dim_location is joined twice (pickup/dropoff)
    under aliases — the pandas ``suffixes=('_pu','_do')`` pattern (J3).
    Row loss parity: rows with NULL ratecode_label drop (inner join).

    The valid frame feeds five consumers (four dim builds + the fact).
    Measured one-shot strategies at sf0.1: recompute 3.3s, persist 3.9s
    cold (columnar-cache serialization), localCheckpoint 2.4s —
    checkpoint materializes raw rows once and truncates the lineage.
    Caveat: localCheckpoint blocks die with executors; under dynamic
    allocation on a real cluster prefer persist(DISK) or a staging
    write."""
    valid = _valid(spark, sf_dir).localCheckpoint(eager=False)
    # oracle_mode: DuckDB must reproduce the pk values in this output
    dt = dim_time(valid, oracle_mode=True)
    dl = dim_location(valid, oracle_mode=True)
    dp = dim_payment(valid, oracle_mode=True)
    dr = dim_ratecode(valid, oracle_mode=True)
    return resolve_fact(
        valid,
        [
            (dt, F.col("pickup_ts") == F.col("t.datetime"), "t"),
            (dl, F.col("pu_location_id") == F.col("pu.location_id"), "pu"),
            (dl, F.col("do_location_id") == F.col("do.location_id"), "do"),
            (dp, F.col("payment_label") == F.col("p.payment_type"), "p"),
            (dr, F.col("ratecode_label") == F.col("r.ratecode_type"), "r"),
        ],
        [
            F.col("order_key"),
            F.col("line_number"),
            F.col("t.time_pk").alias("time_pk"),
            F.col("pu.location_pk").alias("pickup_loc_pk"),
            F.col("do.location_pk").alias("dropoff_loc_pk"),
            F.col("p.payment_pk").alias("payment_pk"),
            F.col("r.ratecode_pk").alias("ratecode_pk"),
            F.col("passenger_count"),
            # NUMERIC(8,2) parity (load.py:53-57). Money values carry at
            # most 6 exact decimal digits (2dp price × 2dp discount ×
            # 2dp tax); rounding the raw double 2dp is engine-dependent
            # at .xx5 ties (Spark BigDecimal HALF_UP vs DuckDB's
            # scaled-multiply), so recover the exact decimal at scale 6
            # first, round there, then hand back a double.
            F.round("trip_distance", 2).alias("trip_distance"),
            F.round(F.col("fare_amount").cast("decimal(18,6)"), 2)
            .cast("double")
            .alias("fare_amount"),
            F.round(F.col("total_amount").cast("decimal(18,6)"), 2)
            .cast("double")
            .alias("total_amount"),
            F.round("trip_duration", 2).alias("duration_min"),
        ],
    )


def q_upsert_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: insert-if-absent — incoming location dim rows not already in
    the 'warehouse' (simulated as the even pickup-side ids, so the
    anti-join has a non-trivial remainder; ``load.py:121-123``
    semantics)."""
    valid = _valid(spark, sf_dir)
    incoming = dim_location(valid).select("location_id")
    existing = (
        valid.select(F.col("pu_location_id").alias("location_id"))
        .filter(F.col("location_id") % 2 == 0)
        .distinct()
    )
    return upsert_anti_join(incoming, existing, ["location_id"])


def q_star_flatten_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2-chain analog on the real TPC-H-ish dims: lineitem →
    orders → customer → nation → region, revenue per region.

    Scale shape: one fact shuffle (lineitem⋈orders on orderkey); the
    customer→nation→region chain collapses to broadcast joins, then a
    5-row aggregate. Catalyst reorders nothing here — the join order is
    already smallest-last; AQE converts customer to broadcast at runtime
    if stats allow."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            tie_safe_round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
                dec="decimal(28,6)",
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


QUERIES = {
    "st1_dim_time": q_dim_time,
    "st2_dim_location": q_dim_location,
    "st3_dim_payment": q_dim_payment,
    "st4_fact_resolved": q_fact_resolved,
    "st5_upsert_anti": q_upsert_anti,
    "j1_star_flatten_revenue": q_star_flatten_revenue,
}

_V = f"WITH {VALID_CTE}"

_DIMS = """,
dim_time AS (
  SELECT CAST(row_number() OVER (ORDER BY datetime) AS INTEGER) AS time_pk, *
  FROM (SELECT DISTINCT pickup_ts AS datetime, pickup_hour AS hour,
               day_of_week, time_period FROM valid)),
dim_location AS (
  SELECT CAST(row_number() OVER (ORDER BY location_id) AS INTEGER) AS location_pk, location_id
  FROM (SELECT DISTINCT location_id FROM (
        SELECT pu_location_id AS location_id FROM valid
        UNION ALL SELECT do_location_id FROM valid)
        WHERE location_id IS NOT NULL)),
dim_payment AS (
  SELECT CAST(row_number() OVER (ORDER BY payment_type) AS INTEGER) AS payment_pk, payment_type
  FROM (SELECT DISTINCT payment_label AS payment_type FROM valid
        WHERE payment_label IS NOT NULL)),
dim_ratecode AS (
  SELECT CAST(row_number() OVER (ORDER BY ratecode_type) AS INTEGER) AS ratecode_pk, ratecode_type
  FROM (SELECT DISTINCT ratecode_label AS ratecode_type FROM valid
        WHERE ratecode_label IS NOT NULL))"""

ORACLES = {
    "st1_dim_time": f"""{_V}{_DIMS}
SELECT time_pk, strftime(datetime, '%Y-%m-%d %H:%M:%S') AS datetime,
       hour, day_of_week, time_period
FROM dim_time""",
    "st2_dim_location": f"{_V}{_DIMS} SELECT location_pk, location_id, 'Inconnu' AS borough FROM dim_location",
    "st3_dim_payment": f"{_V}{_DIMS} SELECT payment_pk, payment_type FROM dim_payment",
    "st4_fact_resolved": f"""{_V}{_DIMS}
SELECT v.order_key, v.line_number, t.time_pk,
       pu.location_pk AS pickup_loc_pk, do_.location_pk AS dropoff_loc_pk,
       p.payment_pk, r.ratecode_pk, v.passenger_count,
       round(v.trip_distance, 2) AS trip_distance,
       CAST(round(CAST(v.fare_amount AS DECIMAL(18,6)), 2) AS DOUBLE) AS fare_amount,
       CAST(round(CAST(v.total_amount AS DECIMAL(18,6)), 2) AS DOUBLE) AS total_amount,
       round(v.trip_duration, 2) AS duration_min
FROM valid v
JOIN dim_time t ON v.pickup_ts = t.datetime
JOIN dim_location pu ON v.pu_location_id = pu.location_id
JOIN dim_location do_ ON v.do_location_id = do_.location_id
JOIN dim_payment p ON v.payment_label = p.payment_type
JOIN dim_ratecode r ON v.ratecode_label = r.ratecode_type""",
    "st5_upsert_anti": f"""{_V}{_DIMS}
SELECT location_id FROM dim_location
WHERE location_id NOT IN (
  SELECT DISTINCT pu_location_id FROM valid WHERE pu_location_id % 2 = 0)""",
    "j1_star_flatten_revenue": """
SELECT r_name AS region_name,
       CAST(round(CAST(sum(l_extendedprice * (1.0 - l_discount)) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name""",
}

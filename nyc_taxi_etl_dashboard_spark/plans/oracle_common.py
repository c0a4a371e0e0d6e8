"""Shared ANSI-SQL text for DuckDB oracle queries.

These CTEs mirror ``plans.pipeline`` expression-for-expression. Per-row
arithmetic is IEEE-double on both engines, so unrounded per-row columns
hash-match exactly; aggregate outputs are rounded at the SELECT site
(sums to 2dp, means to 4dp) to absorb summation-order differences.
"""

TRIPS_CTE = """
trips_base AS (
  SELECT l_orderkey AS order_key,
         l_linenumber AS line_number,
         o_orderdate + to_seconds(CAST((l_orderkey * 7 + l_linenumber) % 86400 AS BIGINT)) AS pickup_ts,
         l_shipdate AS dropoff_ts,
         CAST(l_linenumber AS INTEGER) AS passenger_count,
         l_quantity AS trip_distance,
         l_extendedprice * (1.0 - l_discount) AS fare_amount,
         l_extendedprice * (1.0 - l_discount) * l_tax AS tip_amount,
         l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS total_amount,
         l_returnflag AS payment_code,
         l_linestatus AS ratecode,
         CAST(l_partkey % 250 AS INTEGER) AS pu_location_id,
         CAST(l_suppkey % 250 AS INTEGER) AS do_location_id
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
trips AS (
  SELECT *,
         (epoch(dropoff_ts) - epoch(pickup_ts)) / 60.0 AS trip_duration,
         trip_distance / ((((epoch(dropoff_ts) - epoch(pickup_ts)) / 60.0)) / 1440.0) AS avg_speed
  FROM trips_base
)"""

CLASSIFIED_CTE = (
    TRIPS_CTE
    + """,
classified AS (
  SELECT *,
         CASE
           WHEN trip_duration <= 0 THEN 'Durée invalide'
           WHEN NOT (trip_distance BETWEEN 2.0 AND 45.0) THEN 'Distance hors limites'
           WHEN fare_amount <= 2000.0 THEN 'Montant de course invalide'
           WHEN passenger_count <= 1 THEN 'Passagers invalides'
           WHEN NOT COALESCE(avg_speed BETWEEN 0.02 AND 2.0, FALSE) THEN 'Vitesse irréaliste'
           ELSE NULL
         END AS rejection_reason
  FROM trips
)"""
)

DOW_CASE = """
CASE dayofweek({ts})
  WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday'
  WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
  WHEN 6 THEN 'Saturday' END"""

PERIOD_CASE = """
CASE
  WHEN {h} BETWEEN 0 AND 5 THEN 'Nuit'
  WHEN {h} BETWEEN 6 AND 11 THEN 'Matin'
  WHEN {h} BETWEEN 12 AND 17 THEN 'Après-midi'
  WHEN {h} BETWEEN 18 AND 23 THEN 'Soir'
  ELSE 'Inconnu' END"""

VALID_CTE = (
    CLASSIFIED_CTE
    + """,
valid AS (
  SELECT * EXCLUDE (rejection_reason),
         CAST(hour(pickup_ts) AS INTEGER) AS pickup_hour,
         """
    + DOW_CASE.format(ts="pickup_ts")
    + """ AS day_of_week,
         """
    + PERIOD_CASE.format(h="hour(pickup_ts)")
    + """ AS time_period,
         CASE payment_code WHEN 'N' THEN 'Aucune' WHEN 'A' THEN 'Acceptée'
              WHEN 'R' THEN 'Retournée' ELSE NULL END AS payment_label,
         CASE ratecode WHEN 'O' THEN 'Ouverte' ELSE NULL END AS ratecode_label
  FROM classified WHERE rejection_reason IS NULL
)"""
)

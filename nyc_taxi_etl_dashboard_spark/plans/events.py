"""Event-stream queries, batch form (oracle-checkable twins of the
streaming operators in ``streaming.events``; the streaming versions add
watermarks/state but compute the same answers on a drained input).

Covers the NEW JSON/data-plane functions the reference lacks
(SURVEY §2.9 note): ``get_json_object`` over ``events.props``,
event-time windowing, gap-based sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import read_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props payload (semi-structured
    columns are first-class: parse → typed column, pushable)."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def q_robust_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record tolerance: 1% of payloads are deterministically
    truncated IN-QUERY (both engines mangle identically), then parsed
    with null-on-failure semantics — the PERMISSIVE posture a pipeline
    needs when upstream JSON is dirty; no row errors, corrupt rows
    surface as nulls for quarantine instead of failing the job."""
    e = _events(spark, sf_dir)
    mangled = F.when(
        F.col("event_id") % 100 == 0, F.substring("props", 1, 3)
    ).otherwise(F.col("props"))
    parsed = F.from_json(mangled, "k INT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k"),
        (F.col("event_id") % 100 == 0).alias("was_mangled"),
    )


QUERIES_ROBUST_ORACLE = """
SELECT event_id,
       CAST(CASE WHEN event_id % 100 = 0 THEN NULL
                 ELSE json_extract_string(props, '$.k') END AS INTEGER) AS k,
       event_id % 100 = 0 AS was_mangled
FROM events"""


def q_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event_type — batch twin of
    ``streaming.windowed_counts`` (same groupBy(window) plan minus the
    watermark)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) in pure batch SQL:
    lag → new-session flag → running sum = session id → per-session agg.
    Batch twin of ``streaming.session_counts`` (session_window)."""
    e = _events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_sec = 1800
    with_prev = e.withColumn("prev_ts", F.lag("ts").over(order))
    flagged = with_prev.withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.col("ts").cast("timestamp").cast("double")
                - F.col("prev_ts").cast("timestamp").cast("double")
                > gap_sec
            ),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(run))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


def q_event_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type mix pivoted wide — the engagement-funnel
    census (conditional counts stay one pass, no joins)."""
    e = _events(spark, sf_dir)
    agg = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ["click", "view", "purchase", "signup", "error"]
    ]
    return e.groupBy("user_id").agg(*agg)


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the VARIANT type (Spark 4):
    ``parse_json`` once into the binary variant encoding, then typed
    path access — the lakehouse-native shape that beats re-parsing JSON
    strings per extraction (e1's ``get_json_object``) when several paths
    are pulled from one payload. Same answer as e1 by construction; the
    oracle pins that the variant path is lossless."""
    e = _events(spark, sf_dir)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.schema_of_variant(v).alias("props_schema"),
    )


QUERIES = {
    "e1_json_extract": q_json_extract,
    "e6_variant_extract": q_variant_extract,
    "e7_robust_json": q_robust_json,
    "e2_tumbling_counts": q_tumbling_counts,
    "e3_sessionize": q_sessionize,
    "e4_event_type_funnel": q_event_type_funnel,
}

ORACLES = {
    "e1_json_extract": """
SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events""",
    "e6_variant_extract": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       'OBJECT<k: BIGINT>' AS props_schema
FROM events""",
    # the oracle short-circuits the known-corrupt slice to NULL (DuckDB's
    # json_extract raises on invalid JSON rather than returning null);
    # the VALID slice is parsed for real, pinning the non-corrupt path
    "e7_robust_json": QUERIES_ROBUST_ORACLE,
    "e2_tumbling_counts": """
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2""",
    "e3_sessionize": """
WITH o AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
s AS (
  SELECT user_id, ts,
         CAST(sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM o)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM s GROUP BY user_id, session_id""",
    "e4_event_type_funnel": """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'error') AS n_error
FROM events GROUP BY user_id""",
}


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same event
    stream aggregated at two time grains (hour + day) in ONE pass via
    grouping sets over pre-computed buckets — the batch equivalent of
    TimescaleDB's hierarchical continuous aggregates. At scale the
    hourly grain materializes incrementally (streaming windowed_counts)
    and daily re-aggregates hourly, never raw data."""
    e = _events(spark, sf_dir).select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        "event_type",
        "value",
    )
    e.createOrReplaceTempView("_ev_buckets")
    return spark.sql(
        """
        SELECT date_format(h, 'yyyy-MM-dd HH:mm:ss') AS bucket_hour,
               date_format(d, 'yyyy-MM-dd HH:mm:ss') AS bucket_day,
               event_type, CAST(grouping(h) AS INT) AS g_hour,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM _ev_buckets
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
        """
    )


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Hourly continuous-aggregate grain with MERGEABLE partials: counts
    and decimal sums re-aggregate associatively, so any two rollups of
    disjoint event sets combine by summation — the property incremental
    maintenance depends on. Sums are decimal(18,6) (not double) so
    combine order can't perturb the result."""
    return events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("bucket_day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_hour"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
    )


def refresh_hourly_rollup(spark: SparkSession, rollup_path: str, new_events: DataFrame) -> None:
    """Incremental materialized-view maintenance (TimescaleDB
    continuous-aggregate refresh, Spark-first): aggregate ONLY the new
    events, combine with the existing rollup rows for the affected
    (bucket_hour, event_type) keys by re-summing the mergeable partials,
    and commit through :func:`merge_parquet`'s partition-scoped dynamic
    overwrite — cost scales with the delta's day-partitions, never the
    rollup's history. Late/backfill events land correctly because
    overlapping hours COMBINE (sum of partials) rather than replace.
    """
    import os

    from ..sources.writers import merge_parquet, write_parquet

    delta = hourly_rollup(new_events)
    if not os.path.exists(rollup_path):
        write_parquet(delta, rollup_path, partition_by=["bucket_day"])
        return
    # partition-column type inference reads the yyyy-MM-dd directory
    # values back as DATE; normalize to the rollup's declared string
    # type so the union/merge keys line up
    existing = spark.read.parquet(rollup_path).withColumn(
        "bucket_day", F.col("bucket_day").cast("string")
    )
    affected_days = delta.select("bucket_day").distinct()
    old_in_scope = existing.join(F.broadcast(affected_days), "bucket_day", "left_semi")
    combined = (
        old_in_scope.unionByName(delta.select(*existing.columns))
        .groupBy("bucket_day", "bucket_hour", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_value").cast("decimal(18,6)").alias("total_value"),
        )
    )
    merge_parquet(
        spark,
        rollup_path,
        combined.select(*existing.columns),
        keys=["bucket_hour", "event_type"],
        partition_by=["bucket_day"],
        # bucket_day is derived from the bucket_hour key, so a key can
        # never migrate partitions — skip the target-side key scan
        stable_partition_keys=True,
    )


class _CountMinSketch:
    """Pure-Python reader for Spark's serialized CountMinSketch (the
    binary that SQL ``count_min_sketch(...)`` emits). Replaces the old
    ``spark._jvm`` probe — private API, one minor release from breaking
    — with a decoder of the PUBLIC, versioned wire format from Apache
    Spark ``common/sketch`` (CountMinSketchImpl.writeTo, format V1:
    big-endian int version, long totalCount, int depth, int width,
    long hashA[depth], long table[depth][width]). The version field is
    checked so a future V2 fails loudly, not wrongly; estimates are
    pinned bit-equal to the JVM implementation in
    tests/test_scale_ops.py::test_cms_python_reader_matches_jvm."""

    _PRIME_MODULUS = (1 << 31) - 1
    _MASK64 = (1 << 64) - 1

    def __init__(self, data: bytes) -> None:
        import struct

        version, self.total_count, self.depth, self.width = struct.unpack_from(
            ">iqii", data, 0
        )
        if version != 1:
            raise ValueError(
                f"CountMinSketch wire format v{version} unsupported (expected v1); "
                "re-derive the layout from Apache Spark common/sketch"
            )
        off = 4 + 8 + 4 + 4
        self.hash_a = struct.unpack_from(f">{self.depth}q", data, off)
        off += self.depth * 8
        self.table = [
            struct.unpack_from(f">{self.width}q", data, off + i * self.width * 8)
            for i in range(self.depth)
        ]

    def estimate_count(self, item: int) -> int:
        """min over rows of table[i][hashLong(item, i)] — Java 64-bit
        wrapping arithmetic reproduced with explicit masks."""
        est = None
        for i in range(self.depth):
            h = (self.hash_a[i] * (item & self._MASK64)) & self._MASK64
            h = (h + (h >> 32)) & self._MASK64
            h &= self._PRIME_MODULUS
            c = self.table[i][h % self.width]
            est = c if est is None else min(est, c)
        return est


def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters over user_id (the mergeable fixed-memory
    sketch for 100 TB streams — one aggregation pass builds the sketch;
    it is driver-sized BY DESIGN, so probing it driver-side crosses only
    the sketch, never data). Output is the dd9/v8 reshape made
    hash-checkable for an engine-specific sketch: the top-10 users by
    exact count with, per user, the CMS guarantees verified in-engine —
    never_underestimates (est ≥ exact, the deterministic one-sided
    bound) and within_eps (est ≤ exact + ε·N). The oracle reproduces the
    exact top-10 and asserts both verdicts literally, so the sketch's
    error contract sits in the driver's CORRECTNESS row rather than a
    pytest-only invariant."""
    e = _events(spark, sf_dir)
    eps, total = 0.001, e.count()
    sketch_bytes = bytes(
        e.agg(
            F.expr(f"count_min_sketch(user_id, {eps}d, 0.999d, 42)").alias("s")
        ).first().s
    )
    cms = _CountMinSketch(sketch_bytes)
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(10)
        .collect()
    )
    probed = [
        (
            r.user_id,
            r.exact_n,
            cms.estimate_count(r.user_id) >= r.exact_n,
            cms.estimate_count(r.user_id) <= r.exact_n + eps * total,
        )
        for r in top
    ]
    return spark.createDataFrame(
        probed,
        "user_id long, exact_n long, never_underestimates boolean, within_eps boolean",
    )


QUERIES.update(
    {
        "e5_hypertable_rollup": q_hypertable_rollup,
        "x3_countmin_sketch": q_countmin_heavy_hitters,
    }
)
ORACLES.update(
    {
        "e5_hypertable_rollup": """
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d, event_type, value
  FROM events)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_hour,
       strftime(d, '%Y-%m-%d %H:%M:%S') AS bucket_day,
       event_type, CAST(grouping(h) AS INTEGER) AS g_hour,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM b GROUP BY GROUPING SETS ((h, event_type), (d, event_type))""",
        # x3: sketch bytes are engine-specific; the oracle checks the
        # exact top-10 plus the literal CMS bound verdicts (dd9 reshape)
        "x3_countmin_sketch": """
SELECT user_id, count(*) AS exact_n,
       TRUE AS never_underestimates, TRUE AS within_eps
FROM events GROUP BY user_id
ORDER BY exact_n DESC, user_id LIMIT 10""",
    }
)


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j3: event ⋈ interval containment RANGE JOIN (the third custom
    join next to j2's as-of), on the bucketized rewrite
    (:func:`..operators.temporal.range_join_intervals`): intervals
    explode to the coarse time buckets they span, the match becomes an
    equi-join on bucket + a residual BETWEEN filter — never a
    theta-join comparing every pair (pytest pins bucketized ≡ naive).
    Intervals here are derived deterministically from the fixture
    (every 100th event opens a 3-hour window); output is the per-
    interval containment profile, so the oracle is a plain BETWEEN
    join + GROUP BY."""
    from ..operators.temporal import range_join_intervals

    e = _events(spark, sf_dir)
    ev = e.select("event_id", "ts")
    iv = e.filter(F.col("event_id") % 100 == 0).select(
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("interval 3 hours")).alias("end_ts"),
    )
    joined = range_join_intervals(ev, iv, "ts", "start_ts", "end_ts")
    return joined.groupBy("iv_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


QUERIES["j3_range_join"] = q_range_join
ORACLES["j3_range_join"] = """
WITH iv AS (
  SELECT event_id AS iv_id, ts AS start_ts, ts + INTERVAL 3 HOUR AS end_ts
  FROM events WHERE event_id % 100 = 0),
j AS (
  SELECT iv.iv_id, e.event_id
  FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts <= iv.end_ts)
SELECT iv_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM j GROUP BY iv_id"""

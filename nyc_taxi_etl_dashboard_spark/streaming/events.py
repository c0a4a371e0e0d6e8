"""Streaming operators over event data (NEW surface, SURVEY §2.10).

Contract (no reference semantics to match — defined + tested here):
- event time = ``ts``; late data tolerated up to the watermark delay,
  older rows dropped by the engine's state eviction.
- the valid/anomaly split (P7) becomes a ``foreachBatch`` dual-sink:
  one classification pass per micro-batch, two writes — the streaming
  twin of the batch ``split_valid_anomalies`` persist pattern.

Scale notes: stateful ops (windows, dedup, sessions) shard state by
group key across executors; watermark delay bounds state size. Use
``spark.sql.streaming.statefulOperator.stateRebalancing`` hints and
RocksDB state store in production for large keyspaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: explicit schema — streaming file sources require one (no inference
#: pass over an unbounded directory)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream over a directory of event parquet files (new
    files = new micro-batches; ``availableNow`` drains the backlog in
    tests)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(directory)


def windowed_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window counts + sums per event_type with late-data
    handling: rows older than the watermark are dropped, window state is
    evicted once the watermark passes the window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window mean value per event_type (each row contributes to
    window/slide overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "avg_value")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (state evicted past the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state for old keys is evicted
    (the streaming answer to D1 without unbounded key memory)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def anomaly_split_sink(
    events: DataFrame,
    valid_path: str,
    anomaly_path: str,
    checkpoint: str,
    value_max: float = 300.0,
):
    """P7 as a streaming dual-sink: classify each micro-batch once with
    the first-match CASE cascade, write valid and anomaly branches to
    separate parquet sinks inside one ``foreachBatch`` transaction-ish
    unit (single classification pass — the streaming equivalent of the
    batch persist, SURVEY §3.2)."""
    from ..operators.classify import Rule, classify

    rules = [
        Rule("Valeur invalide", F.col("value") <= 0),
        Rule("Valeur hors limites", F.col("value") > value_max),
        Rule("Horodatage manquant", F.col("ts").isNull()),
    ]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        classified = classify(batch_df, rules).persist()
        try:
            classified.filter(F.col("rejection_reason").isNull()).drop(
                "rejection_reason"
            ).write.mode("append").parquet(valid_path)
            classified.filter(F.col("rejection_reason").isNotNull()).write.mode(
                "append"
            ).parquet(anomaly_path)
        finally:
            classified.unpersist()

    return (
        events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def idempotent_batch_sink(
    events: DataFrame, out_path: str, checkpoint: str, log_path: str
):
    """foreachBatch parquet sink with a batch-id commit log.

    Spark guarantees foreachBatch is invoked at-LEAST-once per batch
    (sink-side retries, checkpoint replay after recovery) — exactly-once
    needs the sink itself to dedup on ``batch_id``. This is that
    pattern: a tiny commit log records every batch written; a replayed
    batch id is skipped before any data lands. Survives even checkpoint
    LOSS: a fresh checkpoint replays batch ids from 0, and the log —
    which lives with the DATA, not the checkpoint — rejects them.
    (Delta's txn table does exactly this under foreachBatch.)

    The data write itself is ALSO idempotent: each batch lands in its
    own ``batch=<id>`` partition directory with mode=overwrite, so the
    crash window between the data write and the log append cannot
    duplicate rows — a replay of an unlogged batch overwrites the same
    directory rather than appending beside it. The log remains the fast
    path (skip before any write) and the replay-safety proof for
    checkpoint loss; the partition layout is what makes the two
    non-atomic writes safe. Readers see a ``batch`` partition column.
    """
    import os

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(log_path):
            committed = {r.batch_id for r in spark.read.parquet(log_path).collect()}
            if batch_id in committed:
                return
        batch_df.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(log_path)

    return (
        events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def correlate_event_pairs(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    first_type: str = "view",
    then_type: str = "purchase",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream watermarked interval join: pair each ``first_type``
    event with the same user's ``then_type`` events that follow within
    ``within`` (the view→purchase funnel-correlation shape).

    Both sides carry a watermark AND the join condition bounds the two
    event times against each other — the two requirements that let Spark
    compute how long each side's state must live and evict it (without
    the time bound, stream-stream inner join state grows forever).
    State shape at scale: keyed by ``on``, sharded across executors;
    per-key state holds only rows younger than watermark + interval.

    ``how='left_outer'`` emits unmatched ``first_type`` events with NULL
    ``then_*`` columns (abandoned funnels) — but only once the watermark
    proves no match can still arrive, so rows near the stream head are
    withheld until a later trigger advances the watermark past their
    join window. That lag is the semantics, not a bug: emitting earlier
    could require retracting.
    """
    l = left.filter(F.col("event_type") == first_type).withWatermark("ts", watermark).alias("l")
    r = right.filter(F.col("event_type") == then_type).withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col("r.ts") > F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).select(
        F.col(f"l.{on}").alias(on),
        F.col("l.event_id").alias("first_event_id"),
        F.col("l.ts").alias("first_ts"),
        F.col("r.event_id").alias("then_event_id"),
        F.col("r.ts").alias("then_ts"),
    )


def enrich_with_static_dim(
    events: DataFrame, dim: DataFrame, on_left: str = "user_id", on_right: str = "c_custkey"
) -> DataFrame:
    """Stream-static join: each micro-batch joins against a static
    dimension snapshot. Spark plans this as a broadcast join per batch
    when the dim is small — no state, no watermark needed (the static
    side is re-read per batch if its source supports it, so slowly
    changing dims pick up updates on batch boundaries)."""
    return events.join(
        dim, events[on_left] == dim[on_right], "left"
    ).drop(on_right)

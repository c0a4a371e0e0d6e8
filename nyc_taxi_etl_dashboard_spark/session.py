"""SparkSession factory.

The reference is a single-threaded pandas pipeline (see
``reference:Scripts_ETL/extract.py:35-36``); here the equivalent surface is
a SparkSession configured for deterministic semantics (UTC timestamps,
en-US day names — the reference pins these implicitly by running pandas on
one machine) and for scale (AQE on, skew-join handling, sane shuffle
partitioning).

Scale posture (100 TB / 1000-executor notes)
--------------------------------------------
- ``spark.sql.adaptive.enabled``: runtime coalescing of shuffle
  partitions + skew-join splitting; mandatory at scale, harmless locally.
- ``spark.sql.shuffle.partitions``: locally 2x cores; on a real cluster
  this should be ~2-3x total executor cores or left to AQE's
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
- ``spark.sql.files.maxPartitionBytes`` stays at the 128m default: at
  100 TB that yields ~800k scan tasks, which is the right granularity for
  dynamic allocation; raise to 256m if the driver chokes on task count.
- Timestamps: the reference strips timezones (``extract.py:44``); we pin
  the session to UTC so TimestampType behaves as NTZ everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: floor for AQE's parallelism-first shuffle coalescing. With
#: ``parallelismFirst`` (default on) AQE targets
#: max(totalShuffleBytes / defaultParallelism, THIS FLOOR) per
#: partition — so a slim-row stage (id pairs, rank keys) whose
#: downstream per-row CPU is heavy (interpreted HOF folds, window
#: ranks) gets its parallelism capped at totalBytes/1MB on ANY cluster
#: size under the 1 MB default: a 20 MB candidate-pair shuffle
#: coalesces to ≤20 tasks while the other cores idle through the
#: verify fold. 256 KB lets parallelism-first actually deliver
#: parallelism for slim-row CPU-heavy stages; for byte-heavy stages
#: (where bytes/parallelism exceeds any floor) it changes nothing.
#: Measured at sf0.1 (median of 3): v6 2.43→1.78, v10_semantic 3.05→
#: 2.20, x26 5.56→4.06, t12 1.37→1.07, x25 3.70→2.99; 64 KB added
#: nothing beyond 256 KB. Env-overridable for cluster tuning.
MIN_PARTITION_SIZE = os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k")


def get_spark(
    app_name: str = "nyc-taxi-etl-dashboard-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's semantic pins."""
    master = master or f"local[{DEFAULT_CPUS}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_CPUS))
    jvm_opts = "-Duser.timezone=UTC -Duser.language=en -Duser.country=US"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            MIN_PARTITION_SIZE,
        )
        # bounded limit+collect probes (connected_components' local-path
        # head, capped-index heads) default to serial scale-up waves
        # (1 -> 4 -> 16 partitions; spark.sql.limit.scaleUpFactor) that
        # leave every other core idle while the probe's upstream — often
        # a full candidate-pair pipeline — computes in partition-sized
        # bites. One SCHEDULER WAVE is the right first bite at any
        # cluster size: measured 4.2 -> 1.9 s on the v10/x26 CC probe at
        # sf0.1 (optimization r18). Scale posture: the probe stays
        # bounded (early-exits once the limit is satisfied); the first
        # wave simply uses the parallelism the session already owns.
        .config("spark.sql.limit.initialNumPartitions", DEFAULT_CPUS)
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.driver.extraJavaOptions", jvm_opts)
        .config("spark.executor.extraJavaOptions", jvm_opts)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def pin_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable semantic pins to an externally-built session.

    Query entry points call this so results are deterministic even when the
    harness (not :func:`get_spark`) constructed the session: UTC timestamps
    and AQE on. Static confs (locale JVM opts) cannot be changed here; day
    name extraction uses locale-independent formatting instead (see
    ``functions.day_name``).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Spark 4 defaults ANSI on (division by zero raises); the reference's
    # pandas semantics are coercive (x/0 -> inf, unparseable -> NaT) and the
    # DuckDB oracle yields NULL on x/0 — non-ANSI Spark matches both
    # (x/0 -> NULL, failed casts -> NULL). Pin it off for parity.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        # events.parquet stores TIMESTAMP(NANOS) which Spark rejects
        # outright; read the raw int64 and convert (sources.readers)
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # limit-probe first wave = one scheduler wave, not a single
        # serial partition (see get_spark; value-neutral, perf-only)
        (
            "spark.sql.limit.initialNumPartitions",
            str(spark.sparkContext.defaultParallelism),
        ),
        # parallelism-first coalescing floor for slim-row CPU-heavy
        # stages (see MIN_PARTITION_SIZE above; value-neutral)
        (
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            MIN_PARTITION_SIZE,
        ),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some builds
            pass
    return spark

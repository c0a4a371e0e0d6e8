"""Sinks (SURVEY §2.1 S4-S9, S11).

Covers the reference's snappy Parquet sinks (``extract.py:61-66``,
``transform.py:118-121``), the timestamped anomaly side-output
(``transform.py:124-127``), the JSON run report (``transform.py:143-144``),
the JDBC append fact sink (``load.py:204-221``) and the
``ON CONFLICT DO NOTHING`` dim upsert (``load.py:121-123``), which has no
native ``df.write.jdbc`` equivalent and becomes a left-anti join + append.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def zorder_column(df: DataFrame, cols: list[str], bits: int = 12):
    """Morton (Z-order) key over numeric columns: min-max-quantize each
    column to ``bits`` bits (one tiny stats aggregate collected to the
    driver), then interleave the bits. Sorting by the result clusters
    the MULTI-dimensional space, so parquet min/max stats tighten on
    EVERY participating column at once — single-key range clustering
    (``cluster_by``) can only ever serve one column.

    ``bits * len(cols)`` must fit a signed 64-bit key (≤ 63). The
    quantization clamps, so rows outside the sampled min/max (e.g. when
    stats come from a stale sample) still map into the keyspace.
    Returns (key Column, stats dict) — the stats let callers reuse the
    quantizer across incremental writes.
    """
    from pyspark.sql import functions as F

    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    top = (1 << bits) - 1
    n = len(cols)
    z = F.lit(0).cast("bigint")
    stats: dict[str, tuple[float, float]] = {}
    for i, c in enumerate(cols):
        mn, mx = row[f"mn_{i}"], row[f"mx_{i}"]
        stats[c] = (mn, mx)
        span = (mx - mn) or 1.0
        q = ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span)) * F.lit(float(top))
        qi = F.least(F.greatest(q.cast("bigint"), F.lit(0)), F.lit(top))
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(qi, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z, stats


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    cluster_partitions: int | None = None,
    zorder_by: list[str] | None = None,
) -> None:
    """Snappy Parquet sink (S4/S5; snappy is Spark's default codec).

    ``partition_by`` replaces the reference's Postgres btree indexes
    (``load.py:62-67``): partitioning on a date column gives partition
    pruning for the dashboard's date-sliced queries. At 100 TB,
    partition on a low-cardinality date key (~365 partitions/year),
    never on a high-cardinality id.

    ``cluster_by`` is the second index analog plain Parquet offers:
    ``repartitionByRange`` + ``sortWithinPartitions`` lay files out as
    disjoint sorted ranges of the clustering key, so every file's (and
    row group's) min/max statistics form non-overlapping intervals and
    a range predicate on that key skips all but the relevant files at
    scan time — a clustered index built from layout alone. At 100 TB
    the combination is: partition on date, cluster within partitions on
    the hot slicer key (location, amount). Costs one range shuffle at
    write; reads repay it on every selective query.

    ``zorder_by`` is the multi-column variant (Morton interleave, see
    :func:`zorder_column`): when two+ columns are both hot slicers,
    Z-ordering tightens file min/max stats on all of them simultaneously
    — at the price of weaker per-column clustering than a dedicated
    single-key sort. Mutually exclusive with ``cluster_by`` in intent
    (``cluster_by`` wins if both are passed last).
    """
    if zorder_by:
        # multi-dimensional data skipping: range-shuffle + sort on the
        # Morton key; the projection dropping the key preserves the
        # per-partition order it bought
        z, _ = zorder_column(df, zorder_by)
        df = df.withColumn("__zorder", z)
        if cluster_partitions:
            df = df.repartitionByRange(cluster_partitions, "__zorder")
        else:
            df = df.repartitionByRange("__zorder")
        df = df.sortWithinPartitions("__zorder").drop("__zorder")
    if cluster_by:
        # explicit partition count available because AQE happily
        # coalesces a small range shuffle to one partition, collapsing
        # the clustering back into a single file
        if cluster_partitions:
            df = df.repartitionByRange(cluster_partitions, *cluster_by)
        else:
            df = df.repartitionByRange(*cluster_by)
        df = df.sortWithinPartitions(*cluster_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_parquet_timestamped(df: DataFrame, directory: str, prefix: str) -> str:
    """Timestamped side-output file, ``{prefix}_%Y%m%d_%H%M%S.parquet``
    (S6, ``transform.py:124-127``). Returns the path written."""
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    path = f"{directory}/{prefix}_{stamp}.parquet"
    df.write.mode("overwrite").parquet(path)
    return path


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (doc-only alternate target, README.md:34,37)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json_report(report: dict, path: str) -> None:
    """JSON run-report sink (S7, ``transform.py:143-144``).

    Driver-side by design: the report is a handful of scalar aggregates;
    collecting a 1-row aggregate to the driver is the correct pattern
    (collecting anything larger is not).
    """
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=4, ensure_ascii=False, default=str)


def write_jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None
) -> None:
    """JDBC append sink (S8, ``load.py:204-221``).

    Each Spark partition opens one connection and streams inserts; size
    partitions (`df.repartition(n)`) to the DB's connection budget.
    """
    df.write.jdbc(url=url, table=table, mode="append", properties=properties or {})


def write_jdbc_upsert(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
) -> None:
    """Insert-if-absent (S9): Spark equivalent of Postgres
    ``ON CONFLICT DO NOTHING`` (``load.py:121-123,134-136,144-146``).

    Reads existing keys, left-anti joins new rows against them, appends
    the remainder. Not transactional across the read+write (the reference
    runs inside one DB transaction, ``load.py:110``); for exactly-once
    semantics use a Delta/Iceberg ``MERGE INTO`` instead — this JDBC path
    exists for Postgres parity.
    """
    from .readers import read_jdbc

    try:
        existing = read_jdbc(spark, url, table, properties).select(*key_cols)
        # resolve the schema eagerly so a missing table surfaces here,
        # not inside the join
        existing.schema
    except Exception:
        # bootstrap: target doesn't exist yet -> everything is fresh
        # (the reference's DDL pre-creates tables, load.py:12-67; this
        # utility self-bootstraps instead)
        write_jdbc_append(df, url, table, properties)
        return
    fresh = df.join(existing, on=key_cols, how="left_anti")
    write_jdbc_append(fresh, url, table, properties)


def _qident(name: str) -> str:
    """Double-quote a COLUMN identifier (ADVICE r13: column/key names
    were interpolated unquoted, so a mixed-case or reserved-word column
    — legal in a staged DataFrame, and written QUOTED by Spark's own
    JDBC writer when it creates the staging table — produced broken or
    wrong-target statements; quoting matches the writer's own DDL).
    Embedded quotes are doubled per the SQL standard; control chars are
    rejected outright rather than smuggled into DDL."""
    if any(ord(c) < 0x20 for c in name):
        raise ValueError(f"control character in SQL identifier: {name!r}")
    return '"' + name.replace('"', '""') + '"'


import re as _re

#: table names pass through VERBATIM (possibly schema-qualified) but
#: must look like unquoted SQL table references. Deliberately NOT
#: quoted (round-14 review): Spark's JDBC writer interpolates the
#:  staging table name verbatim into its CREATE TABLE, so the database
#: case-folds it; quoting it here (case-preserving) would reference a
#: DIFFERENT relation for any mixed-case name, and quoting a
#: schema-qualified target as one identifier would break it. Verbatim
#: on both sides means writer and statements always fold identically.
_TABLE_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?$")


def _tident(name: str) -> str:
    if not _TABLE_RE.match(name):
        raise ValueError(
            f"unsafe SQL table name {name!r}: must match {_TABLE_RE.pattern}"
        )
    return name


def upsert_pushdown_sql(
    table: str,
    staging: str,
    columns: list[str],
    key_cols: list[str],
    dialect: str = "postgres",
) -> list[str]:
    """The single-round-trip upsert statements (S9 pushdown form,
    reference ``load.py:121-123``): executed AS ONE TRANSACTION after
    the frame is staged. Emitted, not inlined, so tests can pin the
    exact SQL without a Postgres server (DuckDB runs the same dialect —
    ``tests/test_sources.py::test_upsert_pushdown_sql_semantics``
    certifies the statements against the anti-join path's results).

    ``ON CONFLICT (keys) DO NOTHING`` requires a PRIMARY KEY or UNIQUE
    constraint on ``key_cols`` at the target (the reference's tables
    declare one, ``load.py:19-59`` / ``create_star_schema_sql``)."""
    if dialect != "postgres":
        raise ValueError(
            f"no ON CONFLICT pushdown for dialect {dialect!r}; "
            "use write_jdbc_upsert (anti-join form)"
        )
    cols = ", ".join(_qident(c) for c in columns)
    keys = ", ".join(_qident(k) for k in key_cols)
    return [
        f"INSERT INTO {_tident(table)} ({cols}) SELECT {cols} FROM {_tident(staging)} "
        f"ON CONFLICT ({keys}) DO NOTHING",
        f"DROP TABLE {_tident(staging)}",
    ]


def execute_jdbc_transaction(
    spark: SparkSession, url: str, statements: list[str],
    properties: dict[str, str] | None = None,
) -> None:
    """Run ``statements`` on the JDBC target in ONE driver-side
    transaction (autocommit off, commit at the end, rollback on any
    failure). Driver-side by design: these are DDL/set-based DML strings
    the DATABASE executes — no rows move through Spark."""
    jvm = spark.sparkContext._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            stmt.close()
    finally:
        conn.close()


def _staging_name(table: str, suffix: str) -> str:
    """``<table>_staging_<suffix>``, bounded to 63 bytes (ADVICE r14):
    PostgreSQL silently truncates identifiers at NAMEDATALEN-1 = 63
    (two long-named targets could collide post-truncation); other
    dialects reject outright. Past the limit the name collapses to a
    deterministic ``stg_<sha256(table|suffix)[:24]>`` — the same
    (table, run_id) still maps to the same staging name, so the
    retry-with-stable-run_id contract holds."""
    staging = f"{table}_staging_{suffix}"
    if len(staging) > 63:
        import hashlib

        digest = hashlib.sha256(f"{table}|{suffix}".encode()).hexdigest()[:24]
        staging = f"stg_{digest}"
    return staging


def write_jdbc_upsert_pushdown(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
    run_id: str | None = None,
    drop_staging_on_failure: bool = False,
) -> None:
    """Insert-if-absent with the dedup INSIDE the database (S9 pushdown
    form; VERDICT r12 item 4): stage the frame to
    ``<table>_staging_<run_id>`` over JDBC, then one ``INSERT ... SELECT
    ... ON CONFLICT (keys) DO NOTHING`` + staging drop as a single
    transaction.

    ``run_id`` names THIS invocation's staging table (ADVICE r13: a
    fixed ``<table>_staging`` + mode=overwrite let two concurrent
    upserts to the same target silently clobber each other's staged
    rows — the ON CONFLICT statement is atomic, but the staging step
    was not). Callers running concurrently MUST pass distinct run ids
    (validated ``[A-Za-z0-9_]+`` — the name flows into unquoted DDL);
    when omitted, a fresh UUID is generated, so the default is
    concurrency-safe and only the staging table's name is
    nondeterministic (it is dropped in the same transaction). Staging
    names longer than 63 bytes (PostgreSQL's NAMEDATALEN silently
    truncates there; other dialects reject) collapse to a
    deterministic ``stg_<sha256(table|run_id)[:24]>`` — still stable
    per (table, run_id), so retries reuse the same name.

    Failure semantics: if the pushdown transaction fails, its DROP
    rolls back with the INSERT and the staged table SURVIVES for
    inspection (the Derby boundary test pins this — target untouched,
    staged rows intact). A RETRY LOOP must therefore either pass a
    STABLE ``run_id`` (the retry's mode="overwrite" staging write then
    reuses the same name — no accumulation) or set
    ``drop_staging_on_failure=True`` to best-effort drop the staged
    table before re-raising; the UUID default plus retries without
    either would leak one uniquely-named staging table per failure.

    vs :func:`write_jdbc_upsert` (anti-join form): no read-back of
    existing keys, and ATOMIC against concurrent writers — the conflict
    check happens inside the database's own insert, under its row locks
    (the anti-join form can double-insert a key that lands between its
    read and its append). The anti-join form remains for backends
    without ON CONFLICT (Derby) and for when the target table has no
    unique constraint on the keys.

    No Postgres server exists in this environment, so the pushdown leg
    is certified two ways (tests/test_sources.py): the emitted SQL is
    pinned verbatim, and DuckDB — which implements the same ON CONFLICT
    dialect — executes it against staged rows and must reproduce the
    anti-join path's result exactly. The staging write + transaction
    machinery runs against embedded Derby with a dialect-legal
    statement list."""
    import uuid

    if run_id is not None and not _re.fullmatch(r"[A-Za-z0-9_]+", run_id):
        raise ValueError(
            f"unsafe run_id {run_id!r}: must match [A-Za-z0-9_]+ "
            "(it names a staging table in unquoted DDL)"
        )
    props = dict(properties or {})
    staging = _staging_name(table, run_id if run_id is not None else uuid.uuid4().hex[:12])
    _tident(staging)  # reject unsafe names BEFORE the staging write
    df.write.jdbc(url=url, table=staging, mode="overwrite", properties=props)
    try:
        execute_jdbc_transaction(
            spark,
            url,
            upsert_pushdown_sql(table, staging, df.columns, key_cols),
            props,
        )
    except Exception:
        if drop_staging_on_failure:
            try:
                execute_jdbc_transaction(
                    spark, url, [f"DROP TABLE {_tident(staging)}"], props
                )
            except Exception:  # pragma: no cover - best-effort cleanup
                pass
        raise


def merge_parquet(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_by: list[str] | None = None,
    stable_partition_keys: bool = False,
) -> dict[str, int]:
    """MERGE upsert onto a plain-parquet table (S9's "or Delta MERGE"
    alternative; this environment has no Delta/Iceberg, so this is the
    parquet-native fallback): matched keys are replaced by the source
    row, unmatched source rows insert, untouched target rows survive.

    Scale path (``partition_by`` set): only partitions containing source
    rows are rewritten — affected partitions are found with a broadcast
    semi-join, surviving target rows in them are kept via a left-anti
    join on the key, and Spark's dynamic partition overwrite commits
    just those directories. Cost scales with churned partitions, not
    table size — the same shape Delta MERGE executes for partitioned
    tables. The merged frame is localCheckpoint-ed first because Spark
    (correctly) refuses to overwrite a path it is still reading.

    Key-partition migration: if a matched key's target row can live in a
    DIFFERENT partition than its source row (the partition column is not
    derivable from the key), the old row's partition must also be
    rewritten or the stale row survives as a duplicate key. The default
    therefore widens the affected set with the partitions of target rows
    matching source keys — one keyed semi-join pass over the target
    (file-level stats pruning applies; the same pass Delta MERGE does to
    find matches). Callers whose partition columns are functionally
    dependent on the key — the hourly-rollup refresh, where bucket_day
    derives from the bucket_hour key — pass
    ``stable_partition_keys=True`` to skip that pass and keep cost
    strictly proportional to churned partitions.

    Full-table mode (no ``partition_by``) stages to a sibling directory
    and swaps — rewrite cost is the whole table, the honest price of
    keyed MERGE on unpartitioned parquet.

    Not transactional either way (a crash between delete and rename can
    strand the staging dir); production deployments that need ACID
    should use Delta/Iceberg MERGE INTO — this mirrors its semantics,
    not its commit protocol. Returns row counts {inserted_or_updated,
    kept}.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..operators import clear_nparts_memo

    clear_nparts_memo()  # this rewrite invalidates memoized scan widths
    if not os.path.exists(target_path):
        write_parquet(source, target_path, partition_by=partition_by)
        return {"inserted_or_updated": source.count(), "kept": 0}
    target = spark.read.parquet(target_path)
    source = source.select(*target.columns)  # align column order
    if partition_by:
        affected = source.select(*partition_by).distinct()
        if not stable_partition_keys:
            # a key may have migrated partitions: its old partition must
            # be rewritten too, or the stale row survives the merge
            affected = (
                affected.unionByName(
                    target.join(
                        F.broadcast(source.select(*keys).distinct()), keys, "left_semi"
                    )
                    .select(*partition_by)
                    .distinct()
                )
                .distinct()
            )
        in_scope = target.join(F.broadcast(affected), partition_by, "left_semi")
        kept = in_scope.join(source.select(*keys).distinct(), keys, "left_anti")
        merged = source.unionByName(kept).localCheckpoint(eager=True)
        # counts must resolve BEFORE the overwrite invalidates the lazy
        # reads of the target's current files; the partition sets are
        # collected now for the same reason (both are broadcast-small by
        # the operator's own contract)
        counts = {"inserted_or_updated": source.count(), "kept": kept.count()}
        affected_parts = {
            tuple(str(v) for v in r) for r in affected.collect()
        }
        merged_parts = {
            tuple(str(v) for v in r)
            for r in merged.select(*partition_by).distinct().collect()
        }
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(*partition_by).parquet(target_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # dynamic overwrite only replaces partitions it writes rows INTO:
        # an affected partition whose every row migrated away gets no
        # rewrite and would keep its stale files — drop those directories
        for vals in affected_parts - merged_parts:
            stale = os.path.join(
                target_path, *[f"{c}={v}" for c, v in zip(partition_by, vals)]
            )
            shutil.rmtree(stale, ignore_errors=True)
        return counts
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    merged = source.unionByName(kept)
    staging = target_path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    counts = {"inserted_or_updated": source.count(), "kept": kept.count()}
    shutil.rmtree(target_path)
    os.rename(staging, target_path)
    return counts


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> dict[str, int]:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_mb``-sized files via a staging swap. Streaming sinks
    and frequent incremental appends accumulate tiny files whose
    per-file open/footer cost eventually dominates scans; periodic
    compaction is the standard fix (what Delta's OPTIMIZE does).

    File count is sized from the directory's actual bytes — never a
    fixed coalesce(1), which would serialize a large table through one
    task. Returns {files_before, files_after}. Same non-transactional
    caveat as :func:`merge_parquet` full-table mode.

    Layout-preserving (round 14): a Hive-partitioned table (the
    batch_id-partitioned state warehouses) is rewritten WITH its
    partition columns — a flat rewrite would leave plain part-files
    where the next partition-scoped merge expects ``col=value``
    directories, and Spark's partition discovery rejects the mixed
    layout outright. Partition columns are inferred from the first
    directory level's ``name=value`` pattern (how Spark itself
    discovers them).
    """
    import glob
    import os
    import shutil

    from ..operators import clear_nparts_memo

    clear_nparts_memo()  # this rewrite invalidates memoized scan widths
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    part_cols: list[str] = []
    probe = path
    while True:  # walk nested col=value levels
        subdirs = [
            d for d in os.listdir(probe)
            if os.path.isdir(os.path.join(probe, d)) and "=" in d
        ]
        if not subdirs:
            break
        part_cols.append(subdirs[0].split("=", 1)[0])
        probe = os.path.join(probe, subdirs[0])
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact"
    writer = df.repartition(n_out, *part_cols) if part_cols else df.repartition(n_out)
    if part_cols:
        writer.write.mode("overwrite").partitionBy(*part_cols).parquet(staging)
    else:
        writer.write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    after = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return {"files_before": len(files), "files_after": len(after)}


def create_star_schema_sql(dialect: str = "spark") -> list[str]:
    """DDL for the star schema (S11, mirrors ``load.py:19-59``).

    ``dialect="spark"`` (default): Spark-managed parquet tables.
    Postgres ``SERIAL`` surrogate keys don't distribute; the engine mints
    keys itself (see ``operators.star``) so the DDL declares plain BIGINT
    key columns. ``CHECK`` constraints become validation filters at write
    time (Spark SQL tables don't enforce CHECK): ``etl.load`` applies
    ``operators.cleanse.validate_domain`` with ``FACT_TRIPS_CHECKS`` and
    quarantines violations to ``fact_trips_rejects`` instead of loading
    them. The reference's btree indexes (``load.py:62-67``) map to the
    fact's pickup-date partitioning (see ``sources.write_parquet``).

    ``dialect="postgres"`` (VERDICT r13 item 7): the DEPLOYMENT-target
    DDL a Postgres warehouse runs before the JDBC loads — the
    reference's types and CHECK/UNIQUE/REFERENCES constraints
    (``load.py:19-59``) minus its ``SERIAL``/``BIGSERIAL`` (keys stay
    engine-minted BIGINTs on every backend, so no sequence semantics
    differ between test and production). The CHECKs are a DB-side
    backstop: the engine still quarantines violations BEFORE the write,
    so behavior is identical whether or not the target enforces them.
    Pinned by tests/test_sources.py alongside the ``PostgresDialect``/
    ``DerbyDialect`` column-type mapping of the JDBC writer itself.
    """
    if dialect == "postgres":
        return [
            """CREATE TABLE IF NOT EXISTS dim_time (
                time_pk BIGINT PRIMARY KEY,
                datetime TIMESTAMP UNIQUE NOT NULL,
                hour SMALLINT NOT NULL CHECK (hour BETWEEN 0 AND 23),
                day_of_week VARCHAR(9) NOT NULL,
                time_period VARCHAR(20) NOT NULL)""",
            """CREATE TABLE IF NOT EXISTS dim_location (
                location_pk BIGINT PRIMARY KEY,
                location_id INTEGER UNIQUE NOT NULL,
                borough VARCHAR(50) NOT NULL DEFAULT 'Inconnu')""",
            """CREATE TABLE IF NOT EXISTS dim_payment (
                payment_pk BIGINT PRIMARY KEY,
                payment_type VARCHAR(20) UNIQUE NOT NULL)""",
            """CREATE TABLE IF NOT EXISTS fact_trips (
                trip_id BIGINT PRIMARY KEY,
                time_pk BIGINT NOT NULL REFERENCES dim_time(time_pk),
                pickup_loc_pk BIGINT NOT NULL REFERENCES dim_location(location_pk),
                dropoff_loc_pk BIGINT NOT NULL REFERENCES dim_location(location_pk),
                payment_pk BIGINT NOT NULL REFERENCES dim_payment(payment_pk),
                passenger_count SMALLINT CHECK (passenger_count > 0),
                trip_distance NUMERIC(8,2) CHECK (trip_distance > 0),
                fare_amount NUMERIC(8,2) CHECK (fare_amount > 0),
                total_amount NUMERIC(8,2) CHECK (total_amount > 0),
                duration_min NUMERIC(8,2) CHECK (duration_min > 0),
                avg_speed NUMERIC(8,2) CHECK (avg_speed > 0))""",
        ]
    if dialect != "spark":
        raise ValueError(f"unknown dialect: {dialect!r}")
    return [
        """CREATE TABLE IF NOT EXISTS dim_time (
            time_pk BIGINT, datetime TIMESTAMP, hour SMALLINT,
            day_of_week STRING, time_period STRING) USING PARQUET""",
        """CREATE TABLE IF NOT EXISTS dim_location (
            location_pk BIGINT, location_id INT, borough STRING) USING PARQUET""",
        """CREATE TABLE IF NOT EXISTS dim_payment (
            payment_pk BIGINT, payment_type STRING) USING PARQUET""",
        """CREATE TABLE IF NOT EXISTS fact_trips (
            trip_id BIGINT, time_pk BIGINT, pickup_loc_pk BIGINT,
            dropoff_loc_pk BIGINT, payment_pk BIGINT,
            passenger_count SMALLINT, trip_distance DECIMAL(8,2),
            fare_amount DECIMAL(8,2), total_amount DECIMAL(8,2),
            duration_min DECIMAL(8,2), avg_speed DECIMAL(8,2))
            USING PARQUET""",
    ]

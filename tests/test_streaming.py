"""Structured Streaming contract tests (no SQL oracle possible — these
assert streaming results equal their batch twins, plus watermark/dedup
semantics the engine defines)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    """Stream input dir seeded with the events table re-encoded to
    microsecond timestamps (raw fixture is TIMESTAMP(NANOS), which no
    Spark schema can declare; production streams read Spark-written
    files anyway)."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table

    staging = tmp_path / "staging"
    read_table(spark, sf_dir, "events").coalesce(1).write.parquet(str(staging))
    dst = tmp_path / "events_stream"
    dst.mkdir()
    shutil.copy(next(staging.glob("part-*.parquet")), dst / "part-000.parquet")
    return str(dst)


def _drain(writer, spark, name):
    q = writer.format("memory").queryName(name).trigger(availableNow=True).start()
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    from nyc_taxi_etl_dashboard_spark.plans.events import q_tumbling_counts
    from nyc_taxi_etl_dashboard_spark.streaming import read_events_stream, windowed_counts

    stream = windowed_counts(read_events_stream(spark, events_dir))
    got = _drain(stream.writeStream.outputMode("complete"), spark, "wc")
    got = got.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )
    want = q_tumbling_counts(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_counts_match_batch_sessionize(spark, sf_dir, events_dir):
    from nyc_taxi_etl_dashboard_spark.plans.events import q_sessionize
    from nyc_taxi_etl_dashboard_spark.streaming import read_events_stream, session_counts

    stream = session_counts(read_events_stream(spark, events_dir))
    got = _drain(stream.writeStream.outputMode("complete"), spark, "sc")
    got_rows = sorted(
        (r.user_id, r.session_start.strftime("%Y-%m-%d %H:%M:%S"), r.n_events)
        for r in got.collect()
    )
    want_rows = sorted(
        (r.user_id, r.session_start, r.n_events) for r in q_sessionize(spark, sf_dir).collect()
    )
    assert got_rows == want_rows


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    from nyc_taxi_etl_dashboard_spark.streaming import dedup_within_watermark, read_events_stream

    # plant duplicates: second file repeats the first file's rows
    shutil.copy(f"{events_dir}/part-000.parquet", f"{events_dir}/part-001.parquet")
    stream = dedup_within_watermark(read_events_stream(spark, events_dir))
    got = _drain(stream.writeStream.outputMode("append"), spark, "dd")
    n_unique = spark.read.parquet(f"{events_dir}/part-000.parquet").count()
    assert got.count() == n_unique


def test_anomaly_split_sink(spark, sf_dir, events_dir, tmp_path):
    from nyc_taxi_etl_dashboard_spark.streaming import anomaly_split_sink, read_events_stream

    valid_p = str(tmp_path / "valid")
    anom_p = str(tmp_path / "anomalies")
    ckpt = str(tmp_path / "ckpt")
    q = anomaly_split_sink(
        read_events_stream(spark, events_dir), valid_p, anom_p, ckpt, value_max=150.0
    ).start()
    q.awaitTermination(120)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_total = batch.count()
    n_anom_expected = batch.filter(
        (F.col("value") <= 0) | (F.col("value") > 150.0) | F.col("ts").isNull()
    ).count()
    valid = spark.read.parquet(valid_p)
    anom = spark.read.parquet(anom_p)
    assert valid.count() + anom.count() == n_total
    assert anom.count() == n_anom_expected
    assert "rejection_reason" in anom.columns
    assert "rejection_reason" not in valid.columns


def test_late_rows_dropped_by_watermark(spark, events_dir, tmp_path):
    """Engine contract for late data: once the watermark has PROPAGATED
    (Spark applies the late-event filter with one micro-batch of lag —
    the filter uses the previous batch's watermark), rows older than the
    delay are dropped. Batch 1's late row slips through (wm not yet
    applied), batch 2's identical-lateness row must be dropped."""
    from nyc_taxi_etl_dashboard_spark.streaming import windowed_counts
    from nyc_taxi_etl_dashboard_spark.streaming.events import EVENTS_SCHEMA

    base = spark.read.parquet(f"{events_dir}/part-000.parquet")
    max_ts = base.agg(F.max("ts")).collect()[0][0]
    for i in (1, 2):
        late = spark.createDataFrame(
            [
                (
                    999990 + i,
                    max_ts.replace(year=max_ts.year - i),
                    1,
                    f"late_type_{i}",
                    1.0,
                    "{}",
                )
            ],
            schema=EVENTS_SCHEMA,
        )
        late_dir = tmp_path / f"late{i}"
        late.coalesce(1).write.parquet(str(late_dir))
        # names sort after part-000 => maxFilesPerTrigger=1 gives each its
        # own later micro-batch
        shutil.copy(next(late_dir.glob("part-*.parquet")), f"{events_dir}/part-00{i}.parquet")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    q = (
        windowed_counts(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("late_wc")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    got = spark.table("late_wc")
    assert got.filter(F.col("event_type") == "late_type_2").count() == 0
    assert dropped >= 1


def test_sliding_avg_matches_batch(spark, sf_dir, events_dir):
    """Sliding windows (10m window / 5m slide): streaming complete-mode
    result equals the batch twin."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.streaming import read_events_stream
    from nyc_taxi_etl_dashboard_spark.streaming.events import sliding_avg

    stream = sliding_avg(read_events_stream(spark, events_dir))
    got = _drain(stream.writeStream.outputMode("complete"), spark, "sl")
    batch = read_table(spark, sf_dir, "events")
    want = (
        batch.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "avg_value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_static_join_enrichment(spark, sf_dir, events_dir):
    """Stream-static join: streamed events enriched with the customer
    dim equal the batch join."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.streaming import read_events_stream
    from nyc_taxi_etl_dashboard_spark.streaming.events import enrich_with_static_dim

    dim = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    stream = enrich_with_static_dim(read_events_stream(spark, events_dir), dim)
    got = _drain(
        stream.select("event_id", "user_id", "c_mktsegment").writeStream.outputMode(
            "append"
        ),
        spark,
        "enr",
    )
    batch = read_table(spark, sf_dir, "events").join(
        dim, F.col("user_id") == F.col("c_custkey"), "left"
    )
    want = sorted(
        (r.event_id, r.user_id, r.c_mktsegment)
        for r in batch.select("event_id", "user_id", "c_mktsegment").collect()
    )
    assert sorted(map(tuple, got.collect())) == want


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    """Stream-stream watermarked interval join (view -> purchase within
    10 minutes per user) equals the batch twin, availableNow-drained."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.streaming import (
        correlate_event_pairs,
        read_events_stream,
    )

    stream = correlate_event_pairs(
        read_events_stream(spark, events_dir), read_events_stream(spark, events_dir)
    )
    got = _drain(stream.writeStream.outputMode("append"), spark, "ssj")
    batch = read_table(spark, sf_dir, "events")
    l = batch.filter(F.col("event_type") == "view").alias("l")
    r = batch.filter(F.col("event_type") == "purchase").alias("r")
    want = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") > F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 minutes")),
            "inner",
        )
        .select(
            F.col("l.user_id"),
            F.col("l.event_id").alias("first_event_id"),
            F.col("r.event_id").alias("then_event_id"),
        )
        .collect()
    )
    got_rows = sorted((r.user_id, r.first_event_id, r.then_event_id) for r in got.collect())
    want_rows = sorted(map(tuple, want))
    assert len(want_rows) > 0, "fixture has no view->purchase pairs in-interval"
    assert got_rows == want_rows


def test_stream_stream_left_outer_join_sound(spark, sf_dir, events_dir):
    """Left-outer stream-stream join: every emitted row must be correct
    vs the batch left join (matches identical; null-rows only for
    genuinely unmatched views), and the inner pairs must all be present.
    Null-rows near the stream head may be withheld (watermark hasn't
    proven them unmatched) — soundness is asserted, completeness only
    for the matched subset."""
    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.streaming import (
        correlate_event_pairs,
        read_events_stream,
    )

    stream = correlate_event_pairs(
        read_events_stream(spark, events_dir),
        read_events_stream(spark, events_dir),
        how="left_outer",
    )
    got = _drain(stream.writeStream.outputMode("append"), spark, "ssj_outer")
    rows = got.collect()
    batch = read_table(spark, sf_dir, "events")
    l = batch.filter(F.col("event_type") == "view").alias("l")
    r = batch.filter(F.col("event_type") == "purchase").alias("r")
    joined = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") > F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 minutes")),
        "left_outer",
    ).select(
        F.col("l.event_id").alias("first_event_id"),
        F.col("r.event_id").alias("then_event_id"),
    )
    want_pairs = {
        (x.first_event_id, x.then_event_id)
        for x in joined.filter(F.col("then_event_id").isNotNull()).collect()
    }
    want_unmatched = {
        x.first_event_id
        for x in joined.filter(F.col("then_event_id").isNull()).collect()
    }
    got_pairs = {
        (x.first_event_id, x.then_event_id) for x in rows if x.then_event_id is not None
    }
    got_nulls = {x.first_event_id for x in rows if x.then_event_id is None}
    assert got_pairs == want_pairs  # matched subset complete + correct
    assert got_nulls <= want_unmatched  # null emissions sound
    assert len(got_nulls) > 0, "watermark should have proven some views unmatched"


def test_checkpoint_recovery_processes_only_new_files(spark, events_dir, tmp_path):
    """Exactly-once file-source semantics across restarts: a second
    query started on the SAME checkpoint must skip everything already
    committed and process only files that arrived in between — the sink
    ends up equal to one batch pass over all input, no duplicates."""
    import shutil as sh

    from nyc_taxi_etl_dashboard_spark.streaming import read_events_stream

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            read_events_stream(spark, events_dir)
            .select("event_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    base = spark.read.parquet(f"{events_dir}/part-000.parquet")
    staging = tmp_path / "extra"
    base.withColumn("event_id", F.col("event_id") + 1_000_000).coalesce(1).write.parquet(
        str(staging)
    )
    sh.copy(next(staging.glob("part-*.parquet")), f"{events_dir}/part-001.parquet")
    run_once()
    final = spark.read.parquet(out)
    assert final.count() == 2 * n1  # old file NOT reprocessed
    assert final.select("event_id").distinct().count() == 2 * n1


def test_streaming_corpus_curation_matches_batch(spark, sf_dir, tmp_path):
    """Streaming curation (quality gate + fingerprint dedup) over a
    drained backlog — including a second file that re-delivers the same
    texts under new doc_ids — keeps exactly one doc per fingerprint
    among quality survivors, matching the batch chain's first two
    stages."""
    from nyc_taxi_etl_dashboard_spark.functions import poly_fingerprint
    from nyc_taxi_etl_dashboard_spark.operators.text import tokens
    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        curate_documents_stream,
        read_documents_stream,
    )

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    staging = tmp_path / "staging"
    docs.coalesce(1).write.parquet(str(staging))
    shutil.copy(next(staging.glob("part-*.parquet")), stream_dir / "part-000.parquet")
    # re-delivery: same texts, new ids, slightly later arrival
    redeliver = docs.withColumn("doc_id", F.col("doc_id") + 10_000).withColumn(
        "ingest_ts", F.col("ingest_ts") + F.expr("INTERVAL 10 seconds")
    )
    staging2 = tmp_path / "staging2"
    redeliver.coalesce(1).write.parquet(str(staging2))
    shutil.copy(next(staging2.glob("part-*.parquet")), stream_dir / "part-001.parquet")

    out = _drain(
        curate_documents_stream(
            read_documents_stream(spark, str(stream_dir))
        ).writeStream.outputMode("append"),
        spark,
        "curated_docs",
    )
    got_fps = [r.fp for r in out.select("fp").collect()]
    assert len(got_fps) == len(set(got_fps)), "duplicate fingerprints emitted"
    want = (
        docs.filter(F.array_size(F.split("text", " ")) >= 20)
        .withColumn("fp", poly_fingerprint(tokens("text")))
        .select("fp")
        .distinct()
        .count()
    )
    assert len(got_fps) == want


def test_idempotent_sink_survives_checkpoint_loss(spark, events_dir, tmp_path):
    """The batch-id commit log makes the foreachBatch sink exactly-once
    even when the CHECKPOINT is lost: a fresh checkpoint replays batch 0,
    the log (living with the data) rejects it, and the sink stays
    duplicate-free."""
    import shutil as sh

    from nyc_taxi_etl_dashboard_spark.streaming import read_events_stream
    from nyc_taxi_etl_dashboard_spark.streaming.events import idempotent_batch_sink

    out = str(tmp_path / "out")
    log = str(tmp_path / "commitlog")
    ckpt1, ckpt2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")

    def run(ckpt):
        q = idempotent_batch_sink(
            read_events_stream(spark, events_dir), out, ckpt, log
        ).start()
        q.awaitTermination(120)

    run(ckpt1)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    sh.rmtree(ckpt1)  # simulate checkpoint loss
    run(ckpt2)  # fresh checkpoint => batch 0 REPLAYS with the same id
    assert spark.read.parquet(out).count() == n1  # log rejected the replay


def test_transform_with_state_running_totals(spark, sf_dir, events_dir, tmp_path):
    """transformWithStateInPandas (typed ValueState, RocksDB provider):
    after draining the backlog, the LAST emitted row per user equals the
    batch per-user totals — per-key state accumulated correctly across
    micro-batches."""
    import pytest as _pytest

    from pyspark.sql.group import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        _pytest.skip("transformWithStateInPandas not available")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        _pytest.skip(
            "transformWithState's state protocol needs google.protobuf, "
            "absent in this container (no pip installs); "
            "applyInPandasWithState (test_scale_ops) is the tested "
            "arbitrary-stateful surface here"
        )
    from nyc_taxi_etl_dashboard_spark.sources import read_table
    from nyc_taxi_etl_dashboard_spark.streaming import read_events_stream
    from nyc_taxi_etl_dashboard_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        running_totals_stateful,
    )

    # two DISJOINT half-files + maxFilesPerTrigger=1 => every user's
    # state must accumulate across micro-batches, not within one
    events = read_table(spark, sf_dir, "events")
    src = tmp_path / "tw_src"
    src.mkdir()
    for i, half in enumerate(
        (events.filter(F.col("event_id") % 2 == 0), events.filter(F.col("event_id") % 2 == 1))
    ):
        staging = tmp_path / f"tw_staging{i}"
        half.coalesce(1).write.parquet(str(staging))
        import shutil as _sh

        _sh.copy(next(staging.glob("part-*.parquet")), src / f"part-00{i}.parquet")

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = running_totals_stateful(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("twstate")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        emitted = spark.table("twstate")
        # update mode re-emits per batch: keep each user's LAST emission
        final = {r.user_id: (r.n, r.total) for r in emitted.collect()}
        for r in emitted.collect():
            prev = final[r.user_id]
            if r.n > prev[0]:
                final[r.user_id] = (r.n, r.total)
        batch = (
            read_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )
        want = {r.user_id: (r.n, r.total) for r in batch.collect()}
        assert set(final) == set(want)
        for uid, (n, total) in want.items():
            assert final[uid][0] == n
            assert abs(final[uid][1] - total) < 1e-6
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)


def test_streaming_incremental_dedup_drops_near_dups_across_batches(spark, tmp_path):
    """The streaming dd11 sink: batch 0 seeds the signature table; batch
    1 carries a NEAR-dup of a batch-0 survivor (new id, one word
    changed — invisible to fingerprint dedup) plus a novel doc. The
    near-dup is dropped against the on-disk signature history and only
    the novel doc's signatures are appended."""
    from pyspark.sql import functions as F  # noqa: F811

    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        incremental_dedup_sink,
        read_documents_stream,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    novel = "fresh reporting on tidal energy projects along the remote northern shoreline communities"

    def doc_rows(rows):
        return spark.createDataFrame(
            [
                (i, t, "en", "srcX", len(t), None)
                for i, t in rows
            ],
            DOCS_STREAM_SCHEMA,
        ).withColumn("ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    table = str(tmp_path / "sig_warehouse")
    sink, stats = incremental_dedup_sink(table)

    import shutil

    def deliver(name, rows):
        staging = tmp_path / f"stage_{name}"
        doc_rows(rows).coalesce(1).write.parquet(str(staging))
        shutil.copy(next(staging.glob("part-*.parquet")), stream_dir / f"{name}.parquet")

    deliver("b0", [(1, base), (2, novel)])
    q = (
        read_documents_stream(spark, str(stream_dir))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(table).count() == 2

    deliver("b1", [(10, base.replace("today", "tonight")),
                   (11, "entirely new subject matter concerning alpine railway tunnel ventilation systems design")])
    q = (
        read_documents_stream(spark, str(stream_dir))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    table_ids = {r.doc_id for r in spark.read.parquet(table).select("doc_id").collect()}
    assert table_ids == {1, 2, 11}, table_ids  # 10 dropped as near-dup of 1
    totals = [(kept, dropped) for _, kept, dropped in stats["batches"]]
    assert (2, 0) in totals and (1, 1) in totals, stats["batches"]


def _planted_vec(base: int, noise: int | None = None) -> list[float]:
    """Deterministic 64-dim vector; ``noise`` yields a paraphrase-grade
    perturbation (cosine >= 0.97 against its base)."""
    import math

    v = [math.sin(0.7 * base * 64 + 1.3 * j) for j in range(64)]
    if noise is not None:
        v = [x + 0.08 * math.sin(2.1 * base + 0.9 * noise + 0.37 * j) for j, x in enumerate(v)]
    return v


def test_streaming_semantic_dedup_one_survivor_per_cluster(spark, tmp_path):
    """The streaming v10 (VERDICT r7 item 6): batch 0 seeds the vector
    warehouse with three cluster bases plus their own first members;
    batch 1 re-delivers PARAPHRASE vectors (new ids, small
    perturbations — invisible to any fingerprint, cosine >= threshold)
    plus one novel vector. Every paraphrase is dropped against the
    persisted history; exactly one survivor per semantic cluster
    remains in the warehouse, and the novel vector is admitted. The
    sink never collects data — stats are scalar counts."""
    import math

    from pyspark.sql import functions as F  # noqa: F811

    from nyc_taxi_etl_dashboard_spark.streaming.documents import semantic_dedup_sink

    schema = "vec_id long, embedding array<double>, ingest_ts timestamp"

    def vec_rows(rows):
        return spark.createDataFrame(
            [(i, v, None) for i, v in rows], schema
        ).withColumn("ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("vec_id")))

    # sanity: the perturbations really are paraphrase-grade
    for b in range(3):
        base, pert = _planted_vec(b), _planted_vec(b, noise=1)
        cos = sum(x * y for x, y in zip(base, pert)) / (
            math.sqrt(sum(x * x for x in base)) * math.sqrt(sum(x * x for x in pert))
        )
        assert cos >= 0.92, (b, cos)

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    table = str(tmp_path / "vec_warehouse")
    sink, stats = semantic_dedup_sink(table, threshold=0.92)

    import shutil

    def deliver(name, rows):
        staging = tmp_path / f"stage_{name}"
        vec_rows(rows).coalesce(1).write.parquet(str(staging))
        shutil.copy(next(staging.glob("part-*.parquet")), stream_dir / f"{name}.parquet")

    def run():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(stream_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    deliver("b0", [(i, _planted_vec(i)) for i in range(3)])
    run()
    assert spark.read.parquet(table).count() == 3

    # batch 1: two paraphrases per cluster + one novel vector
    b1 = [(100 + 10 * b + n, _planted_vec(b, noise=n)) for b in range(3) for n in (1, 2)]
    # novel = base 3: the sinusoid family's cosine is ~cos(phase gap),
    # and base 3 sits >0.8 rad from every seeded base (max cos 0.67);
    # an arbitrary base id can alias back onto a seeded phase (77 lands
    # 0.19 rad from base 0 ⇒ cosine 0.98 — a near-dup by construction)
    b1.append((999, _planted_vec(3)))
    deliver("b1", b1)
    run()
    ids = {r.vec_id for r in spark.read.parquet(table).select("vec_id").collect()}
    assert ids == {0, 1, 2, 999}, ids  # one survivor per cluster + the novel
    totals = [(kept, dropped) for _, kept, dropped in stats["batches"]]
    assert (3, 0) in totals and (1, 6) in totals, stats["batches"]

    # replay safety: re-running the last epoch's sink directly (merge
    # landed, checkpoint lost) reproduces its verdicts
    sink(vec_rows(b1), 1)
    assert stats["batches"][-1][1:] == (1, 6), stats["batches"]
    assert {r.vec_id for r in spark.read.parquet(table).select("vec_id").collect()} == {0, 1, 2, 999}


def test_streaming_incremental_dedup_replay_reproduces_verdicts(spark, tmp_path):
    """The crash-window replay (ADVICE r7): if the process dies BETWEEN
    the warehouse merge and the checkpoint commit, foreachBatch re-runs
    the same batch — which now sees its OWN just-merged signatures in
    the warehouse. The same-doc_id candidate exclusion in
    incremental_dedup must make the replay reproduce the original
    verdicts (same kept/dropped counts, idempotent table state) instead
    of flagging the whole batch as duplicates of itself."""
    from pyspark.sql import functions as F  # noqa: F811

    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        incremental_dedup_sink,
    )

    table = str(tmp_path / "sig_warehouse")
    sink, stats = incremental_dedup_sink(table)
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the old river bank today", "en", "srcX", 70, None),
            (2, "fresh reporting on tidal energy projects along the remote northern shoreline communities", "en", "srcX", 80, None),
        ],
        DOCS_STREAM_SCHEMA,
    ).withColumn("ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))

    sink(batch, 0)          # original delivery: merge lands
    sink(batch, 0)          # replay of the SAME epoch after a simulated crash
    assert [b[1:] for b in stats["batches"]] == [(2, 0), (2, 0)], stats["batches"]
    assert spark.read.parquet(table).count() == 2  # merge is key-idempotent


def test_streaming_bloom_decontamination_drops_benchmark_overlap(spark, tmp_path):
    """The streaming t15 sink: a static benchmark set seeds the bitset
    once; batches containing verbatim benchmark passages are dropped,
    clean docs pass, and a replayed epoch rewrites its directory with
    identical content (pure function of batch + static bitset)."""
    from pyspark.sql import functions as F  # noqa: F811

    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        bloom_decontaminate_sink,
        read_documents_stream,
    )

    bench_text = "what is the capital of france the capital of france is paris city"
    clean_text = "fresh reporting on tidal energy projects along the remote northern shoreline communities"
    leak_text = "contest answer what is the capital of france the capital of france is paris city verbatim"

    eval_docs = spark.createDataFrame(
        [(9000, bench_text)], "doc_id long, text string"
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, t, "en", "srcX", len(t), None) for i, t in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    out = str(tmp_path / "curated")
    sink, stats = bloom_decontaminate_sink(eval_docs, out)

    import shutil

    def deliver(name, rows):
        staging = tmp_path / f"stage_{name}"
        doc_rows(rows).coalesce(1).write.parquet(str(staging))
        shutil.copy(
            next(staging.glob("part-*.parquet")), stream_dir / f"{name}.parquet"
        )

    deliver("b0", [(1, clean_text), (2, leak_text)])
    q = (
        read_documents_stream(spark, str(stream_dir))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = spark.read.parquet(f"{out}/epoch=0")
    assert {r.doc_id for r in kept.collect()} == {1}  # leak dropped
    assert stats["batches"] == [(0, 1, 1)]

    # replay epoch 0 (simulated): same batch re-runs, directory is
    # rewritten with the same survivor set
    batch0 = doc_rows([(1, clean_text), (2, leak_text)])
    sink(batch0, 0)
    kept2 = spark.read.parquet(f"{out}/epoch=0")
    assert {r.doc_id for r in kept2.collect()} == {1}
    assert stats["batches"][-1] == (0, 1, 1)


def test_streaming_domain_quota_enforces_running_cap(spark, tmp_path):
    """The streaming x10 sink: srcA has quota 3; batch 0 consumes 2 of
    it, batch 1 brings 2 more srcA docs (only 1 fits) plus an
    under-quota srcB doc. A replayed batch 1 excludes its own state row
    and reproduces the identical keep-set and counts."""
    from pyspark.sql import functions as F  # noqa: F811

    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        domain_quota_sink,
        read_documents_stream,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, f"text {i}", "en", s, 10, None) for i, s in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    state = str(tmp_path / "quota_state")
    out = str(tmp_path / "balanced")
    sink, stats = domain_quota_sink(state, out, quota={"srcA": 3})

    import shutil

    def deliver(name, rows):
        staging = tmp_path / f"stage_{name}"
        doc_rows(rows).coalesce(1).write.parquet(str(staging))
        shutil.copy(
            next(staging.glob("part-*.parquet")), stream_dir / f"{name}.parquet"
        )

    def run():
        q = (
            read_documents_stream(spark, str(stream_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    deliver("b0", [(1, "srcA"), (2, "srcA")])
    run()
    assert {r.doc_id for r in spark.read.parquet(f"{out}/epoch=0").collect()} == {1, 2}

    deliver("b1", [(10, "srcA"), (11, "srcA"), (12, "srcB")])
    run()
    kept1 = {r.doc_id for r in spark.read.parquet(f"{out}/epoch=1").collect()}
    assert kept1 == {10, 12}, kept1  # 1 srcA slot left (keep-first), srcB free
    assert (0, 2, 0) in stats["batches"] and (1, 2, 1) in stats["batches"], stats
    # state: (source, batch_id) rows, totals at the cap
    st = {(r.source, r.batch_id): r.n_kept for r in spark.read.parquet(state).collect()}
    assert st == {("srcA", 0): 2, ("srcA", 1): 1, ("srcB", 1): 1}, st

    # replay batch 1 (crash between write and checkpoint commit)
    batch1 = doc_rows([(10, "srcA"), (11, "srcA"), (12, "srcB")])
    sink(batch1, 1)
    kept1r = {r.doc_id for r in spark.read.parquet(f"{out}/epoch=1").collect()}
    assert kept1r == {10, 12}
    st2 = {(r.source, r.batch_id): r.n_kept for r in spark.read.parquet(state).collect()}
    assert st2 == st


def test_semantic_sink_warehouse_bucketed_on_sig_is_corpus_shuffle_free(
    spark, sf_dir, tmp_path
):
    """The 100 TB layout claim in semantic_dedup_sink's docstring,
    demonstrated (VERDICT r8 item 5, mirroring
    test_incremental.py's dd11 assertion): persist the sink's vector
    warehouse — (vec_id, embedding_d, sig, nrm), exactly the columns
    the sink merges — BUCKETED on the RHP signature it joins on, and
    the per-batch probe-vs-corpus candidate join plans with NO Exchange
    above the bucketed corpus scan: only the (small) batch side
    shuffles. A steady-state stream therefore never re-shuffles the
    vector warehouse, whatever its size."""
    import re

    from nyc_taxi_etl_dashboard_spark.operators.similarity import (
        _probe_masks,
        l2_norm,
        rhp_signature,
    )
    from nyc_taxi_etl_dashboard_spark.sources import read_table

    embs = read_table(spark, sf_dir, "embeddings")
    wh = (
        embs.filter(F.col("vec_id") % 4 != 0)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding_d")
        )
        .withColumn("sig", rhp_signature(vec_col="embedding_d", n_planes=16))
        .withColumn("nrm", l2_norm("embedding_d"))
    )
    batch = (
        embs.filter(F.col("vec_id") % 4 == 0)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding_d")
        )
        .withColumn("sig", rhp_signature(vec_col="embedding_d", n_planes=16))
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS vecwh LOCATION '{tmp_path / 'wh'}'")
    spark.catalog.setCurrentDatabase("vecwh")
    try:
        wh.write.bucketBy(8, "sig").sortBy("sig").saveAsTable("vector_warehouse")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cor = spark.table("vector_warehouse")
        masks = _probe_masks(16, 1)
        probes = batch.select(
            F.col("vec_id").alias("inc_id"),
            F.explode(
                F.array(*[F.col("sig").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("sig"),
        )
        cand = probes.join(cor, "sig").select("inc_id", F.col("vec_id").alias("cor_id"))
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2000]
        assert cand.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE vecwh CASCADE")


def test_quota_sink_state_join_broadcasts_state_not_documents(spark, tmp_path):
    """The quota sink's running-count state is |sources|·|batches|
    scalar rows — the scale answer is a BROADCAST of the state
    aggregate, never a shuffle of the documents against it. Pin the
    plan: the allowance join is a BroadcastHashJoin whose build side is
    the state aggregation, and the only hash Exchanges in the keep-set
    computation are the skew-safe kernel's own (count-broadcast +
    salted windows), none keyed by the state join."""
    from nyc_taxi_etl_dashboard_spark.operators.skew import capped_keep_first

    state = spark.createDataFrame(
        [("web", 0, 30), ("wiki", 0, 10)], "source string, batch_id int, n_kept int"
    )
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "web").otherwise("wiki").alias("source"),
    )
    taken = state.groupBy("source").agg(F.sum("n_kept").alias("taken"))
    with_rem = (
        docs.join(F.broadcast(taken), "source", "left")
        .withColumn(
            "__rem",
            F.greatest(F.lit(60) - F.coalesce("taken", F.lit(0)), F.lit(0)),
        )
        .drop("taken")
    )
    kept = capped_keep_first(with_rem, "source", "doc_id", F.col("__rem"))
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert kept.count() > 0


def test_line_dedup_sink_drops_history_segments_and_survives_replay(spark, tmp_path):
    """dd13's continuous form: a boilerplate segment is kept exactly
    once across the whole stream history — within a batch the lowest
    (doc_id, seg_idx) occurrence wins (the batch operator's rule),
    across batches the warehouse wins; and a batch replayed after its
    own merge landed (crash between merge and checkpoint commit)
    reproduces its verdicts, epoch output, and state byte-for-byte."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import line_dedup_sink

    state = str(tmp_path / "seg_warehouse")
    out = str(tmp_path / "clean")
    sink, stats = line_dedup_sink(state, out, seg_tokens=2)

    def doc_rows(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # batch 0: NAV BAR is shared; doc 1 (lowest occ_key) keeps it
    sink(doc_rows([(1, "NAV BAR alpha beta"), (2, "NAV BAR gamma delta")]), 0)
    ep0 = {r.doc_id: r for r in spark.read.parquet(f"{out}/epoch=0").collect()}
    assert ep0[1].clean_text == "NAV BAR alpha beta" and ep0[1].n_kept == 2
    assert ep0[2].clean_text == "gamma delta" and ep0[2].n_kept == 1
    # state: one row per distinct kept segment (3: NAV BAR, alpha beta, gamma delta)
    assert spark.read.parquet(state).count() == 3
    assert stats["batches"][-1] == (0, 2, 4, 3)

    # batch 1: NAV BAR now history -> dropped; new segment survives
    sink(doc_rows([(3, "NAV BAR epsilon zeta")]), 1)
    ep1 = {r.doc_id: r for r in spark.read.parquet(f"{out}/epoch=1").collect()}
    assert ep1[3].clean_text == "epsilon zeta" and ep1[3].n_segs == 2
    st = {(r.seg_hash, r.occ_key) for r in spark.read.parquet(state).collect()}
    assert len(st) == 4

    # replay batch 1: own canonical occurrences are in the warehouse
    # keyed by their own occ_keys -> kept again, state unchanged
    sink(doc_rows([(3, "NAV BAR epsilon zeta")]), 1)
    ep1r = {r.doc_id: r for r in spark.read.parquet(f"{out}/epoch=1").collect()}
    assert ep1r[3].clean_text == "epsilon zeta"
    st2 = {(r.seg_hash, r.occ_key) for r in spark.read.parquet(state).collect()}
    assert st2 == st


def test_line_dedup_sink_warehouse_bucketed_on_seg_hash_is_history_shuffle_free(
    spark, tmp_path
):
    """The 100 TB layout claim in line_dedup_sink's docstring (the dd11
    pattern at segment granularity): persist the segment warehouse —
    (seg_hash, occ_key), exactly the columns the sink merges — BUCKETED
    on seg_hash, and the per-batch history join plans with NO Exchange
    above the bucketed scan: only the (small) batch side shuffles."""
    import re

    from nyc_taxi_etl_dashboard_spark.operators.dedup import doc_segments

    docs = spark.createDataFrame(
        [(i, f"seg{i} words here padding tokens {i % 7}") for i in range(200)],
        "doc_id long, text string",
    )
    wh = (
        doc_segments(docs, seg_tokens=4)
        .withColumn("seg_hash", F.xxhash64("seg"))
        .groupBy("seg_hash")
        .agg(F.min("occ_key").alias("occ_key"))
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS segwh LOCATION '{tmp_path / 'wh'}'")
    spark.catalog.setCurrentDatabase("segwh")
    try:
        wh.write.bucketBy(8, "seg_hash").sortBy("seg_hash").saveAsTable(
            "segment_warehouse"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hist = spark.table("segment_warehouse")
        batch = (
            doc_segments(
                spark.createDataFrame(
                    [(900, "fresh batch of eight tokens right here now")],
                    "doc_id long, text string",
                ),
                seg_tokens=4,
            )
            .withColumn("seg_hash", F.xxhash64("seg"))
        )
        joined = batch.join(hist.withColumnRenamed("occ_key", "hist_key"), "seg_hash", "left")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE segwh CASCADE")


def test_compact_every_preserves_state_and_verdicts(spark, tmp_path):
    """Periodic warehouse compaction must be invisible to semantics:
    state CONTENT is bit-identical across a compaction (file count
    drops, rows don't change), and the next batch's verdicts against
    the compacted warehouse match what the uncompacted one would have
    produced — here via the line-dedup sink, whose history join reads
    the state every batch."""
    import glob

    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        compact_every,
        line_dedup_sink,
    )

    state = str(tmp_path / "seg_warehouse")
    out = str(tmp_path / "clean")
    raw_sink, stats = line_dedup_sink(state, out, seg_tokens=2)
    sink = compact_every(raw_sink, state, every=2, target_file_mb=128)

    def doc_rows(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    sink(doc_rows([(1, "NAV BAR alpha beta")]), 0)
    sink(doc_rows([(2, "NAV BAR gamma delta")]), 1)
    before = {(r.seg_hash, r.occ_key) for r in spark.read.parquet(state).collect()}
    files_before = len(glob.glob(f"{state}/**/*.parquet", recursive=True))
    # batch 2 triggers compaction after its merge
    sink(doc_rows([(3, "NAV BAR epsilon zeta")]), 2)
    mid = {(r.seg_hash, r.occ_key) for r in spark.read.parquet(state).collect()}
    files_after = len(glob.glob(f"{state}/**/*.parquet", recursive=True))
    assert files_after < files_before, (files_before, files_after)
    # content = pre-compaction state plus exactly batch 2's new segment
    assert before < mid and len(mid) == len(before) + 1
    # the NEXT batch still sees full history through the compacted state
    sink(doc_rows([(4, "NAV BAR eta theta")]), 3)
    ep3 = {r.doc_id: r for r in spark.read.parquet(f"{out}/epoch=3").collect()}
    assert ep3[4].clean_text == "eta theta"
    # replay of the compaction batch reproduces its output and state
    sink(doc_rows([(3, "NAV BAR epsilon zeta")]), 2)
    ep2 = {r.doc_id: r for r in spark.read.parquet(f"{out}/epoch=2").collect()}
    assert ep2[3].clean_text == "epsilon zeta"


def test_streaming_drift_monitor_scores_batches_against_history(spark, tmp_path):
    """The streaming t20 sink: batch 0 seeds the reference (no report);
    batch 1's 'en' stream repeats the reference distribution exactly
    (KL 0, no alert) while 'fr' appears out of nowhere (drift by
    definition — alert). A replayed batch 1 excludes its own state
    rows and reproduces the identical report and state."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        drift_monitor_sink,
        read_documents_stream,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, text, lang, "srcA", 10, None) for i, lang, text in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    state = str(tmp_path / "drift_state")
    sink, stats = drift_monitor_sink(state, alert_threshold=0.03)

    def deliver(name, rows):
        staging = tmp_path / f"stage_{name}"
        doc_rows(rows).coalesce(1).write.parquet(str(staging))
        shutil.copy(
            next(staging.glob("part-*.parquet")), stream_dir / f"{name}.parquet"
        )

    def run():
        q = (
            read_documents_stream(spark, str(stream_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    clean = "alpha beta gamma delta"
    deliver("b0", [(1, "en", clean), (2, "en", clean)])
    run()
    assert stats["reports"] == []  # first batch: nothing to compare against
    st0 = {
        (r.lang, r.token, r.batch_id): r.cnt
        for r in spark.read.parquet(state).collect()
    }
    assert st0 == {("en", t, 0): 2 for t in clean.split()}

    deliver("b1", [(10, "en", clean), (11, "fr", "spam spam spam click")])
    run()
    by_lang = {r[1]: r for r in stats["reports"] if r[0] == 1}
    assert by_lang["en"][2] == 0.0 and by_lang["en"][4] is False
    assert by_lang["fr"][2] > 0.03 and by_lang["fr"][4] is True

    # replay batch 1 (crash between state write and checkpoint commit)
    n_before = len(stats["reports"])
    sink(doc_rows([(10, "en", clean), (11, "fr", "spam spam spam click")]), 1)
    replayed = {r[1]: r for r in stats["reports"][n_before:]}
    assert replayed == by_lang
    st = {
        (r.lang, r.token, r.batch_id): r.cnt
        for r in spark.read.parquet(state).collect()
    }
    assert st0.items() <= st.items() and len(st) == len(st0) + 4 + 2


def test_drift_gated_ingest_quarantines_flood_and_survives_replay(spark, tmp_path):
    """The gated form of the drift monitor: batch 0 bootstraps (always
    accepted), batch 1 repeats the reference distribution (accepted,
    corpus + state grow), batch 2 is a spam flood (KL over threshold →
    whole batch lands in quarantine, corpus AND token state untouched —
    the flood must not poison the reference). Replaying the flood batch
    reproduces the identical verdict and leaves every table unchanged."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        drift_gated_ingest_sink,
        read_documents_stream,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, text, lang, "srcA", 10, None) for i, lang, text in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    quarantine = str(tmp_path / "quarantine")
    sink, stats = drift_gated_ingest_sink(
        corpus, state, quarantine, alert_threshold=0.3
    )

    def deliver(name, rows):
        staging = tmp_path / f"stage_{name}"
        doc_rows(rows).coalesce(1).write.parquet(str(staging))
        shutil.copy(
            next(staging.glob("part-*.parquet")), stream_dir / f"{name}.parquet"
        )

    def run():
        q = (
            read_documents_stream(spark, str(stream_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    clean = "alpha beta gamma delta"
    deliver("b0", [(1, "en", clean), (2, "en", clean)])
    run()
    assert stats["decisions"] == [(0, False, [])]
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {1, 2}

    deliver("b1", [(10, "en", clean)])
    run()
    assert stats["decisions"][1] == (1, False, [])
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {1, 2, 10}

    flood = "click spam click spam click"
    deliver("b2", [(20, "en", flood), (21, "en", flood)])
    run()
    bid, quarantined, alerts = stats["decisions"][2]
    assert (bid, quarantined) == (2, True)
    assert [a[0] for a in alerts] == ["en"] and alerts[0][1] > 0.3
    # corpus and token state untouched by the flood
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {1, 2, 10}
    state_rows = {
        (r.lang, r.token, r.batch_id): r.cnt for r in spark.read.parquet(state).collect()
    }
    assert {b for (_, _, b) in state_rows} == {0, 1}
    assert {r.doc_id for r in spark.read.parquet(quarantine).collect()} == {20, 21}

    # replay the flood batch (crash before checkpoint commit)
    sink(doc_rows([(20, "en", flood), (21, "en", flood)]), 2)
    assert stats["decisions"][3] == stats["decisions"][2]
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {1, 2, 10}
    assert {
        (r.lang, r.token, r.batch_id): r.cnt for r in spark.read.parquet(state).collect()
    } == state_rows
    assert {r.doc_id for r in spark.read.parquet(quarantine).collect()} == {20, 21}


def test_drift_gated_ingest_multilang_and_bootstrap_replay(spark, tmp_path):
    """ADVICE r13 regressions on the drift gate. (a) A clean
    single-language batch arriving on a MULTI-language reference must
    not be quarantined over the languages it doesn't contain (the
    full_outer join gives a batch-absent language cnt_a=0 everywhere —
    KL vs smoothed-zero is huge for any real vocabulary). (b) A batch-0
    replay AFTER its state merge landed (crash before the checkpoint
    commit) sees an empty self-excluded reference; it must re-accept as
    the bootstrap it was, not re-verdict into quarantine and land the
    docs in corpus AND quarantine. (c) doc writes are batch_id-
    partitioned so a batch's merge rewrites only its own directory."""
    import os

    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        drift_gated_ingest_sink,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, text, lang, "srcA", 10, None) for i, lang, text in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    quarantine = str(tmp_path / "quarantine")
    sink, stats = drift_gated_ingest_sink(
        corpus, state, quarantine, alert_threshold=0.3
    )

    en = "alpha beta gamma delta"
    fr = "un deux trois quatre"
    # batch 0: bootstrap, two languages
    sink(doc_rows([(1, "en", en), (2, "fr", fr)]), 0)
    assert stats["decisions"] == [(0, False, [])]

    # (b) batch-0 replay: self-excluded reference is EMPTY → bootstrap
    # again, deterministically accepted; corpus unchanged, no quarantine
    sink(doc_rows([(1, "en", en), (2, "fr", fr)]), 0)
    assert stats["decisions"][1] == (0, False, [])
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {1, 2}
    assert not os.path.exists(quarantine)

    # (a) clean en-only batch on the en+fr reference: fr is batch-absent
    # and must not gate; the batch repeats the en distribution (KL 0)
    sink(doc_rows([(10, "en", en)]), 1)
    assert stats["decisions"][2] == (1, False, [])
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {1, 2, 10}

    # a language FIRST appearing still gates: 'de' from nowhere (its
    # reference is smoothed-zero == uniform over the batch vocab, so the
    # batch must be skewed to trip the gate — 20:1 gives KL ≈ 0.40)
    sink(doc_rows([(20, "de", " ".join(["spam"] * 20 + ["click"]))]), 2)
    bid, quarantined, alerts = stats["decisions"][3]
    assert (bid, quarantined) == (2, True) and [a[0] for a in alerts] == ["de"]
    assert {r.doc_id for r in spark.read.parquet(quarantine).collect()} == {20}

    # (c) partition-scoped layout: one batch_id= directory per accepted batch
    assert sorted(
        d for d in os.listdir(corpus) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1"]


def test_drift_monitor_skips_batch_absent_languages(spark, tmp_path):
    """Monitor twin of the multi-language fix: reports cover only
    languages PRESENT in the batch; an empty self-excluded reference
    (batch-0 replay) reports nothing."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        drift_monitor_sink,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, text, lang, "srcA", 10, None) for i, lang, text in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    state = str(tmp_path / "drift_state")
    sink, stats = drift_monitor_sink(state, alert_threshold=0.03)

    en = "alpha beta gamma delta"
    sink(doc_rows([(1, "en", en), (2, "fr", "un deux trois quatre")]), 0)
    assert stats["reports"] == []

    # batch-0 replay: empty self-excluded reference → still no reports
    sink(doc_rows([(1, "en", en), (2, "fr", "un deux trois quatre")]), 0)
    assert stats["reports"] == []

    # en-only batch: report for en only — fr (reference-only) is skipped
    sink(doc_rows([(10, "en", en)]), 1)
    assert [(r[0], r[1]) for r in stats["reports"]] == [(1, "en")]
    assert stats["reports"][0][4] is False  # KL 0, no alert


def test_streaming_split_sink_prefix_exact_and_replay_safe(spark, tmp_path):
    """x17's continuous form (round-14 agenda item 2): after EVERY
    batch the warehouse's per-stratum split counts equal the exact
    ceil-cut counts for that many docs (prefix-exact, not just in the
    limit); a replayed batch excludes its own state rows, reproduces
    identical labels, and leaves state unchanged."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        streaming_split_sink,
    )

    def doc_rows(ids_langs):
        return spark.createDataFrame(
            [(i, f"tok{i} tok", lang, "srcA", 8, None) for i, lang in ids_langs],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    def exact_counts(n):
        t1, t2 = (8 * n + 9) // 10, (9 * n + 9) // 10
        return {"train": t1, "val": t2 - t1, "test": n - t2}

    state = str(tmp_path / "split_state")
    out = str(tmp_path / "assign")
    sink, stats = streaming_split_sink(state, out)

    # batch 0: 7 en + 3 fr (bootstrap, no state yet)
    b0 = [(i, "en") for i in range(7)] + [(100 + i, "fr") for i in range(3)]
    sink(doc_rows(b0), 0)
    got = {
        (r.stratum, r.split): r.cnt
        for r in spark.read.parquet(state)
        .groupBy("stratum", "split")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    for lang, n in (("en", 7), ("fr", 3)):
        for split, c in exact_counts(n).items():
            assert got.get((lang, split), 0) == c, (lang, split, got)

    # batch 1: 8 more en, 4 more fr → cumulative counts exact at 15/7
    b1 = [(200 + i, "en") for i in range(8)] + [(300 + i, "fr") for i in range(4)]
    sink(doc_rows(b1), 1)
    got = {
        (r.stratum, r.split): r.cnt
        for r in spark.read.parquet(state)
        .groupBy("stratum", "split")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    for lang, n in (("en", 15), ("fr", 7)):
        for split, c in exact_counts(n).items():
            assert got.get((lang, split), 0) == c, (lang, split, got)

    # every doc labeled exactly once across epochs
    assigned = spark.read.parquet(out)
    assert assigned.count() == 22
    assert assigned.select("doc_id").distinct().count() == 22

    # replay batch 1 (crash before checkpoint commit): identical labels,
    # state byte-identical
    before = {
        (r.doc_id, r.split) for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }
    state_before = {
        (r.stratum, r.split, r.batch_id, r.cnt)
        for r in spark.read.parquet(state).collect()
    }
    sink(doc_rows(b1), 1)
    after = {
        (r.doc_id, r.split) for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }
    state_after = {
        (r.stratum, r.split, r.batch_id, r.cnt)
        for r in spark.read.parquet(state).collect()
    }
    assert after == before and state_after == state_before


def test_streaming_split_label_broadcasts_state_one_batch_exchange(spark):
    """The split sink's scale claim, pinned on the labeling kernel: the
    per-stratum prior counts join as a BROADCAST (state is |strata|
    scalar rows), and the only shuffle of the batch is the per-stratum
    window — never a SortMergeJoin against state."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        _streaming_split_label,
    )

    slim = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("fr").alias("stratum"),
        (F.col("id") * 7 % 97).alias("rank_key"),
    )
    prior = spark.createDataFrame(
        [("en", 40), ("fr", 10)], "stratum string, prior_n bigint"
    )
    labeled = _streaming_split_label(
        slim, prior, ((8, 10), (9, 10)), ("train", "val", "test")
    )
    plan = labeled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert labeled.count() == 200


def test_incremental_dedup_replay_safe_with_intra_batch_neardups(spark):
    """The round-14 exclusion fix, pinned at the kernel: a replayed
    batch whose signatures ALREADY sit in the warehouse (crash between
    merge and checkpoint commit) must reproduce its original verdicts
    even when the batch contains INTRA-batch near-dups — same-id
    exclusion alone would let doc X match batch-mate Y's just-merged
    signature and flip X to is_dup on replay."""
    from nyc_taxi_etl_dashboard_spark.operators.dedup import (
        incremental_dedup,
        minhash_signature_table,
    )

    batch = spark.createDataFrame(
        [
            (20, "the quick brown fox jumps over the lazy dog tonight"),
            (21, "the quick brown fox jumps over the lazy dog tonight"),  # batch-mate dup
            (22, "completely different content about parquet shuffles here"),
        ],
        "doc_id long, text string",
    )
    history = spark.createDataFrame(
        [(1, "some unrelated historical document text goes right here")],
        "doc_id long, text string",
    )
    inc = minhash_signature_table(batch, num_hashes=8, portable=True)
    hist_sigs = minhash_signature_table(history, num_hashes=8, portable=True)
    # first run: warehouse = history only
    v1 = {
        r.doc_id: r.is_dup
        for r in incremental_dedup(inc, hist_sigs, num_hashes=8).collect()
    }
    assert v1 == {20: False, 21: False, 22: False}
    # replay: warehouse already contains the batch's own merged sigs
    post_merge = hist_sigs.unionByName(inc)
    v2 = {
        r.doc_id: r.is_dup
        for r in incremental_dedup(inc, post_merge, num_hashes=8).collect()
    }
    assert v2 == v1  # 21 must NOT flip to dup against 20's merged sig


def test_curation_chain_end_to_end_and_whole_chain_replay(spark, tmp_path):
    """The composed streaming curation chain (gate → drift gate →
    incremental dedup → quota → prefix-exact split → one corpus merge):
    every stage bites on the fixture, the split proportions stay exact
    over the ACTUAL kept corpus after every batch, a flood batch is
    turned away touching no state, and replaying an accepted batch
    after all four state merges landed rewrites everything
    byte-identically (whole-CHAIN exactly-once, not just per stage)."""
    import os

    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        curation_chain_sink,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, text, "en", src, len(text), None) for i, src, text in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    paths = {
        k: str(tmp_path / k)
        for k in ("corpus", "quarantine", "sigs", "tokens", "quota", "splits")
    }
    sink, stats = curation_chain_sink(
        paths["corpus"], paths["quarantine"], paths["sigs"], paths["tokens"],
        paths["quota"], paths["splits"],
        min_tokens=5, quota={"wiki": 3}, quota_default=100,
        alert_threshold=0.5,
    )

    def exact_counts(n):
        t1, t2 = (8 * n + 9) // 10, (9 * n + 9) // 10
        return {"train": t1, "val": t2 - t1, "test": n - t2}

    def split_state_counts():
        return {
            (r.stratum, r.split): r.cnt
            for r in spark.read.parquet(paths["splits"])
            .groupBy("stratum", "split")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }

    # texts share the UNIGRAM skeleton (alpha/beta/gamma/delta — the
    # drift gate sees aligned distributions) but interleave per-doc
    # tokens so every 3-gram SHINGLE is unique per doc (no accidental
    # near-dup flags); only literal copies match in the warehouse
    def mk(i):
        return f"alpha u{i}a beta u{i}b gamma u{i}c delta u{i}d"

    b0 = [(i, "web", mk(i)) for i in range(1, 5)] + [
        (5, "wiki", mk(5)),
        (6, "wiki", mk(6)),
        (99, "web", "too short"),  # gated out (2 tokens < 5)
    ]
    sink(doc_rows(b0), 0)
    bid, n_in, n_gated, n_dup, n_quota, quarantined, _ = stats["batches"][0]
    assert (bid, n_in, n_gated, n_dup, n_quota, quarantined) == (0, 7, 6, 0, 0, False)
    got = split_state_counts()
    for split, c in exact_counts(6).items():
        assert got.get(("en", split), 0) == c

    # batch 1: a near-dup of doc 1 (dropped vs warehouse), an intra-batch
    # dup PAIR (both kept — intra-increment dedup is downstream's job),
    # and three wiki docs against a remaining allowance of 1
    b1 = [
        (10, "web", mk(1)),    # literal copy of doc 1 → dup vs warehouse
        (20, "web", mk(20)),
        (21, "web", mk(20)),   # batch-mate dup pair: BOTH survive
        (30, "wiki", mk(30)),
        (31, "wiki", mk(31)),
        (32, "wiki", mk(32)),
    ]
    sink(doc_rows(b1), 1)
    bid, n_in, n_gated, n_dup, n_quota, quarantined, _ = stats["batches"][1]
    assert (bid, n_in, n_gated, quarantined) == (1, 6, 6, False)
    assert n_dup == 1      # doc 10 vs warehouse; 20/21 both survive
    assert n_quota == 2    # wiki allowance 3-2=1 → 30 kept, 31/32 dropped
    kept_total = 6 + (6 - n_dup - n_quota)
    got = split_state_counts()
    for split, c in exact_counts(kept_total).items():
        assert got.get(("en", split), 0) == c
    corpus_ids = {r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()}
    assert corpus_ids == {1, 2, 3, 4, 5, 6, 20, 21, 30}

    # batch 2: a flood — quarantined whole, NO state touched
    states_before = {
        k: sorted(map(tuple, spark.read.parquet(paths[k]).collect()))
        for k in ("sigs", "tokens", "quota", "splits")
    }
    flood = " ".join(["spam"] * 30 + ["click"] * 5)
    sink(doc_rows([(50, "web", flood), (51, "web", flood)]), 2)
    assert stats["batches"][2][5] is True  # quarantined
    assert {r.doc_id for r in spark.read.parquet(paths["quarantine"]).collect()} == {50, 51}
    for k, before in states_before.items():
        assert sorted(map(tuple, spark.read.parquet(paths[k]).collect())) == before
    assert corpus_ids == {r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()}

    # whole-chain replay of batch 1 (crash before checkpoint commit):
    # same verdicts at every stage, every table byte-identical
    corpus_before = sorted(
        map(tuple, spark.read.parquet(paths["corpus"]).collect())
    )
    sink(doc_rows(b1), 1)
    assert stats["batches"][3][:6] == stats["batches"][1][:6]
    assert sorted(map(tuple, spark.read.parquet(paths["corpus"]).collect())) == corpus_before
    for k, before in states_before.items():
        assert sorted(map(tuple, spark.read.parquet(paths[k]).collect())) == before
    assert not os.path.exists(paths["quarantine"] + "__staging")


def test_curation_chain_zero_kept_batches_leave_state_readable(spark, tmp_path):
    """Degenerate-batch hardening: a batch that keeps NOTHING (all
    gated out, or everything over quota) must not create data-less
    state tables — an empty partitioned directory breaks the next
    batch's schema inference. Covers both orders: zero-kept FIRST
    (no warehouses yet) and zero-kept against existing warehouses."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        curation_chain_sink,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, t, "en", s, len(t), None) for i, s, t in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    def mk(i):
        return f"alpha u{i}a beta u{i}b gamma u{i}c delta u{i}d"

    paths = {
        k: str(tmp_path / k)
        for k in ("corpus", "quar", "sigs", "tok", "quo", "spl")
    }
    sink, stats = curation_chain_sink(
        paths["corpus"], paths["quar"], paths["sigs"], paths["tok"],
        paths["quo"], paths["spl"], min_tokens=5, quota={"capped": 1},
        quota_default=100,
    )
    # batch 0: everything too short → kept 0, NO tables created
    sink(doc_rows([(1, "web", "too short"), (2, "web", "way too short")]), 0)
    assert stats["batches"][0][1:] == (2, 0, 0, 0, False, {})
    import os

    assert not os.path.exists(paths["corpus"])
    # batch 1: normal docs bootstrap every warehouse
    sink(doc_rows([(10 + i, "web", mk(10 + i)) for i in range(4)]), 1)
    assert stats["batches"][1][5] is False
    # batch 2: survives the gate but the capped source's allowance is
    # exhausted after one doc ever → one kept; then batch 3 with ZERO
    # kept (same capped source, allowance 0) against existing state
    sink(doc_rows([(20, "capped", mk(20)), (21, "capped", mk(21))]), 2)
    assert stats["batches"][2][4] == 1  # one quota-dropped
    sink(doc_rows([(30, "capped", mk(30))]), 3)
    assert stats["batches"][3][4] == 1 and stats["batches"][3][5] is False
    # and the chain still works after the zero-kept batch
    sink(doc_rows([(40, "web", mk(40))]), 4)
    corpus = {r.doc_id for r in spark.read.parquet(paths["corpus"]).collect()}
    assert corpus == {10, 11, 12, 13, 20, 40}


def test_churn_monitor_scores_novelty_and_replays_safely(spark, tmp_path):
    """Streaming dd17: per-source content novelty vs history — batch 0
    bootstraps silently, a recurring-content batch reports low churn,
    an all-new batch alerts, and a replay excludes its own state rows
    and reproduces the identical report."""
    from nyc_taxi_etl_dashboard_spark.streaming.documents import (
        DOCS_STREAM_SCHEMA,
        churn_monitor_sink,
    )

    def doc_rows(rows):
        return spark.createDataFrame(
            [(i, text, "en", src, 10, None) for i, src, text in rows],
            DOCS_STREAM_SCHEMA,
        ).withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )

    state = str(tmp_path / "churn_state")
    sink, stats = churn_monitor_sink(state, alert_threshold=0.9)

    sink(doc_rows([(1, "srcA", "alpha beta"), (2, "srcA", "gamma delta")]), 0)
    assert stats["reports"] == []  # bootstrap

    # batch-0 replay: self-excluded reference empty -> still bootstrap
    sink(doc_rows([(1, "srcA", "alpha beta"), (2, "srcA", "gamma delta")]), 0)
    assert stats["reports"] == []

    # half recurring, half new -> churn 0.5, no alert
    sink(doc_rows([(10, "srcA", "alpha beta"), (11, "srcA", "epsilon zeta")]), 1)
    assert stats["reports"][-1] == (1, "srcA", 2, 1, 1, 0.5, False)

    # a brand-new source churning 100% -> alert
    sink(doc_rows([(20, "srcB", "one two"), (21, "srcB", "three four")]), 2)
    assert stats["reports"][-1] == (2, "srcB", 2, 2, 0, 1.0, True)

    # replay batch 1: its own state rows are excluded so the recompute
    # is value-identical, and the in-memory telemetry is exactly-once —
    # the already-present (batch_id, source) tuple is NOT re-appended
    # (ADVICE r15)
    n_before = len(stats["reports"])
    sink(doc_rows([(10, "srcA", "alpha beta"), (11, "srcA", "epsilon zeta")]), 1)
    assert stats["reports"][n_before:] == []
    assert stats["reports"].count((1, "srcA", 2, 1, 1, 0.5, False)) == 1

    # intra-batch duplicates count once (presence is per distinct content)
    sink(doc_rows([(30, "srcA", "alpha beta"), (31, "srcA", "alpha beta")]), 3)
    assert stats["reports"][-1] == (3, "srcA", 1, 0, 1, 0.0, False)

"""Streaming corpus curation (the continuous-ingestion twin of
``plans.llmops.q_corpus_curation``): documents arrive as files, pass a
stateless quality gate, and exact-dedup on content fingerprint with
WATERMARK-BOUNDED state — the shape a production corpus pipeline runs
between crawler and training store.

State model: ``dropDuplicatesWithinWatermark`` keys state by
fingerprint and evicts entries once the watermark passes — duplicates
arriving within the horizon are dropped, re-crawls older than it are
accepted again (the honest contract for unbounded streams: exact global
dedup needs unbounded memory; periodic batch dedup over the stored
corpus — dd1/dd8 — closes the gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: streaming documents schema: the batch fixture's columns plus the
#: arrival time the watermark rides on
DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("ingest_ts", TimestampType()),
    ]
)


def read_documents_stream(spark: SparkSession, directory: str) -> DataFrame:
    return spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(directory)


def curate_documents_stream(
    docs: DataFrame, min_tokens: int = 20, watermark: str = "1 hour"
) -> DataFrame:
    """Quality gate (stateless, same rule as the batch chain's first
    stage) → rolling-hash fingerprint (narrow) → fingerprint dedup with
    watermark-bounded state. Output: curated documents + their
    fingerprint (downstream fuzzy dedup reuses it)."""
    from ..functions import poly_fingerprint
    from ..operators.text import tokens

    gated = docs.filter(F.array_size(F.split("text", " ")) >= min_tokens)
    fp = gated.withColumn("fp", poly_fingerprint(tokens("text")))
    return fp.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def incremental_dedup_sink(
    table_path: str,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    portable: bool = False,
):
    """The STREAMING form of dd11 (cross-run incremental dedup): a
    ``foreachBatch`` sink that treats every micro-batch as an increment
    against the persistent MinHash signature warehouse — near-dups of
    anything EVER ingested are dropped (no watermark horizon: signature
    state lives on disk, ~num_hashes longs per doc, not in stream
    state), and survivors' signatures are appended via ``merge_parquet``
    so the very next batch sees them.

    Complements :func:`curate_documents_stream`: that stage drops exact
    re-deliveries within the watermark cheaply in stream state; this
    stage drops NEAR-dups against the full corpus history at a cost
    bounded by the increment (the dd11 shape — the corpus is touched
    only through its banded signature table). foreachBatch batches are
    exactly-once per epoch with checkpointing, and merge_parquet is
    key-idempotent on doc_id, so a replayed batch re-merges the same
    signatures harmlessly. Verdicts are replay-safe too:
    ``incremental_dedup`` excludes same-doc_id candidates, so a batch
    replayed AFTER its own merge landed (crash between merge and
    checkpoint commit) does not match itself in the warehouse and
    reproduces its original verdicts (pinned in
    tests/test_streaming.py). ``stats_box`` is observability,
    not state: a replayed batch appends a second (batch_id, kept,
    dropped) triple — dedupe on batch_id if consuming it as a record.

    Returns ``(sink_fn, stats_box)`` — pass ``sink_fn`` to
    ``foreachBatch``; ``stats_box['batches']`` accumulates one
    ``(batch_id, kept, dropped)`` scalar triple per batch (counts only —
    never a data-sized collect; the kept DOCUMENTS are whatever the
    caller writes downstream, and the kept SIGNATURES live in the
    table)."""
    from ..operators.dedup import incremental_dedup, minhash_signature_table
    from ..sources.writers import merge_parquet

    stats_box: dict = {"batches": []}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        inc_sigs = minhash_signature_table(
            batch_df, num_hashes=num_hashes, portable=portable
        ).localCheckpoint()  # cut the streaming-source lineage: the sigs
        # are consumed by a join, a filtered merge, and two counts
        if os.path.exists(table_path):
            corpus = spark.read.parquet(table_path)
            verdicts = incremental_dedup(
                inc_sigs, corpus,
                num_hashes=num_hashes, bands=bands, threshold=threshold,
            )
        else:
            verdicts = inc_sigs.select(
                "doc_id", F.lit(False).alias("is_dup")
            )
        kept_sigs = inc_sigs.join(
            verdicts.filter(~F.col("is_dup")).select("doc_id"), "doc_id"
        ).localCheckpoint()  # merge_parquet rewrites the path it reads
        n_inc = inc_sigs.count()
        n_kept = kept_sigs.count()
        if n_kept:
            merge_parquet(spark, table_path, kept_sigs, ["doc_id"])
        stats_box["batches"].append((batch_id, n_kept, n_inc - n_kept))

    return sink, stats_box

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

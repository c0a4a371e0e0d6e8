"""Multimodal column plumbing (NEW surface): images/audio/video as
opaque ``binary`` columns + typed metadata, processed with Arrow-batched
``mapInPandas`` — the only place this engine crosses into Python, and it
does so per-BATCH, never per-row.

The container has no image/audio codecs, so the decode step is a
deterministic fake behind ``decode_stub`` (clearly marked); the
Spark-side contract — schema, batch iteration, partition sizing — is
real and tested. Swapping in PIL/librosa means changing ONLY the body of
``_decode_batch``.

Scale notes: binary payloads dominate partition size — cap
``spark.sql.files.maxPartitionBytes`` (or repartition by a size-aware
key) so a batch of decoded frames fits executor memory; push metadata
filters (mime, width) BEFORE the decode so Parquet prunes untouched
row groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output contract of the feature-extraction pass
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("content_hash", LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Test-fixture builder: materialize an opaque binary column (+ mime
    metadata) from a string column. In production the binary column
    arrives from the lakehouse (e.g. image bytes in Parquet)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        F.lit(mime).alias("mime"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB decode: a real pipeline would decode image/audio here
    (``PIL.Image.open(io.BytesIO(payload))`` …). Deterministic fake:
    byte length, first byte, and a polynomial content hash."""
    h = 0
    for byte in payload[:64]:
        h = (h * 131 + byte) % 1_000_000_007
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else -1,
        "content_hash": h,
    }


def extract_media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, mime).

    ``mapInPandas`` streams column batches; each batch is vectorized
    pandas work (~10-100× over row-at-a-time UDFs). The decode itself is
    :func:`decode_stub` — see module docstring.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_len": [f["byte_len"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "content_hash": [f["content_hash"] for f in feats],
                }
            )

    return df.mapInPandas(_decode_batch, MEDIA_FEATURES_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """Video-frame-sampling shape: one output row per sampled offset
    (video → frames explodes row counts; doing it lazily via an offsets
    array keeps the explode JVM-side). Decode is stubbed to the byte at
    each sampled offset."""
    raise NotImplementedError(
        "frame sampling requires a video codec not present in this "
        "container; the contract is explode(sequence(0, byte_len, "
        f"{every_n_bytes})) -> mapInPandas(decode frame at offset)"
    )

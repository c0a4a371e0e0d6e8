"""Python UDTF surface (Spark 4): table functions — one input row in,
many typed rows out — for expansion semantics that ``explode`` over a
built-in array expression can't produce (stateful segmentation,
external tokenizers).

Kept deliberately thin: the segmenter below IS expressible with
``explode(shingles(...))``-style expressions (and the oracle-checked
queries use those); this module exists to pin the UDTF escape hatch's
plumbing — registration, lateral join usage, typed schema — for the
cases that genuinely need Python (e.g. a real BPE tokenizer emitting
(token_id, offset) pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="seg_id: int, segment: string, n_tokens: int")
class SegmentDocument:
    """Split a document into fixed-size token segments (the chunking
    pass of a training-data pipeline: documents → model-context-sized
    pieces). Yields one row per segment."""

    def eval(self, text: str, seg_tokens: int = 16):
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), seg_tokens):
            chunk = toks[i : i + seg_tokens]
            yield i // seg_tokens, " ".join(chunk), len(chunk)


def segment_documents(
    spark: SparkSession, docs: DataFrame, seg_tokens: int = 16
) -> DataFrame:
    """Lateral-join the segmenter over a documents frame: one output row
    per (doc, segment). Arrow-batched per partition; the UDTF runs
    inside the scan stage like any generator."""
    spark.udtf.register("segment_document", SegmentDocument)
    docs.createOrReplaceTempView("_docs_to_segment")
    return spark.sql(
        f"""
        SELECT d.doc_id, s.seg_id, s.segment, s.n_tokens
        FROM _docs_to_segment d,
             LATERAL segment_document(d.text, {seg_tokens}) s
        """
    )

"""Structured Streaming surface (NEW, SURVEY §2.10 — the reference is
strictly batch; its anomaly accumulator and upsert-shaped dim loads are
the 'incremental-shaped' pieces this module generalizes)."""

from .documents import curate_documents_stream, read_documents_stream
from .events import (
    anomaly_split_sink,
    correlate_event_pairs,
    dedup_within_watermark,
    read_events_stream,
    session_counts,
    windowed_counts,
)

__all__ = [
    "read_events_stream",
    "correlate_event_pairs",
    "windowed_counts",
    "session_counts",
    "dedup_within_watermark",
    "anomaly_split_sink",
    "read_documents_stream",
    "curate_documents_stream",
]

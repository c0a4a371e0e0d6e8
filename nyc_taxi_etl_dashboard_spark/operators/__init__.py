"""Operator library (SURVEY §2).

Reference-parity operators (cleanse/classify/features/star) plus the NEW
LLM-data-pipeline surface (dedup/similarity/text/multimodal). Every
operator is a ``DataFrame -> DataFrame`` function built from declarative
expressions so Catalyst can optimize across operator boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: semanticHash -> partition count. The getNumPartitions probe forces an
#: RDD conversion (plan analysis + deserializer setup) per call; queries
#: re-derive identical scan plans constantly (every llmops query calls
#: scale_out on the same table read), so memoize per logical plan.
#: Bounded: distinct (table, sf_dir) plans per session are few.
#: Staleness: a path REWRITE (merge_parquet/compact_parquet) can change
#: a semantically-equal plan's partition count — those writers call
#: :func:`clear_nparts_memo`, as does the driver's per-query wrapper.
_NPARTS_MEMO: dict[int, int] = {}


def clear_nparts_memo() -> None:
    """Drop memoized partition counts. Call after anything that rewrites
    files under a previously-scanned path (the count is a property of
    the files, not the plan, so a rewrite invalidates it)."""
    _NPARTS_MEMO.clear()


def scale_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a compute-heavy operator gets cluster-wide parallelism.

    Small parquet files arrive as 1-2 scan partitions (one file under
    ``maxPartitionBytes`` = one task), which serializes CPU-bound work
    (shingling, hashing, vector folds) no matter how many cores exist.
    One cheap row-count-preserving shuffle up front unlocks N-way
    parallelism. At production scale inputs already exceed the target
    and this is a no-op — the guard costs one plan inspection
    (memoized per logical plan), no job.

    Note this is a guard for OPERATOR parallelism, not a fix for scan
    layout: since round 7 bench.py's raw-vs-bronze split reads the
    bronze (repartition(32), multi-row-group) layout from a persistent
    on-disk fixture, so the benchmark separates true scan parallelism
    from this shuffle's papering-over of single-row-group files
    (VERDICT r6 item 5).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        key = df.semanticHash()
    except Exception:  # pragma: no cover - hash unavailable on exotic plans
        key = None
    nparts = _NPARTS_MEMO.get(key) if key is not None else None
    if nparts is None:
        nparts = df.rdd.getNumPartitions()
        if key is not None and len(_NPARTS_MEMO) < 1024:
            _NPARTS_MEMO[key] = nparts
    if nparts < target:
        return df.repartition(target)
    return df

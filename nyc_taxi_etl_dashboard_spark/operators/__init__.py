"""Operator library (SURVEY §2).

Reference-parity operators (cleanse/classify/features/star) plus the NEW
LLM-data-pipeline surface (dedup/similarity/text/multimodal). Every
operator is a ``DataFrame -> DataFrame`` function built from declarative
expressions so Catalyst can optimize across operator boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scale_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a compute-heavy operator gets cluster-wide parallelism.

    Small parquet files arrive as 1-2 scan partitions (one file under
    ``maxPartitionBytes`` = one task), which serializes CPU-bound work
    (shingling, hashing, vector folds) no matter how many cores exist.
    One cheap row-count-preserving shuffle up front unlocks N-way
    parallelism. At production scale inputs already exceed the target
    and this is a no-op — the guard costs one ``getNumPartitions`` plan
    inspection, no job.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

"""Arbitrary stateful processing via ``transformWithStateInPandas``
(Spark 4.x successor to ``applyInPandasWithState``): typed per-key
state (ValueState / ListState / MapState), timers, and TTL — the API
a custom streaming operator should target going forward.

Environment gate: the API's state-message protocol imports
``google.protobuf``, which this container lacks (and installs are
off-limits) — so the accompanying test SKIPS here and
``applyInPandasWithState`` (``operators.pandas_ops``, tested) remains
the working arbitrary-stateful surface; this module is the
forward-looking implementation, exercised wherever protobuf exists.

Requires the RocksDB state store provider (bundled with Spark 4 OSS):
``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
— which is also the production answer for large keyspaces (HDFS-backed
in-memory state OOMs first; RocksDB spills to local disk and
incremental-checkpoints to the checkpoint location).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _running_totals_processor():
    """Factory so the module imports even on Spark builds without the
    API (the caller/test gates on availability)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        """Per-user lifetime (count, total) maintained in a typed
        ValueState; each micro-batch emits the UPDATED totals for keys
        it touched (update-mode semantics)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Per-user running totals as a transformWithStateInPandas stream.
    State shards by user across executors; RocksDB bounds executor
    memory; emitted rows carry the post-batch value of every touched
    key."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_running_totals_processor(),
        outputStructType="user_id BIGINT, n BIGINT, total DOUBLE",
        outputMode="Update",
        timeMode="None",
    )

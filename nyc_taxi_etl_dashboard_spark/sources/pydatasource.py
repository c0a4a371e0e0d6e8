"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator, registered as format
``synthetic_events``.

Why it exists: the reference reads fixed files/tables; a data-generator
source is the missing piece for load tests and CI fixtures, and it
demonstrates the engine's source surface covers Spark's newest
extension point (the same API a proprietary-system connector would
use). Scale shape: ``numPartitions`` input splits generate
INDEPENDENTLY on executors from a per-partition seed — no driver
materialization, no shuffle; output volume scales linearly with
parallelism.

Determinism contract: (seed, partition index, row index) fully define a
row — rerunning a partition (task retry, speculative execution)
regenerates identical data, which is what makes a generator safe to use
as a source at all. Python-row generation is the slow path by design
(this is a fixture/load tool, not a hot operator); the Arrow-batched
alternative would return ``pyarrow.RecordBatch`` from ``read()``.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def _mix(*parts: int) -> int:
    """Deterministic 64-bit mix (splitmix-style) — portable, no RNG
    state, reproducible across engines and retries."""
    h = 0x9E3779B97F4A7C15
    for p in parts:
        h = (h ^ (p & 0xFFFFFFFFFFFFFFFF)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        h ^= h >> 31
    return h


class _Partition(InputPartition):
    def __init__(self, index: int, start_row: int, n_rows: int):
        self.index = index
        self.start_row = start_row
        self.n_rows = n_rows


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("numRows", 1000))
        self.n_parts = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("numUsers", 50))

    def partitions(self):
        per = self.n_rows // self.n_parts
        out = []
        start = 0
        for i in range(self.n_parts):
            n = per + (self.n_rows - per * self.n_parts if i == self.n_parts - 1 else 0)
            out.append(_Partition(i, start, n))
            start += n
        return out

    def read(self, partition: _Partition):
        base = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
        for j in range(partition.n_rows):
            rid = partition.start_row + j
            h = _mix(self.seed, rid)
            yield (
                rid,
                base + timedelta(seconds=(h >> 8) % 86_400),
                h % self.n_users,
                EVENT_TYPES[(h >> 16) % len(EVENT_TYPES)],
                round(((h >> 24) % 10_000) / 100.0, 2),
                '{"k": %d}' % ((h >> 40) % 100),
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("numRows", N)`` —
    schema matches the events fixture so every events query runs
    unchanged against generated data."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)

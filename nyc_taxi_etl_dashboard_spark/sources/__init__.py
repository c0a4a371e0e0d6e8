"""Sources and sinks (SURVEY §2.1, S1-S13).

The reference's IO surface is: Parquet scan (``extract.py:35-36``),
snappy Parquet sinks including a timestamped anomaly side-output
(``extract.py:61-66``, ``transform.py:118-127``), a JSON run-report sink
(``transform.py:143-144``), JDBC append + upsert sinks and key-lookup
scans (``load.py:121-152,204-221``), raw DDL (``load.py:12-67``), and a
CSV source mentioned in docs only (``README.md:24,34,37``).

Spark-first mapping: every scan is lazy (`spark.read.*`) so Catalyst
pushes projection and predicates into the file format; sinks are
``DataFrameWriter`` calls. Nothing here eagerly materializes.
"""

from .readers import TABLE_NAMES, read_csv, read_jdbc, read_table, register_views
from .writers import (
    write_csv,
    write_jdbc_append,
    write_jdbc_upsert,
    write_jdbc_upsert_pushdown,
    write_json_report,
    write_parquet,
    write_parquet_timestamped,
)

__all__ = [
    "TABLE_NAMES",
    "read_table",
    "read_csv",
    "read_jdbc",
    "register_views",
    "write_parquet",
    "write_parquet_timestamped",
    "write_csv",
    "write_json_report",
    "write_jdbc_append",
    "write_jdbc_upsert",
    "write_jdbc_upsert_pushdown",
]

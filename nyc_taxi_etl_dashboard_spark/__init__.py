"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``1slem/1slem-nyc-taxi-etl-dashboard``
(a pandas/PyArrow batch ETL + Postgres star schema + Power BI dashboard),
re-expressed Spark-first and extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.

The package name drops the reference's leading ``1`` (``1slem``) because
Python identifiers cannot start with a digit.

Layout
------
- ``session``    — SparkSession factory (UTC, AQE, locale pins)
- ``sources``    — readers/writers: Parquet, CSV, JDBC, JSON report
- ``operators``  — cleanse / derive / classify / star / dedup /
                   similarity / text / multimodal
- ``functions``  — scalar expression helpers (decode maps, buckets,
                   time math, portable hashes)
- ``plans``      — named dashboard/pipeline query plans
- ``streaming``  — Structured Streaming surface over event data
"""

__version__ = "0.1.0"

"""Semantic SQL surface: the engine's curated relations as named temp
views, so SQL-first users query the warehouse exactly like the
reference's DB consumers (``SELECT ... FROM fact_trips JOIN dim_time``)
without touching the DataFrame API.

Views are LAZY — registration plans nothing; each SQL query optimizes
through the full underlying plan (pushdown/pruning cross the view
boundary, Catalyst inlines temp views), so the SQL surface costs nothing
over the DataFrame one.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: view name -> registry query backing it
SEMANTIC_VIEWS = {
    "valid_trips": "pipe_valid_rows",
    "anomaly_breakdown": "pipe_anomaly_breakdown",
    "dim_time": "st1_dim_time",
    "dim_location": "st2_dim_location",
    "dim_payment": "st3_dim_payment",
    "fact_trips": "st4_fact_resolved",
    "documents_curated": "dd6_corpus_curation",
    "document_quality": "t2_quality_features",
    "dup_clusters": "dd8_dup_clusters",
}


def register_semantic_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every semantic view (plus the raw tables via
    ``sources.register_views``). Returns the registered view names."""
    from ..sources import register_views
    from . import analytics_ext, dashboard, events, llmops, pipeline, star

    register_views(spark, sf_dir)
    registry: dict = {}
    for m in (pipeline, dashboard, star, analytics_ext, llmops, events):
        registry.update(m.QUERIES)
    for view, query in SEMANTIC_VIEWS.items():
        registry[query](spark, sf_dir).createOrReplaceTempView(view)
    return list(SEMANTIC_VIEWS)

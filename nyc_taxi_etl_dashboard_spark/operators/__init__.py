"""Operator library (SURVEY §2).

Reference-parity operators (cleanse/classify/features/star) plus the NEW
LLM-data-pipeline surface (dedup/similarity/text/multimodal). Every
operator is a ``DataFrame -> DataFrame`` function built from declarative
expressions so Catalyst can optimize across operator boundaries.
"""

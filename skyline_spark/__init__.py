"""skyline_spark — a from-scratch PySpark-native validation engine.

Reimplements the semantics of Skyline's consensus anomaly ensemble
(/root/reference) as distribution-drift constraints over partitioned tables
of Common-Crawl-style web pages, plus schema / uniqueness / referential /
static constraints, dedup & similarity operators, and a checkpointed,
resumable validation pipeline. See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"

"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the paired registry in
``skyline_spark.catalog`` — every operator is registered once with both its
Spark builder and its DuckDB oracle, so the two sides cannot drift apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full validation pipeline (stats → gates → 9-kernel
    consensus drift ensemble → constraints → verdicts) plus a smoke pass
    over sf0.001 daily drift."""
    from skyline_spark.catalog import QUERIES

    return QUERIES["validate_pages_full"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from skyline_spark.catalog import QUERIES

    return {name: spec.build for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from skyline_spark.catalog import QUERIES

    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }

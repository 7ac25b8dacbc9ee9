"""Registry of paired (Spark builder, DuckDB oracle) queries."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "QUERIES", "query", "load"]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: QueryFn
    #: DuckDB SQL over the pre-registered views (region nation customer
    #: supplier part orders lineitem events documents embeddings);
    #: None → non-SQL-expressible, driver records a rows-only check
    oracle: Optional[str]
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator registering a query builder with its oracle SQL."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")

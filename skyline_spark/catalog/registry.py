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
    #: None → non-SQL-expressible, driver records a rows-only check.
    #: A zero-arg callable defers EXPENSIVE oracle-text generation (e.g.
    #: literal tables from special-function bisections) to first use, so
    #: importing the catalog stays cheap for bench/production paths; read
    #: through ``oracle`` (the property below resolves and caches it).
    oracle_src: Optional[str | Callable[[], str]]
    doc: str = ""

    @property
    def oracle(self) -> Optional[str]:
        src = self.oracle_src
        if callable(src):
            src = src()
            object.__setattr__(self, "oracle_src", src)
        return src


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str | Callable[[], str]], doc: str = ""):
    """Decorator registering a query builder with its oracle SQL (or a
    zero-arg callable producing it lazily)."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name=name, build=fn, oracle_src=oracle, doc=doc)
        return fn

    return wrap


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")

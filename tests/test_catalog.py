"""Catalog parity tests: every oracled query must match DuckDB at sf0.001.

This is the in-repo twin of the driver's CORRECTNESS gate (and of
tools/check_parity.py): same view names, same order-insensitive value
comparison with floats rounded to 9dp.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from skyline_spark.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    import datetime
    import decimal

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows), sorted(cols)


ORACLED = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, con, name):
    spec = QUERIES[name]
    sdf = spec.build(spark, SF_DIR)
    srows, scols = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = con.sql(spec.oracle)
    drows, dcols = _rows([d[0] for d in rel.description], rel.fetchall())
    assert scols == dcols, f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert srows == drows, f"{name}: values differ"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = QUERIES[name].build(spark, SF_DIR)
    rows = df.collect()
    assert df.columns  # stable schema
    assert rows is not None


def test_oracled_outputs_are_driver_canon_safe(spark):
    """The driver canonicalizes results with pandas ``sort_values`` over all
    columns, which raises ``unhashable type`` on array/map cells (the round-1
    failure mode of drift_ensemble_daily). Every oracled query must therefore
    emit only scalar top-level columns — serialize arrays with concat_ws /
    to_json at the query boundary."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    # rows-only queries are canonicalized by the driver too (the round-1
    # failures were exactly there), so check every registered query
    for name in sorted(QUERIES):
        df = QUERIES[name].build(spark, SF_DIR)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
                f"{name}.{f.name} is {f.dataType.simpleString()} — the driver "
                "canonicalizer cannot sort/hash it; serialize it in the query output"
            )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())

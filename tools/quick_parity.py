"""Spot-check parity for a named subset of catalog queries at sf0.001.

Usage: python tools/quick_parity.py name1 name2 ...   (defaults: all new)
Same comparison as tests/test_catalog.py, but one-off and verbose.
"""

from __future__ import annotations

import math
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, v) for v in t),
    ), sorted(cols)


def main() -> int:
    from skyline_spark.catalog import QUERIES
    from skyline_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    rc = 0
    for name in names:
        spec = QUERIES[name]
        sdf = spec.build(spark, SF_DIR)
        srows, scols = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows, ocols = _rows(ocols, res.fetchall())
        ok = scols == ocols and srows == orows
        print(f"{name}: cols_match={scols == ocols} rows {len(srows)}/{len(orows)} "
              f"match={ok}")
        if not ok:
            rc = 1
            if scols != ocols:
                print("  spark cols:", scols, "\n  oracle cols:", ocols)
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print("  first diff row", i, "\n   spark :", a, "\n   oracle:", b)
                    break
            if len(srows) != len(orows):
                print("  row count mismatch")
    return rc


if __name__ == "__main__":
    sys.exit(main())

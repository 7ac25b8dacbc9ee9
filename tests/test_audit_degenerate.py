"""Degenerate-input hardening for the audit family: a validation engine
must validate EMPTY tables (a partition that never arrived, a new corpus)
without crashing or diverging from its oracle.

What this guards (each was a real failure before the guards): ANSI Spark
throws DIVIDE_BY_ZERO where DuckDB's double division yields NaN (profile
ratios); Spark's empty ``collect_set`` renders '' where DuckDB's empty
``string_agg`` is NULL (the is_in domain); and sums over an empty frame are
NULL in both engines where the FD/expectation ledgers should read zero.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from skyline_spark.catalog import QUERIES

AUDIT_FAMILY = [
    "column_profile",
    "constraint_suggestion",
    "fd_check",
    "corpus_divergence_js",
    "ngram_dup_rate",
    "crawl_fetch_plan",
    "robots_policy_eval",
    "anchor_text_topk",
    "lang_confusion_matrix",
    "source_scorecard",
    "expectations_enforce",
    # round-4 additions (same contract: empty tables validate cleanly with
    # exact cross-engine parity)
    "gopher_quality_rules",
    "boilerplate_line_dedup",
    "hll_daily_users",
    "winsorize_doclen",
    "extracted_text_parity",
    "multimodal_media_features",
    "multimodal_resize_frames",
    "detector_ks_gate",
    "detector_adf_tau",
    "replay_ensemble_relational",
    "text_normalize_nfc",
    "bpe_char_coverage",
]


@pytest.fixture(scope="module")
def empty_env(spark, tmp_path_factory):
    """Empty events/documents tables with the real schemas, registered for
    both engines."""
    tmp = str(tmp_path_factory.mktemp("empty_sf"))
    for t in ("events", "documents"):
        src = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        src.limit(0).write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet/*.parquet'"
        )
    return tmp, con


def _norm(v):
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


@pytest.mark.parametrize("name", AUDIT_FAMILY)
def test_empty_input_parity(spark, empty_env, name):
    tmp, con = empty_env
    spec = QUERIES[name]
    sdf = spec.build(spark, tmp)
    srows, scols = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows, ocols = _rows(ocols, res.fetchall())
    assert scols == ocols
    assert srows == orows


def test_empty_table_semantics(spark, empty_env):
    tmp, _ = empty_env
    # no data → no suggestions (not a crash, not NULL-domain proposals)
    assert QUERIES["constraint_suggestion"].build(spark, tmp).count() == 0
    # FDs hold vacuously with explicit zero violations
    for r in QUERIES["fd_check"].build(spark, tmp).collect():
        assert r.holds is True and r.violating_keys == 0
    # the expectation ledger reads all-zero, not NULL
    for r in QUERIES["expectations_enforce"].build(spark, tmp).collect():
        assert r.flagged == 0 and r.dropped == 0 and r.rows_after == 0


@pytest.fixture(scope="module")
def all_null_env(spark, tmp_path_factory):
    """events transformed so EVERY derived page has NULL text (user_id
    scaled onto the %17==0 null predicate) — the all-NULL-column case:
    nn_text = nd_text = 0 in a NON-empty table, where an unguarded oracle
    ratio is NaN (DuckDB 0.0/0.0) but Spark's guarded ratio is NULL."""
    from pyspark.sql import functions as F

    tmp = str(tmp_path_factory.mktemp("allnull_sf"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.withColumn("user_id", F.col("user_id") * 17).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/events.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp}/{t}.parquet/*.parquet'"
        )
    return tmp, con


@pytest.mark.parametrize(
    "name", ["column_profile", "constraint_suggestion", "fd_check",
             "expectations_enforce"]
)
def test_all_null_column_parity(spark, all_null_env, name):
    tmp, con = all_null_env
    spec = QUERIES[name]
    sdf = spec.build(spark, tmp)
    srows, scols = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows, ocols = _rows(ocols, res.fetchall())
    assert scols == ocols
    assert srows == orows
    if name == "column_profile":
        by_key = {(r[0], r[1]): r[2] for r in srows}
        assert by_key[("text", "completeness")] == 0.0
        # distinctness of an all-NULL column is undefined → NULL, never NaN
        assert by_key[("text", "distinctness")] is None

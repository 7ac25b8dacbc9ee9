"""Synthetic page-table tests (FIXTURES.md F1): determinism, skew, defects,
and the byte-identical extracted-text invariant (python fn == JVM expr ==
stored column)."""

import pytest
from pyspark.sql import functions as F

from skyline_spark.functions.extract import extract_text, extract_text_expr
from skyline_spark.sources.synth import defect_days, PAGE_SCHEMA, synth_pages

DEFECT_DAYS = defect_days(8)

N_ROWS = 4000
N_DAYS = 8


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages(spark, N_ROWS, N_DAYS, keep_defect_tag=True)
    df.cache().count()
    return df


def test_schema(pages):
    actual = [(f.name, f.dataType) for f in pages.drop("_day", "_defect").schema]
    expected = [(f.name, f.dataType) for f in PAGE_SCHEMA]
    assert actual == expected  # nullability is a constraint check, not schema shape


def test_deterministic(spark, pages):
    again = synth_pages(spark, N_ROWS, N_DAYS, keep_defect_tag=True)
    a = sorted(pages.select("url", "text", "lang").collect())
    b = sorted(again.select("url", "text", "lang").collect())
    assert a == b


def test_host_skew(pages):
    top = (
        pages.withColumn("host", F.regexp_extract("url", r"https://([^/]+)/", 1))
        .groupBy("host").count().orderBy(F.desc("count")).first()
    )
    share = top["count"] / pages.count()
    assert 0.2 < share < 0.4, f"top-host share {share} outside Zipf fixture band"


def test_lang_mix(pages):
    rates = dict(
        pages.where(F.col("_defect").isNull()).groupBy("lang").count().collect()
    )
    n = sum(r for r in rates.values())
    assert rates["eng"] / n == pytest.approx(0.6, abs=0.05)
    assert set(rates) == {"eng", "deu", "fra", "spa", "zho"}


def test_extract_text_python_parity(pages):
    rows = pages.where(F.col("text").isNotNull()).select("html", "text").limit(200).collect()
    assert rows
    for r in rows:
        assert extract_text(bytes(r["html"])) == r["text"]  # byte-identical


def test_extract_text_expr_parity(pages):
    mismatch = (
        pages.where(F.col("text").isNotNull())
        .where(extract_text_expr(F.col("html")) != F.col("text"))
        .count()
    )
    assert mismatch == 0


def test_defect_duplicates(pages):
    day = DEFECT_DAYS["dup"]
    dups = (
        pages.where(F.dayofmonth("warc_ts") - 1 == day)
        .groupBy("url").count().where("count > 1").count()
    )
    assert dups > 0


def test_defect_bad_lang(pages):
    assert pages.where("lang = 'xx'").count() > 0
    # confined to the defect day
    days = pages.where("lang = 'xx'").select("_day").distinct().collect()
    assert [r["_day"] for r in days] == [DEFECT_DAYS["lang"]]


def test_defect_null_text(pages):
    d5 = pages.where(F.col("_day") == DEFECT_DAYS["null_text"])
    null_rate = d5.where(F.col("text").isNull()).count() / d5.count()
    assert 0.08 < null_rate < 0.16
    # html intact on null-text rows → re-extraction possible
    repaired = d5.where(F.col("text").isNull()).select(
        extract_text_expr(F.col("html")).alias("t")
    )
    assert repaired.where(F.col("t").isNull()).count() == 0


def test_defect_len_shift(pages):
    by_day = (
        pages.where(F.col("text").isNotNull())
        .groupBy("_day").agg(F.avg(F.length("text")).alias("avg_len"))
        .collect()
    )
    lens = {r["_day"]: r["avg_len"] for r in by_day}
    base = sum(v for d, v in lens.items() if d not in (DEFECT_DAYS["len_shift"], DEFECT_DAYS["constant"])) / (len(lens) - 2)
    assert lens[DEFECT_DAYS["len_shift"]] > 2 * base


def test_defect_too_short(pages):
    counts = {r["_day"]: r["count"] for r in pages.groupBy("_day").count().collect()}
    assert counts[N_DAYS - 1] < 0.02 * N_ROWS / N_DAYS


def test_no_defects_mode(spark):
    clean = synth_pages(spark, 1000, N_DAYS, defects=False)
    assert clean.where("lang = 'xx'").count() == 0
    assert clean.where(F.col("text").isNull()).count() == 0
    assert clean.groupBy("url").count().where("count > 1").count() == 0


def test_sample_keep_rate_never_zero(spark):
    """keep_below must floor at 1: past ~1e9 rows the quotient is < 1 and a
    bare cast('long') would truncate to 0, silently null-sampling every
    sample-backed detector at the 10^12-row target scale."""
    from pyspark.sql import functions as F

    from skyline_spark.plans.stats import _keep_rate_expr

    rows = spark.createDataFrame(
        [(1,), (1_000_000,), (1_024_000_001,), (10**12,)], "count long"
    ).select(_keep_rate_expr(F.col("count"), 512).alias("k")).collect()
    ks = [r["k"] for r in rows]
    assert ks[0] == 1_000_000  # tiny partition: keep everything
    assert all(k >= 1 for k in ks)
    assert ks[-1] == 1  # 10^12 rows: floor holds

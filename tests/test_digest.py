"""Mergeable quantile digest: merge exactness + quantile error bound +
checkpoint blob round-trip (north_star: "stat digests (mergeable sketches)")."""

import pytest
from pyspark.sql import functions as F

from skyline_spark.operators.digest import (
    digest_quantile,
    digest_total,
    merge_digests,
    parse_checkpoint_digest,
)
from skyline_spark.plans.stats import length_digest
from skyline_spark.plans.validate import validate
from skyline_spark.sources.synth import synth_pages

REL_ERR = 2 ** (1 / 8) - 1  # bound from DIGEST_BINS_PER_OCTAVE = 8


def _digest_map(df):
    return {
        (r["partition_date"], r["lang"]): dict(r["len_digest"])
        for r in df.collect()
    }


def test_merge_equals_digest_of_union(spark):
    pages = synth_pages(spark, 6_000, 6, defects=False)
    a = pages.where(F.xxhash64("url") % 2 == 0)
    b = pages.where(F.xxhash64("url") % 2 != 0)
    da, db = _digest_map(length_digest(a)), _digest_map(length_digest(b))
    dall = _digest_map(length_digest(pages))
    for key, expect in dall.items():
        merged = merge_digests(
            [d for d in (da.get(key), db.get(key)) if d is not None]
        )
        assert merged == expect, key


def test_quantile_within_relative_error(spark):
    pages = synth_pages(spark, 6_000, 6, defects=False)
    slim = pages.select(F.length("text").alias("text_len")).where(
        F.col("text_len").isNotNull()
    )
    exact = slim.agg(
        F.expr("percentile(text_len, 0.5)").alias("p50"),
        F.expr("percentile(text_len, 0.95)").alias("p95"),
    ).first()
    merged = merge_digests(_digest_map(length_digest(pages)).values())
    assert digest_total(merged) == slim.count()
    for q, ex in (("p50", exact["p50"]), ("p95", exact["p95"])):
        est = digest_quantile(merged, 0.5 if q == "p50" else 0.95)
        assert abs(est - ex) / ex <= REL_ERR + 0.02, (q, est, ex)


def test_checkpoint_blob_roundtrip_and_cross_partition_merge(spark):
    pages = synth_pages(spark, 5_000, 6, defects=False)
    res = validate(pages, run_ts=1_786_406_400.0)
    rows = res.checkpoint.select("stat_digests").collect()
    parsed = [parse_checkpoint_digest(bytes(r["stat_digests"])) for r in rows]
    assert all("row_count" in p["stats"] for p in parsed)
    assert any(p["len_digest"] for p in parsed)
    merged = merge_digests(p["len_digest"] for p in parsed)
    # the merged digest spans the WHOLE table: totals must add up exactly
    n_nonnull = pages.where(F.col("text").isNotNull()).count()
    assert digest_total(merged) == n_nonnull
    est = digest_quantile(merged, 0.5)
    assert est == pytest.approx(
        pages.select(F.expr("percentile(length(text), 0.5)")).first()[0],
        rel=REL_ERR + 0.02,
    )


def test_checkpoint_gk_sketch_merges_to_corpus_quantiles(spark):
    """The GK leg of the blob: per-partition sketches from the checkpoint
    rows k-way-merge into a corpus sketch whose quantiles hit the exact
    corpus quantiles within the 2*eps RANK bound (operators/gk.py)."""
    from skyline_spark.operators.gk import GKSketch
    from skyline_spark.plans.stats import GK_EPS

    pages = synth_pages(spark, 5_000, 6, defects=False)
    res = validate(pages, run_ts=1_786_406_400.0)
    rows = res.checkpoint.select("stat_digests").collect()
    parsed = [parse_checkpoint_digest(bytes(r["stat_digests"])) for r in rows]
    sketches = [p["len_gk"] for p in parsed if p["len_gk"] is not None]
    assert sketches, "no GK sketches in checkpoint blobs"
    merged = GKSketch.merge_many(sketches)

    lens = sorted(
        r[0]
        for r in pages.select(F.length("text")).where(
            F.col("text").isNotNull()
        ).collect()
    )
    assert merged.n == len(lens)
    assert merged.quantile(0.0) == float(lens[0])
    assert merged.quantile(1.0) == float(lens[-1])
    import numpy as np

    arr = np.asarray(lens, dtype=np.float64)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.95):
        est = merged.quantile(q)
        r = max(1, int(np.ceil(q * len(arr))))
        lo = int(np.searchsorted(arr, est, side="left")) + 1
        hi = int(np.searchsorted(arr, est, side="right"))
        err = max(0, lo - r, r - hi)
        assert err <= 2 * GK_EPS * len(arr) + 1, (q, est, err)

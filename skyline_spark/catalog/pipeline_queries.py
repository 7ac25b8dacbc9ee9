"""Pipeline-level queries: the actual validation engine end to end.

These exercise the non-SQL-expressible core (the 9-kernel consensus
ensemble with EWM / Grubbs-threshold / ADF-gated KS inside
``applyInPandas``), so they have no DuckDB oracle — the driver records
rows-only checks, and kernel-level parity is covered by the golden tests
(tests/test_detectors_golden.py replicates the reference's
tests/algorithms_test.py fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import ValidationConfig
from .registry import load, query


def _events_stats_long(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Adapt events into the engine's (partition_date, lang, stat, value)
    stat-series shape: one series per (day, event_type) — event_type plays
    the role of the lang/partition column, exactly as a Redis metric name
    played it in the reference."""
    ev = load(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts")).alias("partition_date")
    wide = ev.groupBy(day, F.col("event_type").alias("lang")).agg(
        F.count("*").cast("double").alias("row_count"),
        F.avg("value").alias("value_avg"),
        F.percentile_approx("value", 0.5, 10_000).cast("double").alias("value_p50"),
        F.max("value").alias("value_max"),
    )
    stats = wide.select(
        "partition_date",
        "lang",
        F.lit(0).cast("long").alias("fingerprint"),
        F.expr(
            "stack(4, 'row_count', row_count, 'value_avg', value_avg, "
            "'value_p50', value_p50, 'value_max', value_max) as (stat, value)"
        ),
    )
    samples = (
        ev.groupBy(day, F.col("event_type").alias("lang"))
        .agg(
            F.transform(
                F.slice(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.xxhash64("event_id").alias("k"),
                                F.col("value").alias("v"),
                            )
                        )
                    ),
                    1,
                    256,
                ),
                lambda s: s["v"],
            ).alias("sample")
        )
        .withColumn("stat", F.lit("text_len"))
    )
    return stats, samples


@query(
    "drift_ensemble_daily",
    None,
    doc="the flagship: full 9-detector consensus ensemble (grouped-map pandas "
        "UDF kernels, reference order settings.py:457-467, CONSENSUS=6 k-of-n "
        "with None counting toward k) over per-(day, event_type) stat series",
)
def drift_ensemble_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.drift import drift_verdicts

    cfg = ValidationConfig(min_history=6, lookback_partitions=30)
    stats, samples = _events_stats_long(spark, sf_dir)
    out = drift_verdicts(
        stats,
        samples,
        cfg,
        drift_stats=["row_count", "value_avg", "value_p50", "value_max"],
        sample_backed={"value_avg", "value_p50"},
    )
    return out.select(
        F.date_format("partition_date", "yyyy-MM-dd").alias("day"),
        F.col("lang").alias("event_type"),
        "stat",
        "status",
        "anomalous",
        # serialized (not ArrayType) so downstream row-level tooling can
        # sort/hash the output; the internal drift plan keeps the array form
        F.concat_ws(",", "triggered").alias("triggered"),
        F.round("datapoint", 6).alias("datapoint"),
    )


@query(
    "validate_pages_full",
    None,
    doc="full validation pipeline (stats → gates → drift → constraints → "
        "verdicts) on the deterministic synthetic page table (BASELINE.json "
        "input_hint schema: url, warc_ts, html:binary, text, lang)",
)
def validate_pages_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.validate import validate
    from ..sources.synth import synth_pages

    pages = synth_pages(spark, n_rows=4000, n_days=10)
    res = validate(pages, ValidationConfig(min_history=4), run_ts=1_700_000_000.0)
    return res.verdicts.select(
        F.date_format("partition_date", "yyyy-MM-dd").alias("partition_date"),
        "lang",
        "status",
        "checks_run",
        "checks_failed",
    )


@query(
    "multimodal_media_features",
    None,
    doc="binary-column multimodal plumbing: Arrow-batched mapInPandas decode/"
        "feature stub over html:binary (decode itself stubbed — no codec "
        "libs in container; schema/batching/partitioning real)",
)
def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import extract_media_features
    from ..sources.synth import synth_pages

    pages = synth_pages(spark, n_rows=500, n_days=4, defects=False)
    return extract_media_features(pages)


@query(
    "multimodal_resize_frames",
    None,
    doc="the other two multimodal verbs: resize (1→1 binary map, payload "
        "bounded to max_side) and frame-sample (1→N mapInPandas explode, "
        "every stride-th frame) — decode stubbed as above, the Spark-side "
        "schema/batch/cardinality plumbing real; output is the per-url "
        "join of resized dims with sampled-frame counts",
)
def multimodal_resize_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import resize_images, sample_frames
    from ..sources.synth import synth_pages

    pages = synth_pages(spark, n_rows=500, n_days=4, defects=False)
    resized = resize_images(pages, max_side=256).select(
        "url", "out_w", "out_h", F.round("scale", 6).alias("scale")
    )
    frames = (
        sample_frames(pages, stride=5)
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("frames_sampled"),
            F.max("n_frames").cast("long").alias("n_frames"),
            F.sum(F.length("frame")).cast("long").alias("frame_bytes"),
        )
    )
    return resized.join(frames, "url").orderBy("url")


@query(
    "extracted_text_parity",
    None,
    doc="north-star invariant: extracted text is byte-identical per url — "
        "JVM regexp extraction chain vs the stored text column",
)
def extracted_text_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.extract import extract_text_expr
    from ..sources.synth import synth_pages

    pages = synth_pages(spark, n_rows=2000, n_days=8)
    # eqNullSafe, not ==: a broken extractor returning NULL against
    # non-null text would make (NULL == text) -> NULL, the when() skip it,
    # and the north-star invariant report a clean pass on fully broken
    # extraction. Null-safe inequality counts every divergence; rows whose
    # stored text is intentionally null are excluded explicitly.
    return pages.select(
        F.count("*").cast("long").alias("n_rows"),
        F.count(
            F.when(
                F.col("text").isNotNull()
                & ~extract_text_expr(F.col("html")).eqNullSafe(F.col("text")),
                1,
            )
        )
        .cast("long")
        .alias("n_mismatched"),
    )

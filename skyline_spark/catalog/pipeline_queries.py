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
from ..functions import text as X
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


# --- extracted-text parity, oracled (r3 ask #6) ----------------------------
#
# The north-star invariant is "extracted text byte-identical per url". The
# synth-table form of this check is pinned by tests/test_synth.py (the
# xxhash64-seeded fixture is not DuckDB-mirrorable); the CATALOG query now
# derives a page corpus from `events` with only SQL-expressible transforms,
# runs the REAL production extraction chain (functions/extract.py::
# extract_text_expr — the codegen regexp path used by plans/validate) on the
# Spark side, and the oracle regenerates the same corpus AND independently
# restates the extraction with DuckDB's RE2 engine — a genuine cross-engine
# check of the extraction semantics, anchored by per-row h32 sums rather
# than a bare 0 == 0.

_ETP_SRC = "paragraph text body " * 12  # 240 chars, shared literal
# ~1-in-17 rows get an article-less page with NULL stored text — exercises
# the extractor's NULL branch on both engines
_ETP_TEXT_SQL = (
    "array_to_string(list_transform(range(1, 2 + user_id % 3), "
    f"i -> substr('{_ETP_SRC}', 1, (1 + ((floor(value)::BIGINT + i * 7) % 120))::INT)), chr(10))"
)
_ETP_TEXT_SPARK = (
    "array_join(transform(sequence(1, cast(1 + user_id % 3 as int)), "
    f"i -> substring('{_ETP_SRC}', 1, cast(1 + ((cast(floor(value) as bigint) + i * 7) % 120) as int))), '\\n')"
)

_ETP_HTML_TMPL = (
    "'<html><head><title>h' || (user_id % 40) || '</title></head>"
    "<body><nav><a href=\"https://www.example.org/\">home</a></nav>"
    "<article><p>' || {body} || '</p></article>"
    "<footer>crawl</footer></body></html>'"
)

_ETP_SQL = f"""
WITH pages AS (
  SELECT 'https://h' || (user_id % 40) || '.example.org/p/' || event_id AS url,
         event_type,
         CASE WHEN user_id % 17 = 0 THEN NULL ELSE {_ETP_TEXT_SQL} END AS text,
         CASE WHEN user_id % 17 = 0
              THEN '<html><head><title>bare</title></head><body>no article</body></html>'
              ELSE {_ETP_HTML_TMPL.format(body=f"replace({_ETP_TEXT_SQL}, chr(10), '</p><p>')")}
              END AS page
  FROM events
), ex AS (
  SELECT event_type, text,
         nullif(regexp_replace(regexp_replace(
                  regexp_extract(page, '(?s)<article>(.*?)</article>', 1),
                  '(?s)</p>\\s*<p>', chr(10), 'g'),
                '(?s)</?p>', '', 'g'), '') AS extracted
  FROM pages
)
SELECT event_type,
       count(*)::BIGINT AS n_rows,
       count(*) FILTER (WHERE extracted IS DISTINCT FROM text)::BIGINT
         AS n_mismatched,
       count(extracted)::BIGINT AS n_extracted,
       coalesce(sum(length(extracted)), 0)::BIGINT AS extracted_chars,
       coalesce(sum({X.h32_sql('extracted')}), 0)::BIGINT AS extracted_h32_sum
FROM ex GROUP BY event_type ORDER BY event_type
"""


@query(
    "extracted_text_parity",
    _ETP_SQL,
    doc="north-star extraction invariant, oracled: a page corpus derived "
        "from events with only SQL-expressible transforms (multi-"
        "paragraph text, the synth HTML template, an article-less NULL "
        "branch) is extracted by the REAL production codegen chain "
        "(functions/extract.py::extract_text_expr) on the Spark side, "
        "while DuckDB independently regenerates the corpus and restates "
        "the extraction with its own RE2 regexps — mismatch counts plus "
        "length/h32 sums anchor the comparison to the actual bytes; the "
        "synth-fixture form of the invariant stays pinned by "
        "tests/test_synth.py",
)
def extracted_text_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.extract import extract_text_expr

    ev = load(spark, sf_dir, "events")
    text = F.expr(_ETP_TEXT_SPARK)
    page = F.concat(
        F.lit("<html><head><title>h"),
        F.pmod("user_id", F.lit(40)).cast("string"),
        F.lit(
            '''</title></head><body><nav><a href="https://www.example.org/">home</a></nav><article><p>'''
        ),
        F.regexp_replace(text, "\n", "</p><p>"),
        F.lit("</p></article><footer>crawl</footer></body></html>"),
    )
    bare = F.lit(
        "<html><head><title>bare</title></head><body>no article</body></html>"
    )
    is_bare = F.pmod("user_id", F.lit(17)) == 0
    pages = ev.select(
        "event_type",
        F.when(is_bare, F.lit(None).cast("string")).otherwise(text).alias("text"),
        F.encode(F.when(is_bare, bare).otherwise(page), "UTF-8").alias("html"),
    )
    ex = pages.select(
        "event_type",
        "text",
        extract_text_expr(F.col("html")).alias("extracted"),
    )
    return (
        ex.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count(
                F.when(~F.col("extracted").eqNullSafe(F.col("text")), 1)
            ).cast("long").alias("n_mismatched"),
            F.count("extracted").cast("long").alias("n_extracted"),
            F.coalesce(F.sum(F.length("extracted")), F.lit(0))
            .cast("long").alias("extracted_chars"),
            F.coalesce(F.sum(X.h32(F.col("extracted"))), F.lit(0))
            .cast("long").alias("extracted_h32_sum"),
        )
        .orderBy("event_type")
    )


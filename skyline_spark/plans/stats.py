"""Per-partition column statistics — the relational heart of the engine.

One columnar scan of the subject table produces, per (partition_date, lang):

- a wide stats row (row_count, null rates, text-length aggregates, approx
  url cardinality via HyperLogLog, a partition content fingerprint), melted
  into long form ``(partition_date, lang, stat, value)``;
- a bounded, deterministic value *sample* per distribution-drift stat
  (``text_len``), used by the ks_test detector (reference = prior
  partitions' samples, probe = current — SURVEY §2.1 #9).

Scale notes (10^12 rows):
- everything is a single ``groupBy(partition_cols).agg`` — map-side partial
  aggregation, one shuffle of pre-aggregated data, no collect;
- the sample is hash-selected (``xxhash64(url) % K < r``), NOT rand(), so
  retries/speculative tasks produce identical rows; the rate is derived
  from a first cheap count pass so each partition lands ≈ sample_cap rows
  regardless of partition size (no unbounded collect_list);
- the content fingerprint is a commutative SUM of row hashes — mergeable,
  order-independent, and usable as a snapshot id for resume (a changed
  partition changes its fingerprint). Equivalent to an Iceberg snapshot-id
  in spirit (SURVEY §1.2) without requiring an Iceberg catalog.

The reference analog: Skyline's per-metric series living in Redis
(`horizon/worker.py:208-217`); here the "series" is the per-partition stat
vector persisted in the checkpoint table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "stat_digest_blobs",
    "partition_stats",
    "narrow_partition_keys",
    "stat_samples",
    "slim_pages",
    "length_digest",
    "length_gk",
    "DRIFT_STATS",
    "PARTITION_COLS",
    "DIGEST_BINS_PER_OCTAVE",
    "GK_EPS",
]

PARTITION_COLS = ["partition_date", "lang"]

# stats whose per-partition series feed the drift ensemble
DRIFT_STATS = [
    "row_count",
    "null_rate_text",
    "text_len_avg",
    "text_len_p50",
    "text_len_p95",
    "url_distinct_ratio",
]

# the stat whose raw per-row values are sampled for ks_test
SAMPLE_STAT = "text_len"


def with_partition(df: DataFrame) -> DataFrame:
    """Derive the partition key — days(warc_ts), the Iceberg partition spec."""
    return df.withColumn("partition_date", F.to_date("warc_ts"))


def slim_pages(pages: DataFrame) -> DataFrame:
    """Project the page table down to the derived columns every validation
    stage needs — ONE scan of the heavy columns (html is multi-KB per row;
    text is hundreds of bytes) instead of one per stage. validate() persists
    this frame: ~100 bytes/row, so at any scale it is ~50x smaller than the
    source table; at 10^12 rows it would be written to a scratch table
    instead of memory, same shape."""
    if "text_len" in pages.columns:
        return pages  # already slim
    return with_partition(pages).select(
        "partition_date",
        "lang",
        "url",
        "warc_ts",
        F.length("text").alias("text_len"),
        F.col("text").isNull().alias("text_null"),
        F.col("html").isNull().alias("html_null"),
    )


def _fingerprint_expr() -> F.Column:
    """Commutative content fingerprint → snapshot id for resume (decimal
    accumulator: ANSI-safe at 10^12 rows, folded back to long). Shared by
    the full stats pass and the narrow change-detection pass so the two can
    never disagree on what "changed" means."""
    return F.pmod(
        F.sum(F.xxhash64("url", "warc_ts", "lang").cast("decimal(38,0)")),
        F.lit(2**61 - 1).cast("decimal(38,0)"),
    ).cast("long")


def narrow_partition_keys(pages: DataFrame, native_col: str | None = None) -> DataFrame:
    """Change detection WITHOUT touching the heavy columns: per
    (partition_date, lang), the content fingerprint from a scan of
    (url, warc_ts, lang) only — parquet column pruning skips html/text
    entirely, so on a 10^12-row table this pass reads a few percent of the
    bytes the full stats pass would. On Iceberg the same information comes
    from snapshot metadata with NO scan; this is the parquet-faithful
    analog (SURVEY §1.2). Used by the pruned-resume path
    (plans/validate.py) to decide which partitions need the heavy scan.

    ``native_col``: name of a physical partition column to AUDIT against
    the derived days(warc_ts) key in the same pass — adds a
    ``native_mismatch`` count per pair (rows where the two disagree,
    null-safe). The pruned-resume filter only trusts the physical layout
    for file-level pruning when every partition's count is zero."""
    cols = ["url", "warc_ts", "lang"] + ([native_col] if native_col else [])
    narrow = with_partition(pages.select(*cols))
    aggs = [_fingerprint_expr().alias("fingerprint")]
    if native_col:
        aggs.append(
            F.sum(
                (~F.col(native_col).eqNullSafe(F.col("partition_date")))
                .cast("long")
            ).alias("native_mismatch")
        )
    return narrow.groupBy(*PARTITION_COLS).agg(*aggs)


def partition_stats(pages: DataFrame) -> DataFrame:
    """Long-form per-(partition, lang) stats in two codegen'd agg passes.

    Pass 1: all algebraic/sketch aggregates (count, null rates, avg, HLLs,
    fingerprint) — one whole-stage-codegen HashAggregate, map-side partials,
    one shuffle of pre-aggregated rows.

    Pass 2: EXACT text-length percentiles from a (partition, lang, len)
    histogram + window cumsum. ``percentile_approx`` is an
    ObjectHashAggregate (row-at-a-time, no codegen) and measured ~30x
    slower than this at 2M rows; the histogram stays codegen'd because
    text_len is a bounded integer (groups = partitions x langs x distinct
    lengths — bounded at any table size, so this scales to 10^12 rows).
    Exact percentiles also make the stat series noise-free for drift.
    """
    pages = slim_pages(pages)
    text_len = F.col("text_len")
    wide = pages.groupBy(*PARTITION_COLS).agg(
        F.count(F.lit(1)).alias("row_count"),
        F.avg(F.col("text_null").cast("double")).alias("null_rate_text"),
        F.avg(F.col("html_null").cast("double")).alias("null_rate_html"),
        F.avg(text_len).alias("text_len_avg"),
        F.approx_count_distinct("url").alias("url_approx_distinct"),
        # HLL, NOT count_distinct: an exact distinct triggers Catalyst's
        # two-phase expand rewrite, which keys the partial aggregation on
        # (partition, lang, text_len) and drags every other agg buffer
        # through |distinct lengths|x more groups — measured 25x slower
        F.approx_count_distinct(text_len).alias("text_len_distinct"),
        # snapshot id for resume — shared with narrow_partition_keys
        _fingerprint_expr().alias("fingerprint"),
    )
    wide = wide.withColumn(
        "url_distinct_ratio",
        F.col("url_approx_distinct") / F.greatest(F.col("row_count"), F.lit(1)),
    )

    pct = _exact_length_percentiles(pages, text_len)
    wide = wide.join(pct, PARTITION_COLS, "left")

    stat_cols = DRIFT_STATS + ["null_rate_html", "text_len_distinct"]
    stack_expr = ", ".join(f"'{s}', cast(`{s}` as double)" for s in stat_cols)
    long = wide.select(
        *PARTITION_COLS,
        "fingerprint",
        F.expr(f"stack({len(stat_cols)}, {stack_expr}) as (stat, value)"),
    )
    return long


def _exact_length_percentiles(pages: DataFrame, text_len) -> DataFrame:
    """Exact p50/p95 of an integer-valued column via histogram + cumsum.

    Inverted-CDF (type-1) quantile: smallest value whose cumulative count
    reaches ceil(q * total). One codegen'd 3-key count, one tiny window.
    """
    from pyspark.sql import Window

    hist = (
        pages.where(text_len.isNotNull())
        .groupBy(*PARTITION_COLS, text_len.alias("len"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*PARTITION_COLS).orderBy("len")
    wp = Window.partitionBy(*PARTITION_COLS)
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(wp)
    )
    return cum.groupBy(*PARTITION_COLS).agg(
        F.min(
            F.when(F.col("cum") >= F.ceil(F.col("total") * 0.5), F.col("len"))
        ).cast("double").alias("text_len_p50"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.col("total") * 0.95), F.col("len"))
        ).cast("double").alias("text_len_p95"),
    )


# log-spaced bins per octave for the mergeable quantile digest: boundaries
# are GLOBAL constants (bin b covers [2^(b/K)−1, 2^((b+1)/K)−1)), so merging
# digests across partitions/snapshots is exact count addition; quantile
# estimates carry ≤ 2^(1/K)−1 ≈ 9% relative error
DIGEST_BINS_PER_OCTAVE = 8


def length_histogram(pages: DataFrame) -> DataFrame:
    """Per-(partition, lang, text_len) counts — the ONE scan both digest
    legs (log-histogram + GK sketch) derive from. text_len is a bounded
    integer, so the group count is bounded by partitions x langs x distinct
    lengths at any table size and the agg stays whole-stage-codegen'd."""
    pages = slim_pages(pages)
    return (
        pages.where(F.col("text_len").isNotNull())
        .groupBy(*PARTITION_COLS, F.col("text_len").alias("len"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def length_digest(pages: DataFrame) -> DataFrame:
    """Mergeable per-(partition, lang) quantile digest of text_len.

    north_star: the checkpoint carries "stat digests (mergeable sketches)".
    A fixed-boundary log histogram is the simplest digest with the t-digest/
    KLL merge property (merge = add counts — no interpolation, no ordering
    concerns), is fully codegen'd (no UDF), and its size is bounded by
    K·log2(max_len) entries regardless of row count. Quantiles of any UNION
    of partitions come from the merged counts (operators/digest.py).
    """
    return length_digest_from_hist(length_histogram(pages))


def length_digest_from_hist(hist: DataFrame) -> DataFrame:
    """Log-histogram digest from the shared length_histogram frame —
    re-binning the tiny pre-aggregated counts, not the page table."""
    b = (
        F.floor(F.log2(F.col("len") + F.lit(1.0)) * DIGEST_BINS_PER_OCTAVE)
        .cast("int")
    )
    binned = hist.groupBy(*PARTITION_COLS, b.alias("bin")).agg(
        F.sum("cnt").alias("cnt")
    )
    return binned.groupBy(*PARTITION_COLS).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("bin", "cnt")))
        ).alias("len_digest")
    )


#: rank-error bound of the checkpoint's Greenwald-Khanna length sketch
GK_EPS = 0.01


def length_gk(pages: DataFrame) -> DataFrame:
    """Per-(partition, lang) GK sketch of text_len — wrapper over
    :func:`length_gk_from_hist` for standalone use."""
    return length_gk_from_hist(length_histogram(pages))


def length_gk_from_hist(hist: DataFrame) -> DataFrame:
    """Per-(partition, lang) Greenwald-Khanna sketch of text_len as a JSON
    column — the checkpoint's rank-error-bounded quantile digest
    (operators/gk.py; north_star "quantile sketches via t-digest/GK").

    Built from the shared length_histogram frame (the same bounded-integer
    (len, count) shape the exact-percentile pass uses): an Arrow-batched
    pandas UDF folds each group's sorted histogram into a sketch. No
    per-row Python — the UDF sees one row per (partition, lang) whose
    payload is the histogram array, bounded by the distinct-length count
    at any table size.
    """
    import json

    from pyspark.sql.functions import pandas_udf

    from ..operators.gk import GKSketch

    @pandas_udf("string")
    def _gk(hists: pd.Series) -> pd.Series:
        out = []
        for h in hists:
            sk = GKSketch.from_value_counts(
                [float(e["len"]) for e in h], [int(e["cnt"]) for e in h],
                eps=GK_EPS,
            )
            out.append(json.dumps(sk.to_dict()))
        return pd.Series(out)

    arr = hist.groupBy(*PARTITION_COLS).agg(
        F.sort_array(F.collect_list(F.struct("len", "cnt"))).alias("_h")
    )
    return arr.select(*PARTITION_COLS, _gk(F.col("_h")).alias("len_gk"))


#: hash-space denominator of the sampling keep-rate
SAMPLE_DENOM = 1_000_000


def _keep_rate_expr(count_col, sample_cap: int):
    """keep_below threshold in [1, SAMPLE_DENOM] for a partition of
    ``count_col`` rows — expected survivors ≈ 2·sample_cap.

    greatest(1, ...): past ~1e9 rows the quotient drops below 1 and a bare
    cast('long') truncates to 0, keeping NOTHING — which would silently
    null-sample every sample-backed detector at exactly the 10^12-row scale
    this module targets. A floor of 1 keeps ≈ count/SAMPLE_DENOM rows (the
    collect is bounded by sample_cap regardless).
    """
    return F.greatest(
        F.lit(1),
        F.least(
            F.lit(SAMPLE_DENOM),
            (F.lit(SAMPLE_DENOM) * F.lit(2) * sample_cap / count_col).cast("long"),
        ),
    )


def stat_samples(pages: DataFrame, sample_cap: int = 512) -> DataFrame:
    """Deterministic ≤ sample_cap text-length sample per (partition, lang).

    Two cheap passes: (1) per-partition counts → per-partition keep-rate,
    (2) hash-filtered scan + bounded collect. The joined rate table is tiny
    (one row per partition) → broadcast join, no extra shuffle of page data.
    """
    pages = slim_pages(pages).where(~F.col("text_null"))
    counts = pages.groupBy(*PARTITION_COLS).count()
    denom = SAMPLE_DENOM
    rates = counts.select(
        *PARTITION_COLS,
        _keep_rate_expr(F.col("count"), sample_cap).alias("keep_below"),
    )
    sampled = (
        pages.join(F.broadcast(rates), PARTITION_COLS)
        .where(F.pmod(F.xxhash64("url", F.lit("sample")), F.lit(denom)) < F.col("keep_below"))
        .groupBy(*PARTITION_COLS)
        .agg(
            # collect_list order is nondeterministic across shuffles; sorting
            # by a per-row hash fixes BOTH determinism and a pseudo-random
            # arrival order for the ADF stationarity gate inside ks_test
            F.transform(
                F.slice(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.xxhash64("url", F.lit("order")).alias("k"),
                                F.col("text_len").cast("double").alias("v"),
                            )
                        )
                    ),
                    1,
                    sample_cap,
                ),
                lambda s: s["v"],
            ).alias("sample")
        )
        .withColumn("stat", F.lit(SAMPLE_STAT))
    )
    return sampled.select(*PARTITION_COLS, "stat", "sample")


def stat_digest_blobs(stats_long: DataFrame, len_hist: DataFrame) -> DataFrame:
    """Per-(partition, lang) checkpoint blob: ``{"stats": scalar map,
    "len_digest": log-histogram, "len_gk": GK sketch}`` as one JSON binary.

    The north-star "stat digests (mergeable sketches)" column: the
    log-histogram's bin boundaries are global constants so digests from any
    set of checkpoint rows merge by count addition (operators/digest.py);
    the GK sketch complements it with a RANK-error bound — sketches from
    any set of rows combine via GKSketch.merge_many with a 2·eps guarantee
    at any fan-in (operators/gk.py). Factored out of validate() so the
    round-trip query (catalog/flagship_queries.py
    ``checkpoint_digest_quantiles``) exercises the production assembly.
    """
    scalar_map = F.map_from_entries(
        F.collect_list(F.struct(F.col("stat"), F.col("value")))
    )
    return (
        stats_long.groupBy(*PARTITION_COLS)
        .agg(scalar_map.alias("_stats_map"))
        .join(length_digest_from_hist(len_hist), PARTITION_COLS, "left")
        .join(length_gk_from_hist(len_hist), PARTITION_COLS, "left")
        .select(
            *PARTITION_COLS,
            F.to_json(
                F.struct(
                    F.col("_stats_map").alias("stats"),
                    F.col("len_digest"),
                    F.col("len_gk"),
                )
            ).cast("binary").alias("stat_digests"),
        )
    )

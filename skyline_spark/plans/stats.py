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

from pyspark.sql import DataFrame, functions as F

__all__ = ["partition_stats", "stat_samples", "DRIFT_STATS", "PARTITION_COLS"]

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


def partition_stats(pages: DataFrame) -> DataFrame:
    """Long-form per-(partition, lang) stats in ONE aggregation pass."""
    pages = with_partition(pages)
    text_len = F.length("text")
    wide = pages.groupBy(*PARTITION_COLS).agg(
        F.count(F.lit(1)).alias("row_count"),
        F.avg(F.col("text").isNull().cast("double")).alias("null_rate_text"),
        F.avg(F.col("html").isNull().cast("double")).alias("null_rate_html"),
        F.avg(text_len).alias("text_len_avg"),
        F.percentile_approx(text_len, 0.5, 10_000).alias("text_len_p50"),
        F.percentile_approx(text_len, 0.95, 10_000).alias("text_len_p95"),
        F.approx_count_distinct("url").alias("url_approx_distinct"),
        F.count_distinct(F.length("text")).alias("text_len_distinct"),
        # commutative content fingerprint → snapshot id for resume
        # (decimal accumulator: ANSI-safe at 10^12 rows, folded back to long)
        F.pmod(
            F.sum(F.xxhash64("url", "warc_ts", "lang").cast("decimal(38,0)")),
            F.lit(2**61 - 1).cast("decimal(38,0)"),
        ).cast("long").alias("fingerprint"),
    )
    wide = wide.withColumn(
        "url_distinct_ratio",
        F.col("url_approx_distinct") / F.greatest(F.col("row_count"), F.lit(1)),
    )

    stat_cols = DRIFT_STATS + ["null_rate_html", "text_len_distinct"]
    stack_expr = ", ".join(f"'{s}', cast(`{s}` as double)" for s in stat_cols)
    long = wide.select(
        *PARTITION_COLS,
        "fingerprint",
        F.expr(f"stack({len(stat_cols)}, {stack_expr}) as (stat, value)"),
    )
    return long


def stat_samples(pages: DataFrame, sample_cap: int = 512) -> DataFrame:
    """Deterministic ≤ sample_cap text-length sample per (partition, lang).

    Two cheap passes: (1) per-partition counts → per-partition keep-rate,
    (2) hash-filtered scan + bounded collect. The joined rate table is tiny
    (one row per partition) → broadcast join, no extra shuffle of page data.
    """
    pages = with_partition(pages).where(F.col("text").isNotNull())
    counts = pages.groupBy(*PARTITION_COLS).count()
    denom = 1_000_000
    rates = counts.select(
        *PARTITION_COLS,
        F.least(
            F.lit(denom),
            (F.lit(denom) * F.lit(2) * sample_cap / F.col("count")).cast("long"),
        ).alias("keep_below"),
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
                                F.length("text").cast("double").alias("v"),
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

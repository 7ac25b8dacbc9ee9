"""Declarative schema / uniqueness / referential / static constraints.

The Boundary restatement (SURVEY §2.6): per-metric static-threshold tuples
become declarative specs evaluated as Column predicates; violations are rows
in the sidecar table (FIXTURES F5 schema), never driver-side loops.

Violation volume control (10^12-row posture): per-partition example rows are
capped with a rank-window (counts stay exact in ``observed``); the cap is the
only window in the plan and runs on already-filtered violation candidates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from .stats import PARTITION_COLS, with_partition

__all__ = [
    "VIOLATION_SCHEMA",
    "StaticRule",
    "DEFAULT_LANG_ALLOWLIST",
    "schema_violations",
    "uniqueness_violations",
    "referential_violations",
    "static_rule_violations",
    "empty_violations",
]

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("partition_date", T.DateType()),
        T.StructField("lang", T.StringType()),
        T.StructField("check", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("url", T.StringType()),          # null for partition-level
        T.StructField("observed", T.StringType()),
        T.StructField("expected", T.StringType()),
        T.StructField("triggered_algorithms", T.ArrayType(T.StringType())),
    ]
)

# ISO-639-3 subset the synthetic crawl may legally contain (FIXTURES F1)
DEFAULT_LANG_ALLOWLIST = [
    "eng", "deu", "fra", "spa", "zho", "por", "ita", "nld", "rus", "jpn",
    "kor", "ara", "hin", "ben", "pol", "tur", "vie", "tha", "swe", "ces",
]


@dataclass(frozen=True)
class StaticRule:
    """Boundary-style static threshold on a per-partition stat.

    ops mirror `boundary/boundary_algorithms.py`: ``less_than`` fires when
    the stat is below ``trigger`` (:104-123), ``greater_than`` when above
    (:126-142).
    """

    stat: str
    op: str           # "less_than" | "greater_than"
    trigger: float


def empty_violations(spark) -> DataFrame:
    return spark.createDataFrame([], VIOLATION_SCHEMA)


def _finish(df: DataFrame, check: str, column: str, expected: str) -> DataFrame:
    return df.select(
        "partition_date",
        "lang",
        F.lit(check).alias("check"),
        F.lit(column).alias("column"),
        df["url"].cast("string").alias("url") if "url" in df.columns else F.lit(None).cast("string").alias("url"),
        F.col("observed").cast("string"),
        F.lit(expected).alias("expected"),
        F.lit(None).cast(T.ArrayType(T.StringType())).alias("triggered_algorithms"),
    )


def schema_violations(pages: DataFrame, expected: T.StructType) -> DataFrame:
    """Expected StructType vs actual — table-level, evaluated on the driver
    (schema is metadata, not data; no job is launched)."""
    actual = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    rows = []
    for f in expected.fields:
        got = actual.get(f.name)
        want = f.dataType.simpleString()
        if got is None:
            rows.append((f.name, "<missing>", want))
        elif got != want:
            rows.append((f.name, got, want))
    for name in actual:
        # a DATE-typed `partition_date` is the declared partition spec
        # (days(warc_ts)) materialized as a physical column by the
        # hive-parquet layout — Iceberg keeps the same transform hidden in
        # metadata, so its presence is a storage-layout detail, not a
        # schema deviation. Any OTHER type under that name is still
        # reported: it is not the partition spec, and the pruned-resume
        # path separately audits even a date-typed column's VALUES against
        # days(warc_ts) before trusting it (plans/validate.py).
        if (
            name not in {f.name for f in expected.fields}
            and not name.startswith("_")
            and not (name == "partition_date" and actual[name] == "date")
        ):
            rows.append((name, actual[name], "<unexpected column>"))
    spark = pages.sparkSession
    out = spark.createDataFrame(
        [(None, None, "schema", c, None, o, e, None) for c, o, e in rows],
        VIOLATION_SCHEMA,
    )
    return out


def uniqueness_violations(pages: DataFrame, key: str = "url", max_examples: int = 20) -> DataFrame:
    """Duplicate-key rows per partition (url uniqueness, north_star).

    Two-phase hash prefilter: phase 1 shuffles only ``(partition,
    xxhash64(key))`` — 8 bytes instead of a full url string, the whole-table
    shuffle that dominates this check — and keeps hash groups seen more
    than once. Phase 2 re-groups ONLY rows whose hash is a candidate by the
    actual key, which both restores exactness (64-bit collisions drop out
    here) and fetches the example urls. When duplicates are rare (the
    steady-state for a crawl table) phase 2 touches a negligible row set;
    the candidate side is broadcast, and a duplicate-heavy table at scale
    would flip that join to shuffled-hash via AQE by removing the hint.
    """
    pages = with_partition(pages)
    kh = F.xxhash64(F.col(key).cast("string"))
    cand_hashes = (
        pages.select(*PARTITION_COLS, kh.alias("_kh"))
        .groupBy(*PARTITION_COLS, "_kh")
        .count()
        .where(F.col("count") > 1)
        .select(*PARTITION_COLS, "_kh")
    )
    dup_counts = (
        pages.withColumn("_kh", kh)
        .join(F.broadcast(cand_hashes), [*PARTITION_COLS, "_kh"], "left_semi")
        .groupBy(*PARTITION_COLS, key)
        .count()
        .where(F.col("count") > 1)
    )
    w = Window.partitionBy(*PARTITION_COLS).orderBy(F.col("count").desc(), F.col(key))
    capped = (
        dup_counts.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= max_examples)
        .withColumn("observed", F.concat(F.lit("count="), F.col("count")))
        .withColumn("url", F.col(key))
    )
    return _finish(capped, "uniqueness", key, "count=1")


def referential_violations(
    pages: DataFrame,
    lang_allowlist: Sequence[str] = tuple(DEFAULT_LANG_ALLOWLIST),
    ts_min: str = "2000-01-01",
    ts_max: str = "2100-01-01",
    max_examples: int = 20,
) -> DataFrame:
    """lang ∈ allowlist and warc_ts within the crawl window (north_star).

    The allowlist is a literal isin → Catalyst folds it into the scan filter
    (at larger domains this becomes a broadcast join against a rules table).
    """
    pages = with_partition(pages)
    # cast to string first: a wrong-typed lang column is a *schema* finding,
    # not a reason to crash the referential scan (ANSI isin would throw)
    lang_str = F.col("lang").cast("string")
    bad_lang = pages.where(
        lang_str.isNull() | ~lang_str.isin(list(lang_allowlist))
    ).select(*PARTITION_COLS, "url", lang_str.alias("observed"))
    w = Window.partitionBy(*PARTITION_COLS).orderBy("url")
    bad_lang = bad_lang.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= max_examples)
    lang_v = _finish(bad_lang, "referential", "lang", f"one of {len(lang_allowlist)} ISO-639-3 codes")

    bad_ts = pages.where(
        F.col("warc_ts").isNull()
        | (F.col("warc_ts") < F.lit(ts_min).cast("timestamp"))
        | (F.col("warc_ts") >= F.lit(ts_max).cast("timestamp"))
    ).select(*PARTITION_COLS, "url", F.col("warc_ts").cast("string").alias("observed"))
    bad_ts = bad_ts.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= max_examples)
    ts_v = _finish(bad_ts, "referential", "warc_ts", f"[{ts_min}, {ts_max})")

    return lang_v.unionAll(ts_v)


def static_rule_violations(stats_long: DataFrame, rules: Sequence[StaticRule]) -> DataFrame:
    """Boundary static thresholds evaluated on the (tiny) stats table."""
    out = None
    for rule in rules:
        if rule.op == "less_than":
            pred = F.col("value") < F.lit(rule.trigger)
        elif rule.op == "greater_than":
            pred = F.col("value") > F.lit(rule.trigger)
        else:
            raise ValueError(f"unknown op {rule.op!r}")
        hits = (
            stats_long.where(F.col("stat") == rule.stat)
            .where(pred)
            .select(
                "partition_date",
                "lang",
                F.lit("static").alias("check"),
                F.col("stat").alias("column"),
                F.lit(None).cast("string").alias("url"),
                F.col("value").cast("string").alias("observed"),
                F.lit(f"not {rule.op} {rule.trigger}").alias("expected"),
                F.lit(None).cast(T.ArrayType(T.StringType())).alias("triggered_algorithms"),
            )
        )
        out = hits if out is None else out.unionAll(hits)
    if out is None:
        return empty_violations(stats_long.sparkSession)
    return out

"""Ionosphere profile training — the operator-feedback WRITE path.

Reference semantics: when an operator marks a flagged anomaly as a false
positive, Ionosphere trains a features profile from the anomalous window —
the full tsfresh feature matrix is extracted and its ``features_count`` /
``features_sum`` persisted alongside the metric and window metadata
(`features_profile.py:54-503`, sum/count at `:466-482`; profile creation
`ionosphere_functions.py`) — and later windows whose ``features_sum`` sits
within IONOSPHERE_FEATURES_PERCENT_SIMILAR of ANY approved profile are
suppressed, not alerted (`ionosphere/ionosphere.py:1864-1998`), with the
min-max-scaled second chance when raw sums disagree but both series ranges
agree within IONOSPHERE_MINMAX_SCALING_RANGE_TOLERANCE
(`ionosphere/ionosphere.py:2269-2455`, `settings.py:1750,1781`).

Spark restatement: profiles are rows of an append-only parquet/Iceberg
``profiles`` table (PROFILE_SCHEMA — the Iceberg mapping note in
plans/checkpoint.py applies 1:1). Training is ONE pass of the production
101-calculator relational feature matrix (catalog/tsfresh_calculators.py —
the same pipeline behind the tsfresh_features / ionosphere_tsfresh_match
queries, not a stand-in) over the flagged windows, computing the raw and
the min-max-scaled variants together by keying the series frame on
STRUCT(event_type, variant) — so the scaled second-chance sums are
precomputed at train time from the profile's own range, exactly what the
reference recomputes from its stored fp timeseries at match time. Matching
is a broadcast join of current-window sums against the (tiny) profile
table: the flagged-window volume is operator-feedback-sized, never
corpus-sized, so every frame here is checkpoint-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

__all__ = [
    "PROFILE_SCHEMA",
    "PROFILE_PERCENT_SIMILAR",
    "MINMAX_RANGE_TOLERANCE",
    "train_profiles",
    "append_profiles",
    "load_profiles",
    "match_profiles",
]

#: settings.py:1750 IONOSPHERE_FEATURES_PERCENT_SIMILAR
PROFILE_PERCENT_SIMILAR = 1.0
#: settings.py:1781 IONOSPHERE_MINMAX_SCALING_RANGE_TOLERANCE
MINMAX_RANGE_TOLERANCE = 0.15

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("profile_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("features_count", T.LongType()),
        T.StructField("features_sum", T.DoubleType()),
        T.StructField("value_min", T.DoubleType()),
        T.StructField("value_max", T.DoubleType()),
        T.StructField("features_sum_scaled", T.DoubleType()),
        T.StructField("full_duration", T.LongType()),
        T.StructField("created_ts", T.TimestampType()),
        T.StructField("run_id", T.StringType()),
    ]
)


def _variant_frames(window: DataFrame):
    """(raw 'a' + scaled 's') struct-keyed series frame and the per-series
    range frame, shared by train and match. ``window`` needs columns
    (event_type, ts, value, event_id); NULL-ts rows are excluded — they
    cannot be ranked deterministically (engine-divergent NULL order)."""
    ev = window.where(F.col("ts").isNotNull()).select(
        "event_type", "ts", "value", "event_id"
    )
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    raw = ev.select(
        F.struct(
            F.col("event_type").alias("et"), F.lit("a").alias("variant")
        ).alias("event_type"),
        "ts",
        "value",
        "event_id",
    )
    sv = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    )
    # null-safe key: the rest of this module (and the oracled twin) keeps
    # NULL-keyed series alive via eqNullSafe / IS NOT DISTINCT FROM; a plain
    # equi-join here would drop a NULL event_type's scaled variant and with
    # it the whole series from train/match
    scaled = ev.join(
        F.broadcast(rng.withColumnRenamed("event_type", "_rng_et")),
        F.col("event_type").eqNullSafe(F.col("_rng_et")),
    ).select(
        F.struct(
            F.col("event_type").alias("et"), F.lit("s").alias("variant")
        ).alias("event_type"),
        "ts",
        sv.alias("value"),
        "event_id",
    )
    return raw.unionByName(scaled), rng


def _feature_sums(window: DataFrame) -> DataFrame:
    """One row per event_type with the raw/scaled feature sums and window
    metadata — the shared train/match computation."""
    from pyspark.sql import Window

    # the production feature pipeline (function-local import: plans stays
    # import-light; the calculators module carries no registry state)
    from ..catalog.tsfresh_calculators import tsfresh_feature_frame

    half, rng = _variant_frames(window)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type")
    e = half.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
        "value",
    )
    feats = tsfresh_feature_frame(e).select(
        "event_type", "features_sum", "features_count", "series_length"
    )
    a = feats.where(F.col("event_type.variant") == "a").select(
        F.col("event_type.et").alias("event_type"),
        F.col("features_sum"),
        F.col("features_count"),
        F.col("series_length").alias("n_points"),
    )
    s = feats.where(F.col("event_type.variant") == "s").select(
        F.col("event_type.et").alias("event_type"),
        F.col("features_sum").alias("features_sum_scaled"),
    )
    return (
        a.join(s, a["event_type"].eqNullSafe(s["event_type"]))
        .drop(s["event_type"])
        .join(
            F.broadcast(rng.withColumnRenamed("event_type", "_rng_et")),
            F.col("event_type").eqNullSafe(F.col("_rng_et")),
        )
        .select(
            "event_type",
            "n_points",
            "features_count",
            "features_sum",
            F.col("mn").alias("value_min"),
            F.col("mx").alias("value_max"),
            "features_sum_scaled",
        )
    )


def train_profiles(
    window: DataFrame, run_ts: float, run_id: str = "run-0"
) -> DataFrame:
    """Train one features profile per event_type present in ``window`` —
    the rows of the flagged anomalous windows an operator approved as
    normal. Returns PROFILE_SCHEMA rows ready for ``append_profiles``.

    profile_id is deterministic (md5 of the series key + window content
    stats), so re-training the identical window is idempotent under a
    downstream dropDuplicates — the reference's auto-increment fp_id has no
    content identity and duplicates silently (`ionosphere_functions.py`)."""
    sums = _feature_sums(window)
    span = (
        window.where(F.col("ts").isNotNull())
        .groupBy("event_type")
        .agg(
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).cast("long").alias("full_duration")
        )
    )
    # session-TZ-independent instant (see plans/validate.py stage 7 note)
    created = F.timestamp_seconds(F.lit(float(run_ts)))
    pid = F.md5(
        F.concat_ws(
            "|",
            F.coalesce(F.col("event_type"), F.lit("<null>")),
            F.col("n_points").cast("string"),
            F.round(F.col("features_sum"), 6).cast("string"),
        )
    )
    return (
        sums.join(
            span.withColumnRenamed("event_type", "_span_et"),
            F.col("event_type").eqNullSafe(F.col("_span_et")),
            "left",
        )
        .select(
            pid.alias("profile_id"),
            "event_type",
            "n_points",
            "features_count",
            "features_sum",
            "value_min",
            "value_max",
            "features_sum_scaled",
            F.coalesce("full_duration", F.lit(0)).cast("long").alias("full_duration"),
            created.alias("created_ts"),
            F.lit(run_id).alias("run_id"),
        )
    )


def append_profiles(df: DataFrame, path: str) -> None:
    from ..sources.table_format import DEFAULT_FORMAT

    DEFAULT_FORMAT.append(df, path)


def load_profiles(spark: SparkSession, path: str) -> DataFrame:
    """Empty frame iff the profile table does not exist yet; any other read
    failure raises (same loud-failure contract as load_checkpoint)."""
    from ..sources.table_format import DEFAULT_FORMAT

    return DEFAULT_FORMAT.read_or_empty(spark, path, PROFILE_SCHEMA)


def match_profiles(window: DataFrame, profiles: DataFrame) -> DataFrame:
    """Per event_type in ``window``: does ANY approved profile match?

    Reference rules (`ionosphere/ionosphere.py:1864-1998, 2269-2455`):
    raw match iff |calc − fp| / fp ≤ PROFILE_PERCENT_SIMILAR percent (with
    the exact 0-vs-0 fallback); else, when both series ranges agree within
    MINMAX_RANGE_TOLERANCE, compare the min-max-scaled sums the same way.
    Output: (event_type, matched, matched_minmax, best_profile_id,
    percent_different) — best = smallest raw percent difference, tie on
    profile_id; unmatched series keep their best candidate for forensics,
    NULL when no profile exists for the key. ``matched`` True ⇒ the alert
    is SUPPRESSED."""
    cur = _feature_sums(window)
    p = profiles.select(
        "profile_id",
        F.col("event_type").alias("p_event_type"),
        F.col("features_sum").alias("fp_sum"),
        F.col("value_min").alias("p_mn"),
        F.col("value_max").alias("p_mx"),
        F.col("features_sum_scaled").alias("fp_sum_scaled"),
    )
    j = cur.join(
        F.broadcast(p),
        cur["event_type"].eqNullSafe(p["p_event_type"]),
        "left",
    )
    pct = F.abs(
        (F.col("features_sum") - F.col("fp_sum"))
        / F.nullif(F.col("fp_sum"), F.lit(0.0))
        * 100
    )
    m_raw = F.coalesce(
        pct <= PROFILE_PERCENT_SIMILAR,
        (F.col("fp_sum") == 0) & (F.col("features_sum") == 0),
        F.lit(False),
    )
    tol = MINMAX_RANGE_TOLERANCE
    eligible = F.coalesce(
        (
            (F.col("p_mn") == F.col("value_min"))
            | (F.abs(F.col("value_min") - F.col("p_mn")) <= tol * F.abs(F.col("p_mn")))
        )
        & (
            (F.col("p_mx") == F.col("value_max"))
            | (F.abs(F.col("value_max") - F.col("p_mx")) <= tol * F.abs(F.col("p_mx")))
        ),
        F.lit(False),
    )
    pct_s = F.abs(
        (F.col("features_sum_scaled") - F.col("fp_sum_scaled"))
        / F.nullif(F.col("fp_sum_scaled"), F.lit(0.0))
        * 100
    )
    m_minmax = (
        ~m_raw & eligible & F.coalesce(pct_s <= PROFILE_PERCENT_SIMILAR, F.lit(False))
    )
    per_profile = j.select(
        "event_type",
        "profile_id",
        m_raw.alias("m_raw"),
        m_minmax.alias("m_minmax"),
        pct.alias("pct"),
    )
    best = F.min_by(
        F.struct("profile_id", "m_raw", "m_minmax", "pct"),
        # matches first (raw before minmax), then smallest divergence
        F.struct(
            F.when(F.col("m_raw"), 0).when(F.col("m_minmax"), 1).otherwise(2),
            F.coalesce(F.col("pct"), F.lit(float("inf"))),
            F.coalesce(F.col("profile_id"), F.lit("~")),
        ),
    )
    return (
        per_profile.groupBy("event_type")
        .agg(
            F.max("m_raw").alias("matched"),
            F.max("m_minmax").alias("matched_minmax"),
            best.alias("_b"),
        )
        .select(
            "event_type",
            F.coalesce("matched", F.lit(False)).alias("matched"),
            F.coalesce("matched_minmax", F.lit(False)).alias("matched_minmax"),
            F.col("_b.profile_id").alias("best_profile_id"),
            F.round("_b.pct", 6).alias("percent_different"),
        )
    )

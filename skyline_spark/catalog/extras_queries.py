"""Additional coverage: second-order anomaly detection + semi-structured.

- ``second_order_anomalies`` restates the reference's (shipped-but-disabled)
  ``is_anomalously_anomalous`` — a 3-sigma test on the *intervals between
  anomaly trigger times* (`analyzer/algorithms.py:497-534`,
  `ENABLE_SECOND_ORDER=False` at settings.py:518) — over the replay anomaly
  stream, fully relationally.
- ``events_props_extract`` covers the JSON/semi-structured surface
  (get_json_object ↔ json_extract_string) that a crawler metadata column
  needs; stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .registry import load, query
from .series_queries import _E_CTE, _ms, _series


@query(
    "second_order_anomalies",
    _E_CTE
    + """
, p AS (
  SELECT event_type, rn, ts, value,
         avg(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pmean,
         stddev_samp(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pstd,
         avg(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ptail
  FROM e
), anom AS (
  SELECT event_type, ts,
         (epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY event_type ORDER BY rn))) / 1000.0 AS gap_s
  FROM p WHERE rn > 10 AND abs(ptail - pmean) > 3 * pstd
)
SELECT event_type,
       count(gap_s)::BIGINT AS n_intervals,
       round(avg(gap_s), 6) AS mean_gap_s,
       round(stddev_samp(gap_s), 6) AS std_gap_s,
       CASE WHEN count(gap_s) < 2 THEN false
            ELSE abs(max_by(gap_s, ts) - avg(gap_s)) > 3 * stddev_samp(gap_s) END AS anomalously_anomalous
FROM anom WHERE gap_s IS NOT NULL GROUP BY event_type ORDER BY event_type
""",
    doc="is_anomalously_anomalous: 3-sigma test of the NEWEST inter-anomaly "
        "interval against the interval history "
        "(analyzer/algorithms.py:497-534; shipped disabled, "
        "ENABLE_SECOND_ORDER settings.py:518)",
)
def second_order_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    wexp = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtail = Window.partitionBy("event_type").orderBy("rn").rowsBetween(-2, 0)
    p = e.select(
        "event_type",
        "rn",
        "ts",
        F.avg("value").over(wexp).alias("pmean"),
        F.stddev_samp("value").over(wexp).alias("pstd"),
        F.avg("value").over(wtail).alias("ptail"),
    )
    worder = Window.partitionBy("event_type").orderBy("rn")
    anom = p.where(
        (F.col("rn") > 10) & (F.abs(F.col("ptail") - F.col("pmean")) > 3 * F.col("pstd"))
    ).select(
        "event_type",
        "ts",
        ((_ms("ts") - F.lag(_ms("ts")).over(worder)) / 1000.0).alias("gap_s"),
    )
    # NULL first-gap rows are excluded in BOTH engines: max_by/arg_max
    # null-skipping semantics differ, so never let it see a NULL
    anom = anom.where(F.col("gap_s").isNotNull())
    return anom.groupBy("event_type").agg(
        F.count("gap_s").cast("long").alias("n_intervals"),
        F.round(F.avg("gap_s"), 6).alias("mean_gap_s"),
        F.round(F.stddev_samp("gap_s"), 6).alias("std_gap_s"),
        F.when(F.count("gap_s") < 2, F.lit(False))
        .otherwise(
            F.abs(F.max_by("gap_s", "ts") - F.avg("gap_s"))
            > 3 * F.stddev_samp("gap_s")
        )
        .alias("anomalously_anomalous"),
    )


@query(
    "events_props_extract",
    """
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_sum,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_max
FROM events GROUP BY event_type ORDER BY event_type
""",
    doc="semi-structured metadata extraction (get_json_object) aggregated "
        "per series — stays inside whole-stage codegen, no UDF",
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(k).cast("long").alias("k_sum"),
        F.max(k).cast("long").alias("k_max"),
    )


# ---------------------------------------------------------------------------
# roomba table maintenance  (horizon/roomba.py:86-181)
# ---------------------------------------------------------------------------

ROOMBA_RETENTION_SECONDS = 7 * 86400  # FULL_DURATION + grace, rescaled


@query(
    "roomba_vacuum",
    f"""
WITH c AS (SELECT max(epoch_ms(ts)) AS mx FROM events),
raw AS (SELECT event_type, count(*)::BIGINT AS n_raw FROM events GROUP BY 1),
r AS (
  SELECT event_type, ts FROM events, c
  WHERE epoch_ms(ts) >= c.mx - {ROOMBA_RETENTION_SECONDS} * 1000
),
ret AS (
  SELECT event_type,
         count(*)::BIGINT AS n_retained,
         count(DISTINCT ts)::BIGINT AS n_clean
  FROM r GROUP BY 1
)
SELECT raw.event_type, n_raw,
       coalesce(n_retained, 0)::BIGINT AS n_retained,
       coalesce(n_clean, 0)::BIGINT AS n_clean,
       (n_raw - coalesce(n_retained, 0))::BIGINT AS dropped_old,
       (coalesce(n_retained, 0) - coalesce(n_clean, 0))::BIGINT AS dropped_dup
FROM raw LEFT JOIN ret USING (event_type) ORDER BY event_type
""",
    doc="Roomba vacuum accounting (horizon/roomba.py:86-181): per series, "
        "rows dropped by the retention trim (older than FULL_DURATION+grace "
        "behind the newest point) and rows collapsed by duplicate-timestamp "
        "first-wins dedup. The reusable operator is plans/maintenance.vacuum; "
        "this query restates its two rules relationally so the result is "
        "DuckDB-checkable (n_clean = rows surviving vacuum)",
)
def roomba_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max(_ms("ts")).alias("mx"))
    r = ev.crossJoin(F.broadcast(mx)).where(
        _ms("ts") >= F.col("mx") - ROOMBA_RETENTION_SECONDS * 1000
    )
    raw = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n_raw"))
    ret = r.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_retained"),
        F.count_distinct("ts").cast("long").alias("n_clean"),
    )
    return raw.join(ret, "event_type", "left").select(
        "event_type",
        "n_raw",
        F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
        F.coalesce("n_clean", F.lit(0)).cast("long").alias("n_clean"),
        (F.col("n_raw") - F.coalesce("n_retained", F.lit(0))).cast("long").alias("dropped_old"),
        (F.coalesce("n_retained", F.lit(0)) - F.coalesce("n_clean", F.lit(0)))
        .cast("long")
        .alias("dropped_dup"),
    )


# ---------------------------------------------------------------------------
# namespace utilities: in_list dotted-element match + filesafe_metricname
# (skyline_functions.py:1103-1129, 716-726)
# ---------------------------------------------------------------------------

IN_LIST_PATTERNS = ["src1.", "eng.src3", "count.src5"]


def _in_list_sql(name: str) -> str:
    terms = []
    for p in IN_LIST_PATTERNS:
        elems = p.split(".")
        elems_sql = ", ".join(f"'{e}'" for e in elems if e)
        n = len([e for e in elems if e])
        terms.append(
            f"(contains({name}, '{p}') OR "
            f"len(list_distinct(list_intersect(str_split({name}, '.'), [{elems_sql}]))) = {n})"
        )
    return "(" + " OR ".join(terms) + ")"


@query(
    "util_namespace_functions",
    f"""
WITH m AS (
  SELECT DISTINCT source, lang,
         source || '.' || lang || '.count' AS metric_name,
         source || '/' || lang || ' #x' AS raw_name
  FROM documents
)
SELECT source, lang, metric_name,
       {_in_list_sql('metric_name')} AS in_check_list,
       regexp_replace(raw_name, '[^A-Za-z0-9._-]', '', 'g') AS filesafe
FROM m ORDER BY source, lang
""",
    doc="namespace utilities over dotted metric names: in_list matches a "
        "pattern by substring OR by its dotted elements all appearing in "
        "the name's element SET (order-insensitive — the reference's "
        "set-intersection semantics, skyline_functions.py:1114-1124); "
        "filesafe_metricname keeps only [alnum . _ -] (:716-726)",
)
def util_namespace_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    m = d.select(
        "source",
        "lang",
        F.concat_ws(".", "source", "lang", F.lit("count")).alias("metric_name"),
        F.concat(F.col("source"), F.lit("/"), F.col("lang"), F.lit(" #x")).alias(
            "raw_name"
        ),
    ).distinct()
    elems = F.split("metric_name", r"\.")
    matched = F.lit(False)
    for p in IN_LIST_PATTERNS:
        p_elems = [e for e in p.split(".") if e]
        matched = matched | (
            F.col("metric_name").contains(p)
            | (
                F.size(
                    F.array_intersect(elems, F.array(*[F.lit(e) for e in p_elems]))
                )
                == len(p_elems)
            )
        )
    return m.select(
        "source",
        "lang",
        "metric_name",
        matched.alias("in_check_list"),
        F.regexp_replace("raw_name", "[^A-Za-z0-9._-]", "").alias("filesafe"),
    )


# ---------------------------------------------------------------------------
# tsfresh-style feature extraction (SURVEY §2.9 row 1)
# ---------------------------------------------------------------------------

from .tsfresh_calculators import (  # noqa: E402
    TSF_FEATURE_NAMES,
    tsfresh_feature_frame,
    tsfresh_oracle_body,
)


@query(
    "tsfresh_features",
    _E_CTE + tsfresh_oracle_body(),
    doc="tsfresh-parity feature matrix per series (features_profile.py:"
        "54-503): 101 calculators — the full tsfresh-0.4.0 default grids of "
        "every SQL-expressible family — restated as exact relational "
        "algebra, each a SINGLE shared ANSI aggregate string run by both engines "
        "(catalog/tsfresh_calculators.py); definitions pinned empirically "
        "against the reference golden CSV tests/baseline/tsfresh-0.4.0."
        "py3.data.json.features.transposed.csv on its own 60-point fixture "
        "(tests/test_tsfresh_golden.py), plus the features_count/"
        "features_sum pair the reference persists for profile matching "
        "(features_profile.py:466-482)",
)
def tsfresh_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tsfresh_feature_frame(_series(spark, sf_dir))


#: per-series point cap for the O(n²) entropy calculators (reference
#: fixture scale: FULL_DURATION series are ~1,440 points)
TSFRESH_KERNEL_MAX_POINTS = 1440


@query(
    "tsfresh_features_kernel",
    None,
    doc="the NON-relational tsfresh calculators (approximate/sample entropy, "
        "mean_autocorrelation with its historical lag-k divisor quirk, "
        "AR(10) coefficients, ADF tau, truncated-rfft fft_coefficient, "
        "single-segment Welch density, Ricker-CWT coefficients and peak "
        "counts, corridor change-quantiles, large_number_of_peaks) as "
        "vectorized numpy kernels in one Arrow-batched grouped map per "
        "series — every formula pinned to the reference's tsfresh-0.4.0 "
        "golden CSV values on its own fixture (operators/tsfresh_kernels.py, "
        "tests/test_tsfresh_golden.py); rows-only (FFT/OLS/wavelets are not "
        "SQL-expressible), complements the 101 oracled calculators in "
        "tsfresh_features. The entropy calculators are O(n²) per series by "
        "definition, so each series is capped at its last "
        "TSFRESH_KERNEL_MAX_POINTS points — self-described by the "
        "truncated/window_start columns (same contract as "
        "replay_full_ensemble); the reference itself extracts features on "
        "bounded windows (FULL_DURATION series, ~1,440 points)",
)
def tsfresh_features_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.tsfresh_kernels import KERNEL_FEATURES, kernel_feature_row

    schema = (
        "event_type string, truncated boolean, window_start long, "
        + ", ".join(f"{name} double" for name in KERNEL_FEATURES)
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        n_full = len(pdf)
        pdf = pdf.sort_values(["ts", "event_id"]).tail(TSFRESH_KERNEL_MAX_POINTS)
        vals = kernel_feature_row(pdf["value"].to_numpy())
        return pd.DataFrame(
            [
                [pdf["event_type"].iat[0], n_full > len(pdf), n_full - len(pdf)]
                + [round(float(v), 6) for v in vals]
            ],
            columns=["event_type", "truncated", "window_start"]
            + list(KERNEL_FEATURES),
        )

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    return ev.groupBy("event_type").applyInPandas(_one, schema)


# ---------------------------------------------------------------------------
# ionosphere profile match over the REAL full tsfresh matrix (SURVEY §2.9)
# ---------------------------------------------------------------------------

from .series_queries import (  # noqa: E402
    PROFILE_CUT_EXPR_SQL,
    PROFILE_PERCENT_SIMILAR,
    profile_cut,
)

# the profile/calc halves ride tsfresh_feature_frame unchanged by keying the
# series frame on a STRUCT(et, is_profile) — both engines group/partition by
# struct keys natively (still HashAggregate, pinned by test_plan_shapes), so
# both halves compute the SAME 101-column matrix tsfresh_features computes,
# then the halves are joined back and compared with the reference's ±1% rule.
# A struct key has no encode/decode grammar: a NULL or '|'-bearing raw
# event_type survives as-is inside the struct (the old string-concat key went
# NULL for a NULL event_type and the series vanished from the report). The
# halves FULL-join NULL-SAFELY so a series living entirely on one side of the
# cut — or one with a NULL event_type — still surfaces a row (matched=false,
# NULL sums) instead of vanishing; pct divides by nullif(fp_sum, 0) so a zero
# profile sum yields NULL percent + an exact 0-vs-0 equality fallback rather
# than an ANSI DIVIDE_BY_ZERO crash. Rows with NULL ts are EXPLICITLY
# excluded: a point with no timestamp cannot be placed on either side of the
# cut, and its rank in the rn ordering would differ between engines
# (NULLS FIRST vs LAST).
_TSF_MATCH_SQL = f"""
WITH matrix AS (
  WITH span AS (
    SELECT {PROFILE_CUT_EXPR_SQL} AS cut
    FROM events
  ), h AS (
    SELECT {{{{'et': event_type,
             'is_profile': epoch_ms(ts) < (SELECT cut FROM span)}}}} AS event_type,
           ts, value, event_id
    FROM events
    WHERE ts IS NOT NULL
  ), e AS (
    SELECT event_type, ts, value, event_id,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
           count(*)    OVER (PARTITION BY event_type) AS n
    FROM h
  )
  {{body}}
), p AS (
  SELECT event_type.et AS event_type, features_sum AS p_sum
  FROM matrix WHERE event_type.is_profile
), c AS (
  SELECT event_type.et AS event_type, features_sum AS c_sum
  FROM matrix WHERE NOT event_type.is_profile
), k AS (
  -- pct computed ONCE (the Spark builder mirrors this shape)
  SELECT coalesce(p.event_type, c.event_type) AS event_type, p_sum, c_sum,
         abs((c_sum - p_sum) / nullif(p_sum, 0) * 100) AS pct
  FROM p FULL JOIN c ON p.event_type IS NOT DISTINCT FROM c.event_type
)
SELECT event_type,
       round(p_sum, 6) AS fp_sum,
       round(c_sum, 6) AS calc_sum,
       round(pct, 6) AS percent_different,
       coalesce(pct <= {PROFILE_PERCENT_SIMILAR},
                p_sum = 0 AND c_sum = 0, FALSE) AS matched
FROM k
ORDER BY 1
"""


@query(
    "ionosphere_tsfresh_match",
    _TSF_MATCH_SQL.format(body=tsfresh_oracle_body()),
    doc="Ionosphere features-profile match over the REAL full tsfresh "
        "matrix — the reference computes features_profile.py's full tsfresh "
        "feature set for both the approved profile and the anomalous window "
        "and compares features_sum within IONOSPHERE_FEATURES_PERCENT_"
        "SIMILAR (ionosphere.py:1864-1998, settings.py:1750). Here both "
        "halves (profile = first 70% of the span) run through the SAME "
        "101-calculator relational matrix as tsfresh_features by keying the "
        "series frame on STRUCT(event_type, is_profile) — both engines "
        "group/partition by struct keys natively, and NULL or '|'-bearing "
        "event_types survive with no encode/decode — so the match arithmetic "
        "is the production feature pipeline, not a stand-in (the 7-term "
        "stand-in variant with the min-max second chance remains "
        "ionosphere_profile_match); NULL-ts rows are explicitly excluded "
        "(unplaceable on the cut, engine-divergent rank order)",
)
def ionosphere_tsfresh_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    span = profile_cut(ev)
    # struct key: no encode/decode, NULL/'|' event_types survive verbatim
    half = ev.crossJoin(F.broadcast(span)).select(
        F.struct(
            F.col("event_type").alias("et"),
            (_ms("ts") < F.col("cut")).alias("is_profile"),
        ).alias("event_type"),
        "ts",
        "value",
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type")
    e = half.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
        "value",
    )
    feats = tsfresh_feature_frame(e).select("event_type", "features_sum")
    p = feats.where(F.col("event_type.is_profile")).select(
        F.col("event_type.et").alias("p_et"),
        F.col("features_sum").alias("p_sum"),
    )
    c = feats.where(~F.col("event_type.is_profile")).select(
        F.col("event_type.et").alias("c_et"),
        F.col("features_sum").alias("c_sum"),
    )
    pct = F.abs(
        (F.col("c_sum") - F.col("p_sum"))
        / F.nullif(F.col("p_sum"), F.lit(0.0))
        * 100
    )
    # null-safe FULL join: a NULL-event_type series still pairs its halves
    return p.join(c, F.col("p_et").eqNullSafe(F.col("c_et")), "full").select(
        F.coalesce("p_et", "c_et").alias("event_type"),
        F.round("p_sum", 6).alias("fp_sum"),
        F.round("c_sum", 6).alias("calc_sum"),
        F.round(pct, 6).alias("percent_different"),
        F.coalesce(
            pct <= PROFILE_PERCENT_SIMILAR,
            (F.col("p_sum") == 0) & (F.col("c_sum") == 0),
            F.lit(False),
        ).alias("matched"),
    )


# ---------------------------------------------------------------------------
# ionosphere profile TRAINING (the operator-feedback write path, SURVEY §2.9;
# VERDICT r4 item 2) — the oracled twin of plans/ionosphere.train_profiles
# ---------------------------------------------------------------------------

# Three matrix variants ride ONE instantiation of the 101-calculator body by
# keying the series frame on STRUCT(et, variant): 'p' = approved-history
# half (first 70% of the span), 'a' = anomalous half raw, 's' = anomalous
# half min-max-scaled by its own range (the second-chance sums the
# reference recomputes from the stored fp timeseries at match time,
# ionosphere.py:2269-2455, precomputed here at train time). A series is
# FLAGGED — and therefore trained — when its raw anomalous-half sum misses
# the history sum by more than IONOSPHERE_FEATURES_PERCENT_SIMILAR
# (settings.py:1750), the same rule ionosphere_tsfresh_match reports; the
# output rows are exactly what train_profiles persists (features_profile.py
# :466-503: features_count, features_sum, window metadata).
_TSF_TRAIN_SQL = f"""
WITH matrix AS (
  WITH span AS (
    SELECT {PROFILE_CUT_EXPR_SQL} AS cut
    FROM events
  ), b AS (
    SELECT event_type AS et, ts, value, event_id,
           epoch_ms(ts) < (SELECT cut FROM span) AS is_profile
    FROM events
    WHERE ts IS NOT NULL
  ), rng AS (
    SELECT et, min(value) AS mn, max(value) AS mx
    FROM b WHERE NOT is_profile GROUP BY et
  ), h AS (
    SELECT {{{{'et': et,
             'variant': CASE WHEN is_profile THEN 'p' ELSE 'a' END}}}} AS event_type,
           ts, value, event_id
    FROM b
    UNION ALL
    SELECT {{{{'et': b.et, 'variant': 's'}}}} AS event_type, b.ts,
           CASE WHEN r.mx = r.mn THEN 0e0
                ELSE (b.value - r.mn) / (r.mx - r.mn) END AS value,
           b.event_id
    FROM b JOIN rng r ON r.et IS NOT DISTINCT FROM b.et
    WHERE NOT b.is_profile
  ), e AS (
    SELECT event_type, ts, value, event_id,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
           count(*)    OVER (PARTITION BY event_type) AS n
    FROM h
  )
  {{body}}
), p AS (
  SELECT event_type.et AS event_type, features_sum AS p_sum
  FROM matrix WHERE event_type.variant = 'p'
), a AS (
  SELECT event_type.et AS event_type, features_sum AS c_sum,
         series_length AS n_points, features_count,
         minimum AS mn, maximum AS mx
  FROM matrix WHERE event_type.variant = 'a'
), sc AS (
  SELECT event_type.et AS event_type, features_sum AS s_sum
  FROM matrix WHERE event_type.variant = 's'
), k AS (
  SELECT a.event_type, a.c_sum, a.n_points, a.features_count, a.mn, a.mx,
         p.p_sum, sc.s_sum,
         abs((a.c_sum - p.p_sum) / nullif(p.p_sum, 0) * 100) AS pct
  FROM a
  LEFT JOIN p ON p.event_type IS NOT DISTINCT FROM a.event_type
  LEFT JOIN sc ON sc.event_type IS NOT DISTINCT FROM a.event_type
)
SELECT event_type,
       n_points, features_count,
       round(c_sum, 6) AS features_sum,
       round(mn, 6) AS value_min,
       round(mx, 6) AS value_max,
       round(s_sum, 6) AS features_sum_scaled,
       round(p_sum, 6) AS baseline_sum,
       round(pct, 6) AS percent_different
FROM k
WHERE NOT coalesce(pct <= {PROFILE_PERCENT_SIMILAR},
                   p_sum = 0 AND c_sum = 0, FALSE)
ORDER BY event_type
"""


@query(
    "ionosphere_train_profile",
    lambda: _TSF_TRAIN_SQL.format(body=tsfresh_oracle_body()),
    doc="Ionosphere profile TRAINING over the full tsfresh matrix — for "
        "every series whose anomalous window (last 30% of the span) misses "
        "the approved history's features_sum by more than IONOSPHERE_"
        "FEATURES_PERCENT_SIMILAR, emit the profile row that "
        "plans/ionosphere.train_profiles persists (features_profile.py:"
        "466-503): n_points, features_count, raw features_sum, the window "
        "range, and the min-max-scaled features_sum that powers the "
        "second-chance match (ionosphere.py:2269-2455). Three matrix "
        "variants (history / anomalous-raw / anomalous-scaled) ride one "
        "pass of the production 101-calculator pipeline via a "
        "STRUCT(et, variant) series key",
)
def ionosphere_train_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    span = profile_cut(ev)
    b = ev.crossJoin(F.broadcast(span)).select(
        F.col("event_type").alias("et"),
        "ts",
        "value",
        "event_id",
        (_ms("ts") < F.col("cut")).alias("is_profile"),
    )
    rng = (
        b.where(~F.col("is_profile"))
        .groupBy("et")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    )
    raw = b.select(
        F.struct(
            F.col("et"),
            F.when(F.col("is_profile"), F.lit("p"))
            .otherwise(F.lit("a"))
            .alias("variant"),
        ).alias("event_type"),
        "ts",
        "value",
        "event_id",
    )
    sv = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    )
    scaled = (
        b.where(~F.col("is_profile"))
        .join(rng, b["et"].eqNullSafe(rng["et"]))
        .drop(rng["et"])
        .select(
            F.struct(F.col("et"), F.lit("s").alias("variant")).alias("event_type"),
            "ts",
            sv.alias("value"),
            "event_id",
        )
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type")
    e = raw.unionByName(scaled).select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
        "value",
    )
    feats = tsfresh_feature_frame(e).select(
        "event_type", "features_sum", "features_count", "series_length",
        "minimum", "maximum",
    )
    p = feats.where(F.col("event_type.variant") == "p").select(
        F.col("event_type.et").alias("p_et"), F.col("features_sum").alias("p_sum")
    )
    a = feats.where(F.col("event_type.variant") == "a").select(
        F.col("event_type.et").alias("event_type"),
        F.col("features_sum").alias("c_sum"),
        F.col("series_length").alias("n_points"),
        "features_count",
        F.col("minimum").alias("mn"),
        F.col("maximum").alias("mx"),
    )
    sc = feats.where(F.col("event_type.variant") == "s").select(
        F.col("event_type.et").alias("s_et"),
        F.col("features_sum").alias("s_sum"),
    )
    k = (
        a.join(p, a["event_type"].eqNullSafe(p["p_et"]), "left")
        .join(sc, a["event_type"].eqNullSafe(sc["s_et"]), "left")
    )
    pct = F.abs(
        (F.col("c_sum") - F.col("p_sum"))
        / F.nullif(F.col("p_sum"), F.lit(0.0))
        * 100
    )
    flagged = ~F.coalesce(
        pct <= PROFILE_PERCENT_SIMILAR,
        (F.col("p_sum") == 0) & (F.col("c_sum") == 0),
        F.lit(False),
    )
    return k.where(flagged).select(
        "event_type",
        "n_points",
        "features_count",
        F.round("c_sum", 6).alias("features_sum"),
        F.round("mn", 6).alias("value_min"),
        F.round("mx", 6).alias("value_max"),
        F.round("s_sum", 6).alias("features_sum_scaled"),
        F.round("p_sum", 6).alias("baseline_sum"),
        F.round(pct, 6).alias("percent_different"),
    )


# ---------------------------------------------------------------------------
# sessionize_events — gaps-and-islands user sessions (30-min inactivity)
# ---------------------------------------------------------------------------

#: inactivity gap that closes a session (exact integer microseconds)
SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSION_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE user_id IS NOT NULL
), flagged AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER w > {SESSION_GAP_US}
                OR lag(t) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), numbered AS (
  SELECT user_id, t,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       session_seq::BIGINT AS session_seq,
       min(t)::BIGINT AS session_start_us,
       max(t)::BIGINT AS session_end_us,
       count(*)::BIGINT AS n_events,
       (max(t) - min(t))::BIGINT AS duration_us
FROM numbered
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


@query(
    "sessionize_events",
    _SESSION_ORACLE,
    doc="sessionization (gaps-and-islands): per-user sessions split at a "
        "30-minute inactivity gap — lag() flags session starts, a running "
        "sum numbers them, a group-by rolls each island up to (start, end, "
        "n_events, duration). The web-analytics primitive every event "
        "pipeline needs, and the batch twin of Structured Streaming's "
        "session_window. Scale shape: lag, the running sum, and the final "
        "group all share ONE partitioning (user_id), so the whole plan "
        "costs a single hash exchange; a hot user is one large sorted "
        "group, never a join blow-up. All outputs are exact integer "
        "microseconds — no float discipline needed. NULL users excluded "
        "(no meaningful session identity)",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "event_id", "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    flagged = e.select(
        "user_id", "t",
        F.when(
            ((F.col("t") - F.lag("t").over(w)) > SESSION_GAP_US)
            | F.lag("t").over(w).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("new_sess"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.select(
        "user_id", "t", F.sum("new_sess").over(w_run).alias("session_seq")
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.min("t").alias("session_start_us"),
            F.max("t").alias("session_end_us"),
            F.count("*").cast("long").alias("n_events"),
            (F.max("t") - F.min("t")).alias("duration_us"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "session_start_us", "session_end_us", "n_events", "duration_us",
        )
    )

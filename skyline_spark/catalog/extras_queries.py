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

_TSF_FEATURES = [
    "series_length", "sum_values", "mean_value", "median_value",
    "standard_deviation", "variance", "maximum", "minimum", "abs_energy",
    "absolute_sum_of_changes", "mean_abs_change", "mean_change",
    "count_above_mean", "count_below_mean", "longest_strike_above_mean",
    "longest_strike_below_mean", "first_location_of_maximum",
    "last_location_of_minimum",
]


@query(
    "tsfresh_features",
    _E_CTE
    + """
, s AS (
  SELECT event_type, rn, n, value,
         avg(value) OVER (PARTITION BY event_type) AS mean_v,
         max(value) OVER (PARTITION BY event_type) AS max_v,
         min(value) OVER (PARTITION BY event_type) AS min_v,
         value - lag(value) OVER (PARTITION BY event_type ORDER BY rn) AS diff
  FROM e
), flagged AS (
  SELECT event_type, rn, value > mean_v AS above, value < mean_v AS below
  FROM s
), runs AS (
  SELECT event_type, above, below,
         rn - row_number() OVER (PARTITION BY event_type, above ORDER BY rn) AS ga,
         rn - row_number() OVER (PARTITION BY event_type, below ORDER BY rn) AS gb
  FROM flagged
), strike_above AS (
  SELECT event_type, max(c) AS longest FROM (
    SELECT event_type, count(*) AS c FROM runs WHERE above GROUP BY event_type, ga
  ) GROUP BY event_type
), strike_below AS (
  SELECT event_type, max(c) AS longest FROM (
    SELECT event_type, count(*) AS c FROM runs WHERE below GROUP BY event_type, gb
  ) GROUP BY event_type
), feat AS (
  SELECT event_type,
         count(*)::BIGINT AS series_length,
         round(sum(value), 4) AS sum_values,
         round(avg(value), 6) AS mean_value,
         round(median(value), 6) AS median_value,
         round(stddev_pop(value), 6) AS standard_deviation,
         round(var_pop(value), 6) AS variance,
         round(max(value), 6) AS maximum,
         round(min(value), 6) AS minimum,
         round(sum(value * value), 2) AS abs_energy,
         round(sum(abs(diff)), 4) AS absolute_sum_of_changes,
         round(avg(abs(diff)), 6) AS mean_abs_change,
         round(avg(diff), 6) AS mean_change,
         sum(CASE WHEN value > mean_v THEN 1 ELSE 0 END)::BIGINT AS count_above_mean,
         sum(CASE WHEN value < mean_v THEN 1 ELSE 0 END)::BIGINT AS count_below_mean,
         round((min(CASE WHEN value = max_v THEN rn END) - 1.0) / count(*), 6)
           AS first_location_of_maximum,
         round(max(CASE WHEN value = min_v THEN rn END) * 1.0 / count(*), 6)
           AS last_location_of_minimum
  FROM s GROUP BY event_type
)
SELECT f.*,
       coalesce(sa.longest, 0)::BIGINT AS longest_strike_above_mean,
       coalesce(sb.longest, 0)::BIGINT AS longest_strike_below_mean,
       18::BIGINT AS features_count,
       round(f.series_length + f.sum_values + f.mean_value + f.median_value
             + f.standard_deviation + f.variance + f.maximum + f.minimum
             + f.abs_energy + f.absolute_sum_of_changes + f.mean_abs_change
             + f.mean_change + f.count_above_mean + f.count_below_mean
             + coalesce(sa.longest, 0) + coalesce(sb.longest, 0)
             + f.first_location_of_maximum + f.last_location_of_minimum, 2)
         AS features_sum
FROM feat f
LEFT JOIN strike_above sa USING (event_type)
LEFT JOIN strike_below sb USING (event_type)
ORDER BY event_type
""",
    doc="tsfresh-style feature matrix per series (features_profile.py:54-503; "
        "names follow tsfresh_feature_names.py calculators — the 18 of the "
        "reference's feature set expressible as exact relational algebra: "
        "moments, energy, change stats, mean-relative counts/strikes, "
        "argmax/argmin locations), plus the features_count/features_sum "
        "pair the reference persists for profile matching "
        "(features_profile.py:466-482; consumed by ionosphere_profile_match)",
)
def tsfresh_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    wp = Window.partitionBy("event_type")
    worder = Window.partitionBy("event_type").orderBy("rn")
    s = e.select(
        "event_type",
        "rn",
        "value",
        F.avg("value").over(wp).alias("mean_v"),
        F.max("value").over(wp).alias("max_v"),
        F.min("value").over(wp).alias("min_v"),
        (F.col("value") - F.lag("value").over(worder)).alias("diff"),
    )

    # gaps-and-islands: a strike is a maximal run of consecutive rn with the
    # same above/below flag; rn - row_number-within-flag is constant per run
    flagged = s.select(
        "event_type",
        "rn",
        (F.col("value") > F.col("mean_v")).alias("above"),
        (F.col("value") < F.col("mean_v")).alias("below"),
    )
    wa = Window.partitionBy("event_type", "above").orderBy("rn")
    wb = Window.partitionBy("event_type", "below").orderBy("rn")
    runs = flagged.select(
        "event_type",
        "above",
        "below",
        (F.col("rn") - F.row_number().over(wa)).alias("ga"),
        (F.col("rn") - F.row_number().over(wb)).alias("gb"),
    )

    def _longest(df, flag, grp):
        return (
            df.where(F.col(flag))
            .groupBy("event_type", grp)
            .count()
            .groupBy("event_type")
            .agg(F.max("count").alias("longest"))
        )

    strike_above = _longest(runs, "above", "ga")
    strike_below = _longest(runs, "below", "gb")

    feat = s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("series_length"),
        F.round(F.sum("value"), 4).alias("sum_values"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.median("value"), 6).alias("median_value"),
        F.round(F.stddev_pop("value"), 6).alias("standard_deviation"),
        F.round(F.var_pop("value"), 6).alias("variance"),
        F.round(F.max("value"), 6).alias("maximum"),
        F.round(F.min("value"), 6).alias("minimum"),
        F.round(F.sum(F.col("value") * F.col("value")), 2).alias("abs_energy"),
        F.round(F.sum(F.abs("diff")), 4).alias("absolute_sum_of_changes"),
        F.round(F.avg(F.abs("diff")), 6).alias("mean_abs_change"),
        F.round(F.avg("diff"), 6).alias("mean_change"),
        F.sum(F.when(F.col("value") > F.col("mean_v"), 1).otherwise(0))
        .cast("long")
        .alias("count_above_mean"),
        F.sum(F.when(F.col("value") < F.col("mean_v"), 1).otherwise(0))
        .cast("long")
        .alias("count_below_mean"),
        F.round(
            (F.min(F.when(F.col("value") == F.col("max_v"), F.col("rn"))) - 1.0)
            / F.count("*"),
            6,
        ).alias("first_location_of_maximum"),
        F.round(
            F.max(F.when(F.col("value") == F.col("min_v"), F.col("rn")))
            * 1.0
            / F.count("*"),
            6,
        ).alias("last_location_of_minimum"),
    )

    out = (
        feat.join(strike_above, "event_type", "left")
        .withColumnRenamed("longest", "la")
        .join(strike_below, "event_type", "left")
        .withColumnRenamed("longest", "lb")
        .withColumn(
            "longest_strike_above_mean", F.coalesce("la", F.lit(0)).cast("long")
        )
        .withColumn(
            "longest_strike_below_mean", F.coalesce("lb", F.lit(0)).cast("long")
        )
        .drop("la", "lb")
        .withColumn("features_count", F.lit(18).cast("long"))
    )
    # features_sum over the ROUNDED feature columns so the value is
    # deterministic across engines given the columns already match
    return out.withColumn(
        "features_sum",
        F.round(
            sum((F.col(c) for c in _TSF_FEATURES[1:]), F.col("series_length") * 1.0),
            2,
        ),
    )

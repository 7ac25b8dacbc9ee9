"""Fully-oracled flagship twins of the kernel validation pipeline.

Round 2's verdict: the flagship consensus (`drift_ensemble_daily`,
`validate_pages_full`) carried only rows-only checks because the 9-kernel
ensemble isn't SQL-expressible end to end (Grubbs needs the Student-t
inverse survival function, ks_test needs its p-value + the ADF gate).

These twins close that gap the strongest way available: the Spark side runs
the REAL kernel pipeline — the same ``groupBy().applyInPandas`` ensemble,
gates, k-of-n consensus and early-exit padding as the flagships
(`plans/drift.py`, `plans/validate.py`) — restricted to the SEVEN detectors
whose full verdict (not just score) is SQL-expressible, via the reference's
algorithm-set selection surface (`crucible_algorithms.py:458-481`). The
DuckDB oracle restates every stage independently: per-day stats, the
30-point lookback prefix windows, all seven detector verdicts, the ordered
early-exit padding (`analyzer/algorithms.py:637-638`), k-of-n consensus
(`analyzer/algorithms.py:679-687`), the TooShort gate, constraint checks and
verdict precedence. A green driver row here certifies the actual pandas-UDF
execution path's arithmetic, not a DataFrame restatement of it.

Detector subset (ALGORITHMS order preserved; k = 5 of 7 mirrors the
reference's 6-of-9 CONSENSUS ratio, `settings.py:475`):
histogram_bins, first_hour_average, stddev_from_average,
mean_subtraction_cumulation, median_absolute_deviation,
stddev_from_moving_average (closed-form pow-weighted EWM moments),
least_squares. Excluded: grubbs (t_isf threshold), ks_test (p-value + ADF).

Cross-engine float discipline: every stat value entering the kernels is
bit-identical in both engines — integer-exact sums (text lengths, counts,
0/1 null flags), cents-quantized value averages, and type-1 (inverted-CDF)
percentiles picked by position. In-window detector aggregations then differ
only by summation order (numpy pairwise vs DuckDB streaming), which the
strict >3σ boolean comparisons absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import EnsembleConfig, ValidationConfig
from ..operators.detectors import ALGORITHMS
from .registry import load, query

__all__ = [
    "SQLABLE_DETECTORS",
    "FLAGSHIP_CONSENSUS_K",
    "prefix_consensus_sql",
    "drift_ensemble_daily_relational",
    "validate_pages_relational",
]

# the SQL-expressible detector subset, in the load-bearing ALGORITHMS order
# (settings.py:457-467); padding and the serialized `triggered` column both
# depend on this order
SQLABLE_DETECTORS = [
    "histogram_bins",
    "first_hour_average",
    "stddev_from_average",
    "mean_subtraction_cumulation",
    "median_absolute_deviation",
    "stddev_from_moving_average",
    "least_squares",
]
assert SQLABLE_DETECTORS == [
    n for n in ALGORITHMS if n in set(SQLABLE_DETECTORS)
], "subset must preserve ALGORITHMS order"

#: k of 7 — mirrors the reference's 6-of-9 CONSENSUS ratio (settings.py:475)
FLAGSHIP_CONSENSUS_K = 5
_MAX_FALSE = len(SQLABLE_DETECTORS) - FLAGSHIP_CONSENSUS_K + 1
_LOOKBACK = 30
_MIN_HISTORY = 6


def _sqlable_algos() -> dict:
    return {n: ALGORITHMS[n] for n in SQLABLE_DETECTORS}


def prefix_consensus_sql() -> str:
    """CTE chain restating the per-prefix 7-detector consensus in SQL.

    Expects an existing CTE ``series(g, stat, pd, value)`` — one point per
    (group, stat, partition date) — and emits a CTE ``drift(g, stat, pd,
    datapoint, eff, status, anomalous, triggered)`` with exactly the kernel
    semantics of ``plans/drift.py::_series_verdicts``: for each target point
    i the window is the trailing ``lookback_partitions`` points, detector
    timestamps are ``date.toordinal() * 86400`` (real calendar ordinals, so
    date gaps widen windows identically in both engines), ``tail_points=1``
    (the target partition IS the anomalous window), TOO_SHORT below
    ``min_history``, ordered early-exit padding at ``max_false`` recorded
    Falses, and k-of-n consensus over the recorded ensemble.
    """
    names = SQLABLE_DETECTORS
    k = FLAGSHIP_CONSENSUS_K
    # recorded verdict r_i = e_i AND (count of False among e_1..e_{i-1}) <
    # max_false — once consensus is impossible every later slot is padded
    # False (`analyzer/algorithms.py:637-638`)
    rec_cols = []
    for i in range(len(names)):
        if i == 0:
            rec_cols.append("e1 AS r1")
        else:
            prior = " + ".join(f"(NOT e{j + 1})::INT" for j in range(i))
            rec_cols.append(f"(e{i + 1} AND ({prior}) < {_MAX_FALSE}) AS r{i + 1}")
    rec_select = ",\n    ".join(rec_cols)
    r_sum = " + ".join(f"r{i + 1}::INT" for i in range(len(names)))
    trig = ", ".join(
        f"CASE WHEN r{i + 1} THEN '{n}' END" for i, n in enumerate(names)
    )
    return f"""
, ord_s AS (
  SELECT g, stat, pd, value,
         row_number() OVER (PARTITION BY g, stat ORDER BY pd) AS rn,
         (pd - DATE '0001-01-01' + 1)::BIGINT AS d
  FROM series
), pairs AS (
  SELECT t.g, t.stat, t.rn AS ti, t.pd, t.value AS tv,
         h.rn AS hj, h.value AS hv, h.d AS hd
  FROM ord_s t JOIN ord_s h
    ON h.g = t.g AND h.stat = t.stat
   AND h.rn BETWEEN t.rn - {_LOOKBACK - 1} AND t.rn
), win AS (
  SELECT g, stat, ti, pd, tv,
         count(*) AS eff,
         min(hd) AS d_lo,
         avg(hv) AS mean_all,
         stddev_samp(hv) AS std_all,
         min(hv) AS mn, max(hv) AS mx,
         avg(hv) FILTER (WHERE hj < ti) AS mean_head,
         stddev_samp(hv) FILTER (WHERE hj < ti) AS std_head,
         median(hv) AS med,
         covar_pop(hd * 86400.0, hv) / nullif(var_pop(hd * 86400.0), 0) AS ls_m,
         avg(hv) - covar_pop(hd * 86400.0, hv) / nullif(var_pop(hd * 86400.0), 0)
                   * avg(hd * 86400.0) AS ls_c,
         sum(pow(50.0/51.0, ti - hj)) AS sw,
         sum(pow(50.0/51.0, 2.0*(ti - hj))) AS sw2,
         sum(pow(50.0/51.0, ti - hj) * hv) AS swx,
         sum(pow(50.0/51.0, ti - hj) * hv * hv) AS swx2
  FROM pairs GROUP BY g, stat, ti, pd, tv
), fha AS (
  -- first-hour baseline: points in the window's oldest max(1, eff//3) days
  -- (plans/drift.py rescales baseline_head_seconds to eff//3 partitions)
  SELECT p.g, p.stat, p.ti,
         avg(p.hv) AS bmean, stddev_samp(p.hv) AS bstd
  FROM pairs p JOIN win w ON w.g = p.g AND w.stat = p.stat AND w.ti = p.ti
  WHERE p.hd < w.d_lo + greatest(1, w.eff // 3)
  GROUP BY p.g, p.stat, p.ti
), madc AS (
  SELECT p.g, p.stat, p.ti,
         median(abs(p.hv - w.med)) AS mad_dev,
         max(CASE WHEN p.hj = p.ti THEN abs(p.hv - w.med) END) AS dem_last
  FROM pairs p JOIN win w ON w.g = p.g AND w.stat = p.stat AND w.ti = p.ti
  GROUP BY p.g, p.stat, p.ti
), lsr AS (
  SELECT p.g, p.stat, p.ti,
         stddev_pop(p.hv - (w.ls_m * (p.hd * 86400.0) + w.ls_c)) AS ls_std,
         max(CASE WHEN p.hj = p.ti
                  THEN p.hv - (w.ls_m * (p.hd * 86400.0) + w.ls_c) END) AS ls_t
  FROM pairs p JOIN win w ON w.g = p.g AND w.stat = p.stat AND w.ti = p.ti
  GROUP BY p.g, p.stat, p.ti
), histc AS (
  -- np.histogram(values, 15) membership of the target's bin (half-open
  -- interior bins, last bin closed via least(14, ...))
  SELECT p.g, p.stat, p.ti,
         count(*) FILTER (WHERE
           least(14, greatest(0, floor((p.hv - w.mn) * 15.0 / (w.mx - w.mn))))
           = least(14, greatest(0, floor((w.tv - w.mn) * 15.0 / (w.mx - w.mn)))))
           AS t_bin_count
  FROM pairs p JOIN win w ON w.g = p.g AND w.stat = p.stat AND w.ti = p.ti
  WHERE w.mx > w.mn
  GROUP BY p.g, p.stat, p.ti
), det AS (
  SELECT w.*,
    -- reference loop quirks (`analyzer/algorithms.py:337-367`): the bin-0
    -- branch tests t <= bins[0] (fires only at t == min, an interior t in
    -- bin 0 never fires), and t == max matches no half-open loop check;
    -- a constant window lands numpy's [mn-.5, mx+.5] center bin (count=eff)
    CASE WHEN w.mx = w.mn THEN w.eff <= 20
         WHEN w.tv = w.mx THEN false
         WHEN w.tv = w.mn
              OR least(14, greatest(0,
                   floor((w.tv - w.mn) * 15.0 / (w.mx - w.mn)))) >= 1
           THEN coalesce(h.t_bin_count, 0) <= 20
         ELSE false END AS e1,
    coalesce(abs(w.tv - f.bmean) > 3 * f.bstd, false) AS e2,
    coalesce(abs(w.tv - w.mean_all) > 3 * w.std_all, false) AS e3,
    coalesce(abs(w.tv - w.mean_head) > 3 * w.std_head, false) AS e4,
    coalesce(m.mad_dev > 0 AND m.dem_last / m.mad_dev > 6, false) AS e5,
    coalesce(abs(w.tv - w.swx / w.sw) > 3 * sqrt(greatest(0.0,
        (w.swx2 / w.sw - (w.swx / w.sw) * (w.swx / w.sw))
        * (w.sw * w.sw / (w.sw * w.sw - w.sw2)))), false) AS e6,
    coalesce(abs(l.ls_t) > 3 * l.ls_std
             AND round(l.ls_std) <> 0 AND round(l.ls_t) <> 0, false) AS e7
  FROM win w
  LEFT JOIN fha f  ON f.g = w.g AND f.stat = w.stat AND f.ti = w.ti
  LEFT JOIN madc m ON m.g = w.g AND m.stat = w.stat AND m.ti = w.ti
  LEFT JOIN lsr l  ON l.g = w.g AND l.stat = w.stat AND l.ti = w.ti
  LEFT JOIN histc h ON h.g = w.g AND h.stat = w.stat AND h.ti = w.ti
), rec AS (
  SELECT *,
    {rec_select}
  FROM det
), drift AS (
  SELECT g, stat, pd, round(tv, 6) AS datapoint, eff,
    CASE WHEN eff < {_MIN_HISTORY} THEN 'TOO_SHORT'
         WHEN ({r_sum}) >= {k} THEN 'FAIL' ELSE 'OK' END AS status,
    CASE WHEN eff < {_MIN_HISTORY} THEN false
         ELSE ({r_sum}) >= {k} END AS anomalous,
    CASE WHEN eff < {_MIN_HISTORY} THEN ''
         ELSE concat_ws(',', {trig}) END AS triggered
  FROM rec
)"""


# ---------------------------------------------------------------------------
# flagship twin 1: per-day drift consensus over events daily stats
# ---------------------------------------------------------------------------

_DAILY_SQL = (
    """
WITH daily AS (
  SELECT event_type AS g, date_trunc('day', ts)::DATE AS pd,
         count(*)::DOUBLE AS row_count,
         (sum(round(value * 100)::BIGINT)::DOUBLE / count(*) / 100.0) AS value_avg,
         max(value) AS value_max
  FROM events GROUP BY 1, 2
), vord AS (
  SELECT event_type AS g, date_trunc('day', ts)::DATE AS pd, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY value) AS vr,
         count(*) OVER (PARTITION BY event_type, date_trunc('day', ts)) AS vn
  FROM events
), p50 AS (
  SELECT g, pd, min(CASE WHEN vr = ceil(vn * 0.5) THEN value END) AS value_p50
  FROM vord GROUP BY g, pd
), series AS (
  SELECT g, pd, 'row_count' AS stat, row_count AS value FROM daily
  UNION ALL SELECT g, pd, 'value_avg', value_avg FROM daily
  UNION ALL SELECT g, pd, 'value_p50', value_p50 FROM p50
  UNION ALL SELECT g, pd, 'value_max', value_max FROM daily
)"""
    + prefix_consensus_sql()
    + """
SELECT strftime(pd, '%Y-%m-%d') AS day, g AS event_type, stat,
       status, anomalous, triggered, datapoint
FROM drift ORDER BY 1, 2, 3
"""
)


@query(
    "drift_ensemble_daily_relational",
    _DAILY_SQL,
    doc="flagship twin: the REAL grouped-map kernel ensemble (plans/drift.py "
        "— gates, ordered early-exit padding, k-of-n consensus per "
        "analyzer/algorithms.py:583-687) over per-(day, event_type) stat "
        "series, restricted to the 7 SQL-expressible detectors (5-of-7 "
        "consensus mirrors the reference 6-of-9 ratio) so the DuckDB oracle "
        "can restate every verdict; stats are cents-quantized / "
        "position-picked so kernel inputs are bit-identical cross-engine",
)
def drift_ensemble_daily_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.drift import drift_verdicts

    ev = load(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts")).alias("partition_date")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    n = F.count(F.lit(1))
    daily = ev.groupBy(day, F.col("event_type").alias("lang")).agg(
        n.cast("double").alias("row_count"),
        # cents-quantized mean: integer sums are exact in float64, so the
        # value is bit-identical regardless of partitioning/fold order
        (F.sum(cents).cast("double") / n / 100.0).alias("value_avg"),
        # type-1 (inverted-CDF) median picked by sorted position — exact
        F.element_at(
            F.array_sort(F.collect_list("value")), F.ceil(n * 0.5).cast("int")
        ).alias("value_p50"),
        F.max("value").alias("value_max"),
    )
    stats = daily.select(
        "partition_date",
        "lang",
        F.expr(
            "stack(4, 'row_count', row_count, 'value_avg', value_avg, "
            "'value_p50', value_p50, 'value_max', value_max) as (stat, value)"
        ),
    )
    cfg = ValidationConfig(
        min_history=_MIN_HISTORY,
        lookback_partitions=_LOOKBACK,
        ensemble=EnsembleConfig(consensus=FLAGSHIP_CONSENSUS_K),
    )
    empty_samples = spark.createDataFrame(
        [], "partition_date date, lang string, stat string, sample array<double>"
    )
    out = drift_verdicts(
        stats,
        empty_samples,
        cfg,
        drift_stats=["row_count", "value_avg", "value_p50", "value_max"],
        sample_backed=set(),
        algorithms=_sqlable_algos(),
    )
    return out.select(
        F.date_format("partition_date", "yyyy-MM-dd").alias("day"),
        F.col("lang").alias("event_type"),
        "stat",
        "status",
        "anomalous",
        F.concat_ws(",", "triggered").alias("triggered"),
        F.round("datapoint", 6).alias("datapoint"),
    )

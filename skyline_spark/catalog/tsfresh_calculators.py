"""tsfresh-parity feature calculators, generated once for both engines.

The reference extracts its Ionosphere features with the tsfresh library and
pins the values with golden CSVs (`tests/baseline/tsfresh-0.4.0.py3.*.csv`,
`features_profile.py:54-503`). This module restates every SQL-expressible
calculator — 101 feature columns spanning the FULL tsfresh-0.4.0 default
parameter grids (autocorrelation lags 0-9, quantile/index_mass_quantile q
grids, symmetry_looking × 20 r's, large_standard_deviation × 10 r's,
value_count incl. NaN/±Inf, number_peaks n ∈ {1,3,5}, time-reversal lags
1-3) — as exact relational algebra: every aggregate is ONE shared ANSI-SQL
expression string evaluated by Spark (``F.expr`` inside ``groupBy().agg``)
AND inlined into the DuckDB oracle, so the two sides cannot drift. Together
with the 117 numpy-kernel features (``operators/tsfresh_kernels.py``) the
engine emits every one of the golden CSV's 216 pinned values
(tests/test_tsfresh_golden.py::test_full_golden_matrix_coverage).

Definition parity was pinned EMPIRICALLY against the reference's golden CSV
on its own 60-point fixture (utils/data.json[:60] — the series
tests/baseline/tsfresh_features_test.py builds), which disambiguated the
historically confusing calculators; tests/test_tsfresh_golden.py asserts
every implemented feature equals the tsfresh-0.4.0 golden value:

- percentage_of_reoccurring_datapoints_to_all_datapoints is UNIQUE-based
  (reoccurring distinct values / distinct values) while
  percentage_of_reoccurring_values_to_all_values is POINT-based;
- sum_of_reoccurring_values sums WITH multiplicity despite the name;
- autocorrelation(lag) is the Pearson corr of (x[:-lag], x[lag:])
  (pandas Series.autocorr), not the ACF normalization;
- time_reversal_asymmetry_statistic(lag) is mean(x·x₊₂ₗ² − x²·x₊ₗ)
  (the 0.4.0 roll arrangement), not the textbook x₊₂ₗ²·x₊ₗ − x₊ₗ·x² form;
- skewness/kurtosis are the pandas bias-corrected G1/G2;
- quantile(q) is type-7 (pandas default), index_mass_quantile uses |x|.

Not restated (need iterative/FFT kernels, stay out of the relational
feature matrix): approximate_entropy, sample_entropy, ar_coefficient,
augmented_dickey_fuller (the engine HAS adfuller in operators/stats_math —
it gates ks_test), cwt_coefficients, number_cwt_peaks, fft_coefficient,
spkt_welch_density, mean_autocorrelation, mean_abs_change_quantiles,
large_number_of_peaks (boolean wrapper of number_peaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "PREP_WINDOW_EXPRS",
    "SHARED_AGG_EXPRS",
    "TSF_FEATURE_NAMES",
    "tsfresh_feature_frame",
    "tsfresh_oracle_body",
]

# per-row window columns both engines derive identically from the ordered
# series e(event_type, rn, n, value); evaluated in TWO layers because bin10
# consumes the first layer's window outputs
PREP_WINDOW_EXPRS = [
    ("mean_v", "avg(value) OVER (PARTITION BY event_type)"),
    ("max_v", "max(value) OVER (PARTITION BY event_type)"),
    ("min_v", "min(value) OVER (PARTITION BY event_type)"),
    ("diff", "value - lag(value) OVER (PARTITION BY event_type ORDER BY rn)"),
    # lag/lead ladders: autocorrelation lags 0-9 need lead1..lead9,
    # time_reversal lags 1-3 need lead1..lead6, number_peaks n∈{1,3,5} needs
    # lag1..lag5 + lead1..lead5 — all planned into ONE window node per engine
    *[
        (f"lag{k}", f"lag(value, {k}) OVER (PARTITION BY event_type ORDER BY rn)")
        for k in range(1, 6)
    ],
    *[
        (f"lead{k}", f"lead(value, {k}) OVER (PARTITION BY event_type ORDER BY rn)")
        for k in range(1, 10)
    ],
    ("vcnt", "count(*) OVER (PARTITION BY event_type, value)"),
    # first-occurrence marker: sum(vfirst) ≡ count(DISTINCT value) but stays
    # a plain codegen aggregate — a single count(DISTINCT) in the shared
    # list forces an Expand that triples the rows through the aggregate.
    # NULL rows marked 0 so the NULL group never counts as a distinct value
    # (count(DISTINCT) ignores NULLs)
    ("vfirst",
     "CASE WHEN value IS NOT NULL AND "
     "row_number() OVER (PARTITION BY event_type, value ORDER BY rn)"
     " = 1 THEN 1e0 ELSE 0e0 END"),
    ("cum_abs",
     "sum(abs(value)) OVER (PARTITION BY event_type ORDER BY rn "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"),
    ("tot_abs", "sum(abs(value)) OVER (PARTITION BY event_type)"),
    # value rank for the type-7 quantile ladder. The leading (value IS NULL)
    # key is load-bearing: Spark orders NULLS FIRST, DuckDB NULLS LAST, so a
    # bare ORDER BY value would hand the two engines DIFFERENT ranks for the
    # non-NULL values whenever the series contains NULLs. Sorting the
    # boolean first (false < true in both) pins non-NULL values to ranks
    # 1..nv identically everywhere; NULL rows trail and can never satisfy a
    # vr = lo probe because their value is NULL anyway.
    ("vr",
     "row_number() OVER (PARTITION BY event_type "
     "ORDER BY (value IS NULL), value, rn)"),
    # non-NULL value count: the quantile ladder indexes over the values the
    # old native median() skipped — n/count(*) would shift lo by the NULL
    # row count
    ("nv", "count(value) OVER (PARTITION BY event_type)"),
]

PREP_LAYER2_EXPRS = [
    # np.histogram 10-bin index (binned_entropy); constant series → bin 0
    ("bin10",
     "CASE WHEN max_v = min_v THEN 0 ELSE least(9, greatest(0, "
     "floor((value - min_v) * 10.0 / (max_v - min_v)))) END"),
]

def _q7(q: float) -> str:
    """Type-7 (pandas default) quantile of value via the vr value-rank
    ladder: lo = floor((nv−1)·q)+1, linear interpolation to the next rank.
    Ranks and the length are both over NON-NULL values (nv / count(value)),
    matching the NULL-skipping native median()/np.median this ladder
    replaced. Inside the aggregated CASE the length is the per-row ``nv``
    window column (count(value) there would nest aggregates); the top-level
    frac term uses count(value) directly."""
    lo = f"floor((nv - 1) * {q}) + 1"
    v1 = f"max(CASE WHEN vr = {lo} THEN value END)"
    v2 = f"max(CASE WHEN vr = {lo} + 1 THEN value END)"
    frac = f"((count(value) - 1) * {q} - floor((count(value) - 1) * {q}))"
    return f"round({v1} + {frac} * (coalesce({v2}, {v1}) - {v1}), 6)"


# np.median == the type-7 quantile at q=0.5 (average of the two middle
# values for even n). NOT the native median() aggregate: that is a
# TypedImperativeAggregate, and ONE of it in the 100-aggregate list forces
# the whole Aggregate node onto the row-based ObjectHashAggregate path with
# every expression interpreted — measured 15-18 s vs ~2 s for the
# codegen'd HashAggregate this rank-ladder form keeps (the same
# ObjectHashAggregate cliff plans/stats.py documents for percentile_approx).
_MEDIAN = _q7(0.5)

# (column name, shared aggregate SQL over the prepped per-row frame)
SHARED_AGG_EXPRS: list[tuple[str, str]] = [
    ("series_length", "count(*)"),
    ("sum_values", "round(sum(value), 4)"),
    ("mean_value", "round(avg(value), 6)"),
    ("median_value", _MEDIAN),
    ("standard_deviation", "round(stddev_pop(value), 6)"),
    ("variance", "round(var_pop(value), 6)"),
    ("maximum", "round(max(value), 6)"),
    ("minimum", "round(min(value), 6)"),
    ("abs_energy", "round(sum(value * value), 2)"),
    ("absolute_sum_of_changes", "round(sum(abs(diff)), 4)"),
    ("mean_abs_change", "round(avg(abs(diff)), 6)"),
    ("mean_change", "round(avg(diff), 6)"),
    ("count_above_mean",
     "sum(CASE WHEN value > mean_v THEN 1 ELSE 0 END)"),
    ("count_below_mean",
     "sum(CASE WHEN value < mean_v THEN 1 ELSE 0 END)"),
    ("first_location_of_maximum",
     "round((min(CASE WHEN value = max_v THEN rn END) - 1e0) / count(*), 6)"),
    ("last_location_of_minimum",
     "round(max(CASE WHEN value = min_v THEN rn END) * 1e0 / count(*), 6)"),
    ("first_location_of_minimum",
     "round((min(CASE WHEN value = min_v THEN rn END) - 1e0) / count(*), 6)"),
    ("last_location_of_maximum",
     "round(max(CASE WHEN value = max_v THEN rn END) * 1e0 / count(*), 6)"),
    ("has_duplicate",
     "CASE WHEN count(*) > sum(vfirst) THEN 1e0 ELSE 0e0 END"),
    ("has_duplicate_max",
     "CASE WHEN max(CASE WHEN value = max_v THEN vcnt END) > 1 "
     "THEN 1e0 ELSE 0e0 END"),
    ("has_duplicate_min",
     "CASE WHEN max(CASE WHEN value = min_v THEN vcnt END) > 1 "
     "THEN 1e0 ELSE 0e0 END"),
    ("variance_larger_than_standard_deviation",
     "CASE WHEN var_pop(value) > stddev_pop(value) THEN 1e0 ELSE 0e0 END"),
    ("ratio_value_number_to_time_series_length",
     "round(sum(vfirst) / count(*), 6)"),
    ("sum_of_reoccurring_values",
     "round(sum(CASE WHEN vcnt > 1 THEN value ELSE 0 END), 4)"),
    # nullif: an all-NULL-value series has sum(vfirst)=0 — the unguarded
    # division traps DIVIDE_BY_ZERO under Spark ANSI mode (this expression
    # is NOT behind a lazy CASE) and yields IEEE NaN on DuckDB; NULL in both
    ("percentage_of_reoccurring_datapoints_to_all_datapoints",
     "round(sum(CASE WHEN vcnt > 1 THEN vfirst ELSE 0e0 END) "
     "/ nullif(sum(vfirst), 0), 6)"),
    ("percentage_of_reoccurring_values_to_all_values",
     "round(sum(CASE WHEN vcnt > 1 THEN 1e0 ELSE 0e0 END) / count(*), 6)"),
    ("skewness",
     "CASE WHEN count(*) > 2 AND var_pop(value) > 0 THEN "
     "round(sqrt(count(*) * (count(*) - 1e0)) / (count(*) - 2e0) "
     "* avg(pow(value - mean_v, 3)) / pow(var_pop(value), 1.5), 6) "
     "ELSE 0e0 END"),
    ("kurtosis",
     "CASE WHEN count(*) > 3 AND var_pop(value) > 0 THEN "
     "round(((count(*) + 1e0) * (avg(pow(value - mean_v, 4)) "
     "/ (var_pop(value) * var_pop(value)) - 3e0) + 6e0) "
     "* (count(*) - 1e0) / ((count(*) - 2e0) * (count(*) - 3e0)), 6) "
     "ELSE 0e0 END"),
    # n = 2 guard: the n−2 divisor is zero there and ANSI mode would trap
    # the division (tsfresh's slice mean over zero points is NaN → NULL)
    ("mean_second_derivate_central",
     "CASE WHEN count(*) > 2 THEN "
     "round(0.5e0 * ((max(CASE WHEN rn = n THEN value END) "
     "- max(CASE WHEN rn = n - 1 THEN value END)) "
     "- (max(CASE WHEN rn = 2 THEN value END) "
     "- max(CASE WHEN rn = 1 THEN value END))) / (count(*) - 2e0), 6) END"),
    ("time_reversal_asymmetry_statistic_lag_1",
     "round(avg(CASE WHEN rn <= n - 2 THEN "
     "value * lead2 * lead2 - value * value * lead1 END), 2)"),
    ("number_peaks_n_1",
     "sum(CASE WHEN rn > 1 AND rn < n AND value > lag1 AND value > lead1 "
     "THEN 1e0 ELSE 0e0 END)"),
    ("index_mass_quantile_q_0_5",
     "round(min(CASE WHEN cum_abs >= 0.5e0 * tot_abs THEN rn END) * 1e0 "
     "/ count(*), 6)"),
    ("symmetry_looking_r_0_05",
     f"CASE WHEN abs(avg(value) - {_MEDIAN}) "
     "< 0.05 * (max(value) - min(value)) THEN 1e0 ELSE 0e0 END"),
    ("large_standard_deviation_r_0_25",
     "CASE WHEN stddev_pop(value) > 0.25 * (max(value) - min(value)) "
     "THEN 1e0 ELSE 0e0 END"),
    ("quantile_q_0_9", _q7(0.9)),
    ("value_count_value_0",
     "sum(CASE WHEN value = 0 THEN 1e0 ELSE 0e0 END)"),
    ("range_count_max_1_min_m1",
     "sum(CASE WHEN value >= -1 AND value < 1 THEN 1e0 ELSE 0e0 END)"),
]


def _p(v: float) -> str:
    """Canonical param fragment for a column name: 0.05 → '0_05', 0.1 → '0_1'
    (the golden CSV's float-noise reprs like 0.15000000000000002 canonicalize
    to the same 2-dp value — tests map by parsed float, not by string)."""
    return f"{round(v, 2):g}".replace(".", "_").replace("-", "m")


# --- full tsfresh-0.4.0 default parameter grids (generated, shared by both
# engines; every definition pinned against the golden CSV on the reference
# fixture by tests/test_tsfresh_golden.py) -----------------------------------

# autocorrelation lags 0-9: pandas Series.autocorr — Pearson corr of
# (x_t, x_{t+lag}); lag 0 is corr(x, x) = 1 whenever the series varies.
# NOT native corr(): Spark's corr aggregate divides by the pair stddevs
# INSIDE the aggregate, so a constant (or constant-pair) series traps
# DIVIDE_BY_ZERO under ANSI mode even behind a CASE guard (aggregates
# evaluate regardless of the branch taken). The Pearson r is restated from
# population moments over the pair rows with a nullif-guarded top-level
# division — NULL on zero variance in BOTH engines (DuckDB's native corr
# returns NULL there too, so parity holds).


def _autocorr(k: int) -> str:
    if k == 0:
        return "CASE WHEN var_pop(value) > 0 THEN 1e0 END"
    xk = f"CASE WHEN lead{k} IS NOT NULL THEN value END"
    return (
        f"round((avg(({xk}) * lead{k}) - avg({xk}) * avg(lead{k})) "
        f"/ nullif(stddev_pop({xk}) * stddev_pop(lead{k}), 0), 6)"
    )


SHARED_AGG_EXPRS += [
    (f"autocorrelation_lag_{k}", _autocorr(k)) for k in range(10)
]

# time_reversal_asymmetry_statistic lags 2, 3 (lag 1 is in the literal list):
# mean over the first n−2l points of x·x₊₂ₗ² − x²·x₊ₗ (the 0.4.0 roll form)
SHARED_AGG_EXPRS += [
    (
        f"time_reversal_asymmetry_statistic_lag_{l}",
        f"round(avg(CASE WHEN rn <= n - {2 * l} THEN "
        f"value * lead{2 * l} * lead{2 * l} - value * value * lead{l} END), 2)",
    )
    for l in (2, 3)
]

# quantile q grid (q 0.9 is in the literal list; the golden grid skips 0.5)
SHARED_AGG_EXPRS += [
    (f"quantile_q_{_p(q)}", _q7(q)) for q in (0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8)
]

# index_mass_quantile q grid: first rn where the |x| mass reaches q, over n
# (q 0.5 in the literal list; the golden grid skips it)
SHARED_AGG_EXPRS += [
    (
        f"index_mass_quantile_q_{_p(q)}",
        f"round(min(CASE WHEN cum_abs >= {q} * tot_abs THEN rn END) * 1e0 "
        "/ count(*), 6)",
    )
    for q in (0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8, 0.9)
]

# large_standard_deviation r grid: std > r·(max−min) (r 0.25 in literal list)
SHARED_AGG_EXPRS += [
    (
        f"large_standard_deviation_r_{_p(r)}",
        f"CASE WHEN stddev_pop(value) > {r} * (max(value) - min(value)) "
        "THEN 1e0 ELSE 0e0 END",
    )
    for r in (0.0, 0.05, 0.1, 0.15, 0.2, 0.3, 0.35, 0.4, 0.45)
]

# symmetry_looking r grid: |mean − median| < r·(max−min) (r 0.05 in literal)
SHARED_AGG_EXPRS += [
    (
        f"symmetry_looking_r_{_p(r)}",
        f"CASE WHEN abs(avg(value) - {_MEDIAN}) "
        f"< {r} * (max(value) - min(value)) THEN 1e0 ELSE 0e0 END",
    )
    for r in (
        0.0, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5,
        0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95,
    )
]

# value_count grid: exact-value point counts (value 0 in the literal list);
# NaN/±Inf arms keep tsfresh's special values countable — cast('Infinity' as
# double) parses in both engines
SHARED_AGG_EXPRS += [
    ("value_count_value_1", "sum(CASE WHEN value = 1 THEN 1e0 ELSE 0e0 END)"),
    ("value_count_value_nan",
     "sum(CASE WHEN isnan(value) THEN 1e0 ELSE 0e0 END)"),
    ("value_count_value_inf",
     "sum(CASE WHEN value = cast('Infinity' as double) THEN 1e0 ELSE 0e0 END)"),
    ("value_count_value_minf",
     "sum(CASE WHEN value = cast('-Infinity' as double) THEN 1e0 ELSE 0e0 END)"),
]

# number_peaks n ∈ {3, 5} (n 1 in the literal list): strictly greater than
# every neighbour within ±n, target index range [n, len−n) 0-based
SHARED_AGG_EXPRS += [
    (
        f"number_peaks_n_{s}",
        "sum(CASE WHEN rn > {s} AND rn < n - {sm1} AND {cmp} "
        "THEN 1e0 ELSE 0e0 END)".format(
            s=s,
            sm1=s - 1,
            cmp=" AND ".join(
                f"value > lag{d} AND value > lead{d}" for d in range(1, s + 1)
            ),
        ),
    )
    for s in (3, 5)
]

# strikes + binned_entropy are computed in dedicated grouped passes (below);
# they join onto the shared-aggregate frame
EXTRA_FEATURES = [
    "longest_strike_above_mean",
    "longest_strike_below_mean",
    "binned_entropy_max_bins_10",
]

TSF_FEATURE_NAMES = [n for n, _ in SHARED_AGG_EXPRS] + EXTRA_FEATURES


def _prep(e: DataFrame) -> DataFrame:
    # selectExpr with alias-in-string: ONE Py4J call per layer instead of
    # two per column — at 100+ generated expressions the client-side
    # gateway round trips otherwise dominate plan-construction time
    # (measured ~6,500 round trips ≈ several seconds per build)
    s = e.selectExpr(
        "event_type",
        "rn",
        "n",
        "value",
        *[f"{sql} AS {name}" for name, sql in PREP_WINDOW_EXPRS],
    )
    return s.selectExpr(
        "*", *[f"{sql} AS {name}" for name, sql in PREP_LAYER2_EXPRS]
    )


def features_sum_expr() -> str:
    """The ONE features_sum definition both engines run.

    NULL-skipping sum (pandas .sum() semantics — the reference's
    features_sum ignores NaN calculators): coalesce each term. Each term is
    quantized to 6dp with the portable floor form FIRST: about half the
    calculators are raw float aggregates whose engine/fold-order ulp
    spreads, summed across ~100 terms, measurably straddled the final
    2dp rounding boundary (a committed flake: calc_sum 615630.07 vs .06).
    Summing identical 6dp-quantized doubles leaves only order-level ulp
    noise, which the final 2dp round absorbs. Integer-valued features pass
    through the quantization exactly.
    """
    terms = " + ".join(
        f"coalesce(floor(({n}) * 1000000 + 0.5) / 1000000, 0)"
        for n in TSF_FEATURE_NAMES
    )
    return f"round({terms}, 2)"


def tsfresh_feature_frame(e: DataFrame) -> DataFrame:
    """Feature matrix for a windowed series frame e(event_type, rn, n, value)
    — one row per event_type with every TSF_FEATURE_NAMES column plus the
    features_count/features_sum pair the reference persists for profile
    matching (`features_profile.py:466-482`)."""
    s = _prep(e)

    feat = s.groupBy("event_type").agg(
        *[F.expr(f"{sql} AS {name}") for name, sql in SHARED_AGG_EXPRS]
    )

    # gaps-and-islands strikes: a maximal run of consecutive rn with the
    # same above/below flag; rn - row_number-within-flag is constant per run
    from pyspark.sql import Window

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

    def _longest(flag, grp):
        return (
            runs.where(F.col(flag))
            .groupBy("event_type", grp)
            .count()
            .groupBy("event_type")
            .agg(F.max("count").alias(f"_{flag}"))
        )

    # binned_entropy: 10-bin histogram probabilities → -(Σ p·ln p), two tiny
    # aggs (bin counts, then per-group totals)
    bins = s.groupBy("event_type", "bin10").agg(F.count(F.lit(1)).alias("c"))
    totals = bins.groupBy("event_type").agg(F.sum("c").alias("t"))
    ent = (
        bins.join(totals, "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                -F.sum((F.col("c") / F.col("t")) * F.log(F.col("c") / F.col("t"))),
                6,
            ).alias("binned_entropy_max_bins_10")
        )
    )

    out = (
        feat.join(_longest("above", "ga"), "event_type", "left")
        .join(_longest("below", "gb"), "event_type", "left")
        .join(ent, "event_type", "left")
        .withColumn(
            "longest_strike_above_mean",
            F.coalesce("_above", F.lit(0)).cast("long"),
        )
        .withColumn(
            "longest_strike_below_mean",
            F.coalesce("_below", F.lit(0)).cast("long"),
        )
        .drop("_above", "_below")
        .withColumn("series_length", F.col("series_length").cast("long"))
        .withColumn("count_above_mean", F.col("count_above_mean").cast("long"))
        .withColumn("count_below_mean", F.col("count_below_mean").cast("long"))
        .withColumn(
            "features_count", F.lit(len(TSF_FEATURE_NAMES)).cast("long")
        )
    )
    return out.withColumn("features_sum", F.expr(features_sum_expr()))


def tsfresh_oracle_body() -> str:
    """DuckDB restatement over the windowed-series CTE ``e`` — the SAME
    shared aggregate strings, plus the strikes/entropy passes."""
    prep1 = ",\n         ".join(f"{sql} AS {name}" for name, sql in PREP_WINDOW_EXPRS)
    prep2 = ",\n         ".join(f"{sql} AS {name}" for name, sql in PREP_LAYER2_EXPRS)
    aggs = ",\n         ".join(f"{sql} AS {name}" for name, sql in SHARED_AGG_EXPRS)
    return f"""
, s1 AS (
  SELECT event_type, rn, n, value,
         {prep1}
  FROM e
), s AS (
  SELECT *,
         {prep2}
  FROM s1
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
), bins AS (
  SELECT event_type, bin10, count(*) AS c FROM s GROUP BY event_type, bin10
), totals AS (
  SELECT event_type, sum(c) AS t FROM bins GROUP BY event_type
), ent AS (
  SELECT b.event_type,
         round(-sum((b.c * 1e0 / tt.t) * ln(b.c * 1e0 / tt.t)), 6)
           AS binned_entropy_max_bins_10
  FROM bins b JOIN totals tt ON tt.event_type = b.event_type
  GROUP BY b.event_type
), feat AS (
  SELECT event_type,
         {aggs}
  FROM s GROUP BY event_type
), full_feat AS (
  SELECT f.* REPLACE (
           f.series_length::BIGINT AS series_length,
           f.count_above_mean::BIGINT AS count_above_mean,
           f.count_below_mean::BIGINT AS count_below_mean),
         coalesce(sa.longest, 0)::BIGINT AS longest_strike_above_mean,
         coalesce(sb.longest, 0)::BIGINT AS longest_strike_below_mean,
         en.binned_entropy_max_bins_10
  FROM feat f
  LEFT JOIN strike_above sa USING (event_type)
  LEFT JOIN strike_below sb USING (event_type)
  LEFT JOIN ent en USING (event_type)
)
SELECT *,
       {len(TSF_FEATURE_NAMES)}::BIGINT AS features_count,
       {features_sum_expr()} AS features_sum
FROM full_feat
ORDER BY event_type
"""

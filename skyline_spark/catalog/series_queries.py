"""Relational restatements of Skyline's detectors over the ``events`` table.

Each query treats ``events`` as one series per ``event_type`` ordered by
``(ts, event_id)`` — the Spark analog of a Redis metric key — and restates a
reference operator (file:line cited per query) as a Catalyst plan with a
DuckDB oracle. The numerically-exotic kernels (EWM, Grubbs-threshold,
ADF-gated KS) stay in the pandas-UDF kernel path (`operators/detectors.py`);
what is expressible relationally is expressed relationally so Catalyst can
push/prune/codegen it.

Series-axis conventions shared by Spark and oracle:
- rn = row_number within event_type ordered by (ts, event_id); n = count;
- "last datapoint" = rn = n; tail average = mean of rn > n-3
  (`analyzer/algorithms.py:78-89`);
- x for trend fits = seconds since the series' first point (exact
  (epoch_ms − min_epoch_ms)/1000.0 in both engines).

Scale notes: every query is a single groupBy/window over a sorted-within-
partition series — one shuffle on event_type (the "metric" key). At 10^12
rows the same plans hold with the partition key widened (e.g. (day, host));
the skewed-key risk sits on the shuffle and is handled by AQE skew splitting
plus salting at the stats layer (plans/stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .registry import load, query


def _ms(col: str):
    """epoch millis; parquet timestamps arrive as TIMESTAMP_NTZ and the
    session zone is pinned UTC, so the cast is an identity relabel that
    matches DuckDB's epoch_ms on the same naive values."""
    return F.unix_millis(F.col(col).cast("timestamp"))


# windowed-series scaffold for the oracle SQL
_E_CTE = """
WITH e AS (
  SELECT event_type, ts, value, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
         count(*)    OVER (PARTITION BY event_type) AS n,
         (epoch_ms(ts) - min(epoch_ms(ts)) OVER (PARTITION BY event_type)) / 1000.0 AS x
  FROM events
)
"""


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type")
    return ev.select(
        "event_type",
        "ts",
        "value",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
        (
            (_ms("ts") - F.min(_ms("ts")).over(wp)) / 1000.0
        ).alias("x"),
    )


def _tail_avg_col():
    """mean of the last 3 datapoints (`analyzer/algorithms.py:78-89`)."""
    return F.avg(F.when(F.col("rn") > F.col("n") - 3, F.col("value")))


_TAIL_SQL = "avg(value) FILTER (WHERE rn > n - 3)"
_LAST_SQL = "max(CASE WHEN rn = n THEN value END)"


# ---------------------------------------------------------------------------
# tail_avg
# ---------------------------------------------------------------------------

@query(
    "series_tail_avg",
    _E_CTE
    + f"""
SELECT event_type,
       round({_TAIL_SQL}, 6) AS tail_avg,
       round({_LAST_SQL}, 6) AS last_value,
       max(n)::BIGINT AS n
FROM e GROUP BY event_type ORDER BY event_type
""",
    doc="tail_avg helper (analyzer/algorithms.py:78-89): mean of last 3 points",
)
def series_tail_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _series(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(_tail_avg_col(), 6).alias("tail_avg"),
            F.round(F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))), 6).alias(
                "last_value"
            ),
            F.max("n").cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# detector: stddev_from_average  (analyzer/algorithms.py:197-216)
# ---------------------------------------------------------------------------

@query(
    "detector_stddev_from_average",
    _E_CTE
    + f"""
SELECT event_type,
       round(avg(value), 6) AS mean,
       round(stddev_samp(value), 6) AS std_dev,
       round({_TAIL_SQL}, 6) AS tail_avg,
       coalesce(abs({_TAIL_SQL} - avg(value)) > 3 * stddev_samp(value), FALSE) AS anomalous
FROM e GROUP BY event_type ORDER BY event_type
""",
    doc="|tail_avg − mean| > 3·sample-std (analyzer/algorithms.py:197-216), "
        "pure relational form — map-side partial agg, one shuffle",
)
def detector_stddev_from_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tail_avg_col()
    return (
        _series(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("mean"),
            F.round(F.stddev_samp("value"), 6).alias("std_dev"),
            F.round(t, 6).alias("tail_avg"),
            F.coalesce(
                F.abs(t - F.avg("value")) > 3 * F.stddev_samp("value"),
                F.lit(False),
            ).alias("anomalous"),
        )
    )


# ---------------------------------------------------------------------------
# detector: median_absolute_deviation  (analyzer/algorithms.py:92-139)
# ---------------------------------------------------------------------------

@query(
    "detector_median_absolute_deviation",
    _E_CTE
    + f"""
, med AS (
  SELECT event_type, median(value)::DOUBLE AS med FROM e GROUP BY event_type
), dev AS (
  SELECT e.event_type, abs(e.value - med.med) AS d, e.rn, e.n, med.med
  FROM e JOIN med ON e.event_type = med.event_type
)
SELECT event_type,
       round(max(med), 6) AS median,
       round(median(d)::DOUBLE, 6) AS mad,
       round(max(CASE WHEN rn = n THEN d END), 6) AS last_deviation,
       CASE WHEN median(d) = 0 THEN false
            ELSE max(CASE WHEN rn = n THEN d END) / median(d) > 6 END AS anomalous
FROM dev GROUP BY event_type ORDER BY event_type
""",
    doc="MAD test: |last − median| / median(|x − median|) > 6, MAD==0 → False "
        "(analyzer/algorithms.py:92-139); exact medians both engines",
)
def detector_median_absolute_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "rn", "n", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    last_d = F.max(F.when(F.col("rn") == F.col("n"), F.col("d")))
    return dev.groupBy("event_type").agg(
        F.round(F.max("med"), 6).alias("median"),
        F.round(F.median("d"), 6).alias("mad"),
        F.round(last_d, 6).alias("last_deviation"),
        F.when(F.median("d") == 0, F.lit(False))
        .otherwise(last_d / F.median("d") > 6)
        .alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# detector: mean_subtraction_cumulation  (analyzer/algorithms.py:247-273)
# ---------------------------------------------------------------------------

@query(
    "detector_mean_subtraction_cumulation",
    _E_CTE
    + f"""
SELECT event_type,
       round(avg(value) FILTER (WHERE rn < n), 6) AS head_mean,
       round(stddev_samp(value) FILTER (WHERE rn < n), 6) AS head_std,
       round({_LAST_SQL}, 6) AS last_value,
       coalesce(abs({_LAST_SQL} - avg(value) FILTER (WHERE rn < n))
        > 3 * stddev_samp(value) FILTER (WHERE rn < n), FALSE) AS anomalous
FROM e GROUP BY event_type ORDER BY event_type
""",
    doc="|last − mean(head)| > 3·std(head), head = all but last "
        "(analyzer/algorithms.py:247-273)",
)
def detector_mean_subtraction_cumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    head = F.when(F.col("rn") < F.col("n"), F.col("value"))
    last = F.max(F.when(F.col("rn") == F.col("n"), F.col("value")))
    return (
        _series(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.avg(head), 6).alias("head_mean"),
            F.round(F.stddev_samp(head), 6).alias("head_std"),
            F.round(last, 6).alias("last_value"),
            F.coalesce(
                F.abs(last - F.avg(head)) > 3 * F.stddev_samp(head),
                F.lit(False),
            ).alias("anomalous"),
        )
    )


# ---------------------------------------------------------------------------
# detector: first_hour_average  (analyzer/algorithms.py:175-194)
# ---------------------------------------------------------------------------

@query(
    "detector_first_hour_average",
    _E_CTE
    + f"""
SELECT event_type,
       round(avg(value) FILTER (WHERE x < 86400), 6) AS baseline_mean,
       round(stddev_samp(value) FILTER (WHERE x < 86400), 6) AS baseline_std,
       round({_TAIL_SQL}, 6) AS tail_avg,
       coalesce(abs({_TAIL_SQL} - avg(value) FILTER (WHERE x < 86400))
        > 3 * stddev_samp(value) FILTER (WHERE x < 86400), FALSE) AS anomalous
FROM e GROUP BY event_type ORDER BY event_type
""",
    doc="tail vs the OLDEST day of the series (the reference's 'first hour' "
        "rescaled to the data's resolution; analyzer/algorithms.py:175-194)",
)
def detector_first_hour_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = F.when(F.col("x") < 86400, F.col("value"))
    t = _tail_avg_col()
    return (
        _series(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.avg(base), 6).alias("baseline_mean"),
            F.round(F.stddev_samp(base), 6).alias("baseline_std"),
            F.round(t, 6).alias("tail_avg"),
            F.coalesce(
                F.abs(t - F.avg(base)) > 3 * F.stddev_samp(base),
                F.lit(False),
            ).alias("anomalous"),
        )
    )


# ---------------------------------------------------------------------------
# detector: least_squares  (analyzer/algorithms.py:276-334)
# ---------------------------------------------------------------------------

@query(
    "detector_least_squares",
    _E_CTE
    + """
, fit AS (
  -- nullif: a single-point or constant-time series has var_pop(x)=0; the
  -- slope goes NULL in BOTH engines (vs an ANSI DIVIDE_BY_ZERO crash on
  -- Spark / IEEE inf on DuckDB) and the verdict coalesces to FALSE, the
  -- reference's algorithm-exception contract (algorithms.py:708-723)
  SELECT event_type,
         covar_pop(x, value) / nullif(var_pop(x), 0) AS m,
         avg(value) - covar_pop(x, value) / nullif(var_pop(x), 0) * avg(x) AS c
  FROM e GROUP BY event_type
), r AS (
  SELECT e.event_type, e.rn, e.n,
         e.value - (fit.m * e.x + fit.c) AS err, fit.m, fit.c
  FROM e JOIN fit ON e.event_type = fit.event_type
)
SELECT event_type,
       round(max(m), 9) AS slope,
       round(max(c), 6) AS intercept,
       round(stddev_pop(err), 6) AS resid_std,
       round(avg(err) FILTER (WHERE rn > n - 3), 6) AS tail_resid,
       coalesce(abs(avg(err) FILTER (WHERE rn > n - 3)) > 3 * stddev_pop(err)
        AND round(stddev_pop(err)) <> 0
        AND round(avg(err) FILTER (WHERE rn > n - 3)) <> 0, FALSE) AS anomalous
FROM r GROUP BY event_type ORDER BY event_type
""",
    doc="OLS trend via closed form covar_pop/var_pop (the relational twin of "
        "np.linalg.lstsq in the kernel); residual tail test per "
        "analyzer/algorithms.py:276-334",
)
def detector_least_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    varx = F.nullif(F.var_pop("x"), F.lit(0.0))
    fit = e.groupBy("event_type").agg(
        (F.covar_pop("x", "value") / varx).alias("m"),
        (F.avg("value") - F.covar_pop("x", "value") / varx * F.avg("x")).alias(
            "c"
        ),
    )
    r = e.join(F.broadcast(fit), "event_type").select(
        "event_type",
        "rn",
        "n",
        "m",
        "c",
        (F.col("value") - (F.col("m") * F.col("x") + F.col("c"))).alias("err"),
    )
    tail = F.avg(F.when(F.col("rn") > F.col("n") - 3, F.col("err")))
    return r.groupBy("event_type").agg(
        F.round(F.max("m"), 9).alias("slope"),
        F.round(F.max("c"), 6).alias("intercept"),
        F.round(F.stddev_pop("err"), 6).alias("resid_std"),
        F.round(tail, 6).alias("tail_resid"),
        F.coalesce(
            (F.abs(tail) > 3 * F.stddev_pop("err"))
            & (F.round(F.stddev_pop("err"), 0) != 0)
            & (F.round(tail, 0) != 0),
            F.lit(False),
        ).alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# detector: histogram_bins  (analyzer/algorithms.py:337-367)
# ---------------------------------------------------------------------------

# constant-series guard: NULLIF keeps a zero-width series on the NULL path
# in BOTH engines (DuckDB IEEE division would give NaN and least(14, NaN)=14,
# Spark non-ANSI division gives NULL — greatest/least skip NULLs in both, so
# the guarded bin collapses to 0 identically)
_HIST_BIN = (
    "least(14, greatest(0, floor((value - mn) * 15.0 / nullif(mx - mn, 0))))::BIGINT"
)
_HIST_TBIN = "least(14, greatest(0, floor((t - mn) * 15.0 / nullif(mx - mn, 0))))::BIGINT"

@query(
    "detector_histogram_bins",
    _E_CTE
    + f"""
, stats AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx,
         {_TAIL_SQL} AS t
  FROM e GROUP BY event_type
), binned AS (
  SELECT e.event_type, s.t, s.mn, s.mx,
         {_HIST_BIN} AS bin,
         {_HIST_TBIN} AS tbin
  FROM e JOIN stats s ON e.event_type = s.event_type
)
SELECT event_type,
       max(tbin)::BIGINT AS tail_bin,
       count(*) FILTER (WHERE bin = tbin)::BIGINT AS tail_bin_count,
       (count(*) FILTER (WHERE bin = tbin) <= 20) AS anomalous
FROM binned GROUP BY event_type ORDER BY event_type
""",
    doc="15 equal-width bins (numpy-linspace arithmetic); anomalous iff the "
        "tail average lands in a bin with ≤ 20 members "
        "(analyzer/algorithms.py:337-367)",
)
def detector_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    stats = e.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"), _tail_avg_col().alias("t")
    )
    def _bin(c):
        # explicit constant-series guard (mirrors the oracle's NULLIF): a
        # zero-width histogram puts everything in bin 0 via the NULL path
        width = F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
        return F.least(
            F.lit(14).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((c - F.col("mn")) * 15.0 / width),
            ),
        )

    binned = e.join(F.broadcast(stats), "event_type").select(
        "event_type",
        _bin(F.col("value")).alias("bin"),
        _bin(F.col("t")).alias("tbin"),
    )
    return binned.groupBy("event_type").agg(
        F.max("tbin").cast("long").alias("tail_bin"),
        F.count(F.when(F.col("bin") == F.col("tbin"), 1)).cast("long").alias(
            "tail_bin_count"
        ),
        (F.count(F.when(F.col("bin") == F.col("tbin"), 1)) <= 20).alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# detector: grubbs z-score  (analyzer/algorithms.py:142-172)
# ---------------------------------------------------------------------------

@query(
    "detector_grubbs_score",
    _E_CTE
    + f"""
SELECT event_type,
       round(({_TAIL_SQL} - avg(value))
             / nullif(stddev_pop(value), 0), 6) AS z_score,
       max(n)::BIGINT AS n
FROM e GROUP BY event_type ORDER BY event_type
""",
    doc="Grubbs z of tail_avg with population std (scipy.std parity); the "
        "t-distribution threshold lives in the kernel (stats_math.t_isf) — "
        "score is the relational part (analyzer/algorithms.py:142-172)",
)
def detector_grubbs_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tail_avg_col()
    return (
        _series(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            # nullif: a constant series (std 0) gets a NULL z in BOTH
            # engines instead of an ANSI DIVIDE_BY_ZERO crash
            F.round(
                (t - F.avg("value")) / F.nullif(F.stddev_pop("value"), F.lit(0.0)),
                6,
            ).alias("z_score"),
            F.max("n").cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# detector: two-sample KS D statistic  (analyzer/algorithms.py:370-401)
# ---------------------------------------------------------------------------

@query(
    "detector_ks_2samp_d",
    _E_CTE
    + """
, g AS (
  SELECT event_type, value,
         CASE WHEN rn <= n / 2 THEN 1 ELSE 0 END AS g1,
         CASE WHEN rn <= n / 2 THEN 0 ELSE 1 END AS g2
  FROM e
), c AS (
  SELECT event_type, value,
         sum(g1) OVER (PARTITION BY event_type ORDER BY value
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         sum(g2) OVER (PARTITION BY event_type ORDER BY value
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
         sum(g1) OVER (PARTITION BY event_type) AS n1,
         sum(g2) OVER (PARTITION BY event_type) AS n2
  FROM g
)
SELECT event_type,
       -- nullif: a 1-point series has an empty first half (n1=0) — D goes
       -- NULL and the verdict FALSE in both engines instead of an ANSI /0
       round(max(abs(c1::DOUBLE / nullif(n1, 0)
                     - c2::DOUBLE / nullif(n2, 0))), 6) AS ks_d,
       coalesce(max(abs(c1::DOUBLE / nullif(n1, 0)
                        - c2::DOUBLE / nullif(n2, 0))) > 0.5, FALSE) AS d_exceeds
FROM c GROUP BY event_type ORDER BY event_type
""",
    doc="exact two-sample KS D via RANGE-frame cumulative CDFs (reference "
        "windows analyzer/algorithms.py:379-384; p-value + ADF gate stay in "
        "the kernel, stats_math.ks_2samp/adfuller)",
)
def detector_ks_2samp_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    g = e.select(
        "event_type",
        "value",
        F.when(F.col("rn") <= F.col("n") / 2, 1).otherwise(0).alias("g1"),
        F.when(F.col("rn") <= F.col("n") / 2, 0).otherwise(1).alias("g2"),
    )
    wr = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("event_type")
    c = g.select(
        "event_type",
        (
            F.sum("g1").over(wr).cast("double")
            / F.nullif(F.sum("g1").over(wp), F.lit(0))
        ).alias("f1"),
        (
            F.sum("g2").over(wr).cast("double")
            / F.nullif(F.sum("g2").over(wp), F.lit(0))
        ).alias("f2"),
    )
    d = F.max(F.abs(F.col("f1") - F.col("f2")))
    return c.groupBy("event_type").agg(
        F.round(d, 6).alias("ks_d"),
        F.coalesce(d > 0.5, F.lit(False)).alias("d_exceeds"),
    )


# ---------------------------------------------------------------------------
# detector: stddev_from_moving_average (EWM)  (analyzer/algorithms.py:219-244)
# ---------------------------------------------------------------------------

# pandas ewm(com=50, adjust=True) weight for row rn in a series of n points:
# alpha = 1/(1+com) = 1/51, weight (1-alpha)^(n-rn) = (50/51)^(n-rn).
# The last-index EWM mean/std that the reference reads (`.iloc[-1]`) are then
# plain weighted moments, so both engines can compute them as pow-weighted
# sums — no recursion needed. std uses pandas' bias=False reliability-weight
# correction sw^2/(sw^2 - sw2). Formula parity with pandas.ewm is asserted in
# tests/test_detectors_golden.py.
_EWM_SQL = """
, w AS (
  SELECT event_type, value, rn, n, pow(50.0/51.0, n - rn) AS wt FROM e
), a AS (
  SELECT event_type,
         sum(wt)                 AS sw,
         sum(wt * wt)            AS sw2,
         sum(wt * value)         AS swx,
         sum(wt * value * value) AS swx2,
         max(CASE WHEN rn = n THEN value END) AS last_value
  FROM w GROUP BY event_type
), m AS (
  -- nullif: n=1 makes the bias=False reliability weight 0/0 (pandas yields
  -- NaN std there) — std goes NULL, verdict FALSE, no ANSI /0 crash
  SELECT event_type, last_value,
         swx / sw AS ewma,
         sqrt(greatest(0.0, (swx2 / sw - (swx / sw) * (swx / sw))
                            * (sw * sw / nullif(sw * sw - sw2, 0)))) AS ewm_std
  FROM a
)
SELECT event_type,
       round(ewma, 6) AS ewma,
       round(ewm_std, 6) AS ewm_std,
       round(last_value, 6) AS last_value,
       coalesce(abs(last_value - ewma) > 3 * ewm_std, FALSE) AS anomalous
FROM m ORDER BY event_type
"""


@query(
    "detector_stddev_from_moving_average",
    _E_CTE + _EWM_SQL,
    doc="EWM detector (analyzer/algorithms.py:219-244): anomalous iff "
        "|last − ewm_mean| > 3·ewm_std with pandas ewm(com=50, adjust=True) "
        "semantics, std bias=False — restated as closed-form pow-weighted "
        "moments so the plan is one shuffle + codegen'd aggregate (the "
        "pandas-recursive form lives in operators/detectors.py:199)",
)
def detector_stddev_from_moving_average(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _series(spark, sf_dir)
    wt = F.pow(F.lit(50.0 / 51.0), F.col("n") - F.col("rn"))
    w = e.select("event_type", "value", "rn", "n", wt.alias("wt"))
    a = w.groupBy("event_type").agg(
        F.sum("wt").alias("sw"),
        F.sum(F.col("wt") * F.col("wt")).alias("sw2"),
        F.sum(F.col("wt") * F.col("value")).alias("swx"),
        F.sum(F.col("wt") * F.col("value") * F.col("value")).alias("swx2"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias(
            "last_value"
        ),
    )
    ewma = F.col("swx") / F.col("sw")
    var_biased = F.col("swx2") / F.col("sw") - ewma * ewma
    corr = (F.col("sw") * F.col("sw")) / F.nullif(
        F.col("sw") * F.col("sw") - F.col("sw2"), F.lit(0.0)
    )
    ewm_std = F.sqrt(F.greatest(F.lit(0.0), var_biased * corr))
    return a.select(
        "event_type",
        F.round(ewma, 6).alias("ewma"),
        F.round(ewm_std, 6).alias("ewm_std"),
        F.round("last_value", 6).alias("last_value"),
        F.coalesce(
            F.abs(F.col("last_value") - ewma) > 3 * ewm_std, F.lit(False)
        ).alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# gates: TooShort / Stale / Boring  (analyzer/algorithms.py:583-593)
# ---------------------------------------------------------------------------

GATE_MIN_LEN = 30
GATE_STALE_SECONDS = 86400

@query(
    "series_gates",
    _E_CTE
    + f"""
, now_t AS (SELECT max(epoch_ms(ts)) AS now_ms FROM events)
SELECT event_type,
       max(n)::BIGINT AS n,
       count(DISTINCT value) FILTER (WHERE rn > n - 100)::BIGINT AS tail_distinct,
       CASE
         WHEN max(n) < {GATE_MIN_LEN} THEN 'TOO_SHORT'
         WHEN (SELECT now_ms FROM now_t) - max(epoch_ms(ts)) > {GATE_STALE_SECONDS} * 1000 THEN 'STALE'
         WHEN count(DISTINCT value) FILTER (WHERE rn > n - 100) = 1 THEN 'BORING'
         ELSE 'OK'
       END AS status
FROM e GROUP BY event_type ORDER BY event_type
""",
    doc="TooShort/Stale/Boring gates as statuses (analyzer/algorithms.py:583-593, "
        "settings.py:393,418,425,435) — relational pre-filters before kernels",
)
def series_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    # "now" = the table's newest timestamp, as a 1-row broadcast cross join —
    # no driver .collect() in the plan (the scalar stays distributed, so the
    # whole gate check remains one lazy DAG at any scale)
    now = e.agg(F.max(_ms("ts")).alias("now_ms"))
    tail_distinct = F.count_distinct(
        F.when(F.col("rn") > F.col("n") - 100, F.col("value"))
    )
    return (
        e.crossJoin(F.broadcast(now))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            tail_distinct.cast("long").alias("tail_distinct"),
            F.when(F.max("n") < GATE_MIN_LEN, F.lit("TOO_SHORT"))
            .when(
                F.max("now_ms") - F.max(_ms("ts")) > GATE_STALE_SECONDS * 1000,
                F.lit("STALE"),
            )
            .when(tail_distinct == 1, F.lit("BORING"))
            .otherwise(F.lit("OK"))
            .alias("status"),
        )
    )


# ---------------------------------------------------------------------------
# transform: nonNegativeDerivative + monotonicity
# (skyline_functions.py:1044-1100)
# ---------------------------------------------------------------------------

@query(
    "transform_non_negative_derivative",
    _E_CTE
    + """
, d AS (
  SELECT event_type,
         value - lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS diff
  FROM e
)
SELECT event_type,
       count(diff)::BIGINT AS n_deltas,
       count(*) FILTER (WHERE diff < 0)::BIGINT AS n_resets,
       round(sum(diff) FILTER (WHERE diff >= 0), 6) AS pos_delta_sum,
       (count(*) FILTER (WHERE diff < 0) = 0
        AND count(DISTINCT diff) > 1
        AND sum(diff) <> 0) AS strictly_monotonic
FROM d GROUP BY event_type ORDER BY event_type
""",
    doc="Graphite nonNegativeDerivative (drop resets) + "
        "strictly_increasing_monotonicity classification "
        "(skyline_functions.py:1044-1100)",
)
def transform_non_negative_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = (
        _series(spark, sf_dir)
        .select("event_type", (F.col("value") - F.lag("value").over(w)).alias("diff"))
    )
    return d.groupBy("event_type").agg(
        F.count("diff").cast("long").alias("n_deltas"),
        F.count(F.when(F.col("diff") < 0, 1)).cast("long").alias("n_resets"),
        F.round(F.sum(F.when(F.col("diff") >= 0, F.col("diff"))), 6).alias(
            "pos_delta_sum"
        ),
        (
            (F.count(F.when(F.col("diff") < 0, 1)) == 0)
            & (F.count_distinct("diff") > 1)
            & (F.sum("diff") != 0)
        ).alias("strictly_monotonic"),
    )


# ---------------------------------------------------------------------------
# boundary: static thresholds  (boundary/boundary_algorithms.py:104-142)
# ---------------------------------------------------------------------------

BOUNDARY_LESS_TRIGGER = 1.0
BOUNDARY_GREATER_TRIGGER = 300.0

@query(
    "boundary_static_thresholds",
    _E_CTE
    + f"""
SELECT event_type,
       round({_LAST_SQL}, 6) AS last_value,
       ({_LAST_SQL} < {BOUNDARY_LESS_TRIGGER}) AS less_than_violation,
       ({_LAST_SQL} > {BOUNDARY_GREATER_TRIGGER}) AS greater_than_violation
FROM e GROUP BY event_type ORDER BY event_type
""",
    doc="Boundary less_than / greater_than static triggers on the last "
        "datapoint (boundary_algorithms.py:104-142)",
)
def boundary_static_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    last = F.max(F.when(F.col("rn") == F.col("n"), F.col("value")))
    return (
        _series(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(last, 6).alias("last_value"),
            (last < BOUNDARY_LESS_TRIGGER).alias("less_than_violation"),
            (last > BOUNDARY_GREATER_TRIGGER).alias("greater_than_violation"),
        )
    )


# ---------------------------------------------------------------------------
# boundary: detect_drop_off_cliff  (boundary_algorithms.py:145-284)
# ---------------------------------------------------------------------------

@query(
    "boundary_drop_off_cliff",
    _E_CTE
    + """
, t10 AS (
  SELECT event_type,
         min(value) FILTER (WHERE rn > n - 10) AS mn10,
         max(value) FILTER (WHERE rn > n - 10) AS mx10,
         avg(value) FILTER (WHERE rn > n - 10) AS avg10,
         sum(value) FILTER (WHERE rn > n - 10) AS sum10,
         max(CASE WHEN rn = n THEN value END) AS last_v,
         max(n) AS n
  FROM e GROUP BY event_type
), t20 AS (
  SELECT e.event_type,
         count(*) FILTER (WHERE e.rn > e.n - 20 AND e.value <= t10.mn10) AS similar20
  FROM e JOIN t10 ON e.event_type = t10.event_type GROUP BY e.event_type
), t10j AS (
  SELECT t10.*, t20.similar20 FROM t10 JOIN t20 ON t10.event_type = t20.event_type
)
SELECT event_type,
       round(avg10, 6) AS avg10,
       round(last_v, 6) AS last_value,
       CASE
         WHEN n < 30 THEN false
         WHEN mn10 < 0 THEN false
         WHEN mx10 = 0 THEN false
         WHEN mn10 = mx10 THEN false
         WHEN similar20 > 2 THEN false
         ELSE floor(avg10 / (CASE WHEN floor(last_v) = 0 THEN 0.1 ELSE floor(last_v) END))
              > (CASE
                   WHEN floor(last_v) = 1 AND mx10 < 10 THEN 0.1
                   WHEN floor(last_v) = 1 THEN 1
                   WHEN mx10 > 100 THEN 100
                   WHEN mx10 < 20 THEN avg10 / 2
                   WHEN mx10 < 101 THEN 15
                   ELSE 100 END)
       END AS anomalous
FROM t10j ORDER BY event_type
""",
    doc="drop-off-cliff: avg of last 10 vs last value with value-banded "
        "trigger (boundary_algorithms.py:145-284). Deviations from the "
        "reference, documented: the reference's 'similar datapoints' gates "
        "call len(np.where(...)) on a tuple (always 1, so they never fire — "
        "a reference bug); we implement the *intended* count-based gate over "
        "the last 20 points. Windows are row-count based (last 10/20 rows) "
        "rather than resolution-seconds, equivalent on evenly-sampled data.",
)
def boundary_drop_off_cliff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    in10 = F.col("rn") > F.col("n") - 10
    t10 = e.groupBy("event_type").agg(
        F.min(F.when(in10, F.col("value"))).alias("mn10"),
        F.max(F.when(in10, F.col("value"))).alias("mx10"),
        F.avg(F.when(in10, F.col("value"))).alias("avg10"),
        F.sum(F.when(in10, F.col("value"))).alias("sum10"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias("last_v"),
        F.max("n").alias("n"),
    )
    t20 = (
        e.join(F.broadcast(t10.select("event_type", "mn10")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(
                F.when(
                    (F.col("rn") > F.col("n") - 20) & (F.col("value") <= F.col("mn10")),
                    1,
                )
            ).alias("similar20")
        )
    )
    t10 = t10.join(t20, "event_type")
    last_i = F.floor(F.col("last_v"))
    denom = F.when(last_i == 0, F.lit(0.1)).otherwise(last_i)
    trigger = (
        F.when((last_i == 1) & (F.col("mx10") < 10), F.lit(0.1))
        .when(last_i == 1, F.lit(1.0))
        .when(F.col("mx10") > 100, F.lit(100.0))
        .when(F.col("mx10") < 20, F.col("avg10") / 2)
        .when(F.col("mx10") < 101, F.lit(15.0))
        .otherwise(F.lit(100.0))
    )
    anomalous = (
        F.when(F.col("n") < 30, F.lit(False))
        .when(F.col("mn10") < 0, F.lit(False))
        .when(F.col("mx10") == 0, F.lit(False))
        .when(F.col("mn10") == F.col("mx10"), F.lit(False))
        .when(F.col("similar20") > 2, F.lit(False))
        .otherwise(F.floor(F.col("avg10") / denom) > trigger)
    )
    return t10.select(
        "event_type",
        F.round("avg10", 6).alias("avg10"),
        F.round("last_v", 6).alias("last_value"),
        anomalous.alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# boundary: autoaggregate_ts  (boundary_algorithms.py:47-101)
# ---------------------------------------------------------------------------

AUTOAGG_SECONDS = 300

@query(
    "boundary_autoaggregate",
    f"""
SELECT event_type,
       (floor(epoch_ms(ts) / 1000.0 / {AUTOAGG_SECONDS}) * {AUTOAGG_SECONDS})::BIGINT AS bucket_start,
       round(sum(value), 6) AS bucket_sum,
       count(*)::BIGINT AS bucket_count
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="autoaggregate_ts: re-bucket the series into fixed-width second "
        "buckets of sums (boundary_algorithms.py:47-101) — F.window/"
        "time-bucket semantics, epoch-aligned in both engines",
)
def boundary_autoaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.floor(_ms("ts") / 1000.0 / AUTOAGG_SECONDS) * AUTOAGG_SECONDS
    ).cast("long")
    return (
        ev.groupBy("event_type", bucket.alias("bucket_start"))
        .agg(
            F.round(F.sum("value"), 6).alias("bucket_sum"),
            F.count("*").cast("long").alias("bucket_count"),
        )
    )


# ---------------------------------------------------------------------------
# boundary: ALERT_THRESHOLD consecutive-trigger  (boundary/boundary.py:901-965)
# ---------------------------------------------------------------------------

BOUNDARY_ALERT_TRIGGER = 50.0   # static trigger evaluated each run
BOUNDARY_ALERT_THRESHOLD = 3    # alert only after this many runs in a row

@query(
    "boundary_alert_threshold",
    _E_CTE
    + f"""
, t AS (
  SELECT event_type, rn, n,
         (value > {BOUNDARY_ALERT_TRIGGER}) AS trig,
         max(CASE WHEN value <= {BOUNDARY_ALERT_TRIGGER} THEN rn END)
           OVER (PARTITION BY event_type ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_quiet
  FROM e
), s AS (
  SELECT event_type, rn, n,
         CASE WHEN trig THEN rn - coalesce(last_quiet, 0) ELSE 0 END AS streak
  FROM t
)
SELECT event_type,
       max(n)::BIGINT AS n,
       max(CASE WHEN rn = n THEN streak END)::BIGINT AS last_streak,
       (max(CASE WHEN rn = n THEN streak END) >= {BOUNDARY_ALERT_THRESHOLD}) AS alert,
       count(*) FILTER (WHERE streak >= {BOUNDARY_ALERT_THRESHOLD})::BIGINT AS alert_runs
FROM s GROUP BY event_type ORDER BY event_type
""",
    doc="Boundary ALERT_THRESHOLD: a static trigger must fire k runs IN A "
        "ROW before alerting (boundary/boundary.py:901-965 keeps a TTL'd "
        "times_seen counter per metric; a quiet run expires it). Stateless "
        "restatement: the trailing consecutive-trigger streak via the "
        "last-quiet-row window (gaps-and-islands), alert ⇔ streak ≥ k; "
        "alert_runs counts every historical run whose streak reached k",
)
def boundary_alert_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    trig = F.col("value") > BOUNDARY_ALERT_TRIGGER
    s = e.withColumn(
        "last_quiet", F.max(F.when(~trig, F.col("rn"))).over(wcum)
    ).withColumn(
        "streak",
        F.when(
            trig, F.col("rn") - F.coalesce(F.col("last_quiet"), F.lit(0))
        ).otherwise(F.lit(0)),
    )
    last_streak = F.max(F.when(F.col("rn") == F.col("n"), F.col("streak")))
    return s.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        last_streak.cast("long").alias("last_streak"),
        (last_streak >= BOUNDARY_ALERT_THRESHOLD).alias("alert"),
        F.count(F.when(F.col("streak") >= BOUNDARY_ALERT_THRESHOLD, 1))
        .cast("long")
        .alias("alert_runs"),
    )


# ---------------------------------------------------------------------------
# crucible replay  (crucible/crucible_algorithms.py:441-516)
# ---------------------------------------------------------------------------

@query(
    "replay_stddev_from_average",
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
)
SELECT event_type, count(*)::BIGINT AS n_anomalies
FROM p
WHERE rn > 10 AND abs(ptail - pmean) > 3 * pstd
GROUP BY event_type ORDER BY event_type
""",
    doc="Crucible per-point sliding replay of stddev_from_average: every "
        "prefix re-evaluated via expanding window frames "
        "(crucible_algorithms.py:441-516) — no driver loop, one window pass",
)
def replay_stddev_from_average(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.avg("value").over(wexp).alias("pmean"),
        F.stddev_samp("value").over(wexp).alias("pstd"),
        F.avg("value").over(wtail).alias("ptail"),
    )
    return (
        p.where((F.col("rn") > 10) & (F.abs(F.col("ptail") - F.col("pmean")) > 3 * F.col("pstd")))
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_anomalies"))
    )


# ---------------------------------------------------------------------------
# luminosity cross-correlation  (luminosity/process_correlations.py:345-467)
# ---------------------------------------------------------------------------

CORRELATION_THRESHOLD = 0.9

@query(
    "luminosity_correlation",
    f"""
WITH m AS (
  SELECT event_type,
         (floor(epoch_ms(ts) / 1000.0 / 3600) * 3600)::BIGINT AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS metric_a, b.event_type AS metric_b,
       round(corr(a.v, b.v), 6) AS coefficient,
       (corr(a.v, b.v) >= {CORRELATION_THRESHOLD}) AS correlated
FROM m a JOIN m b ON a.bucket = b.bucket AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type ORDER BY metric_a, metric_b
""",
    doc="Luminosity-style cross-correlation sweep over hour-bucketed series "
        "pairs; correlated iff coefficient ≥ 0.9 "
        "(process_correlations.py:345-467, settings.py:2096)",
)
def luminosity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type",
        (F.floor(_ms("ts") / 1000.0 / 3600) * 3600).cast("long").alias("bucket"),
    ).agg(F.avg("value").alias("v"))
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("metric_a"),
            F.col("b.event_type").alias("metric_b"),
        )
        .agg(
            F.round(F.corr("a.v", "b.v"), 6).alias("coefficient"),
            (F.corr("a.v", "b.v") >= CORRELATION_THRESHOLD).alias("correlated"),
        )
    )


# ---------------------------------------------------------------------------
# luminosity: lagged (luminol-style) cross-correlation
# (process_correlations.py:433-462)
# ---------------------------------------------------------------------------

SHIFT_MAX_BUCKETS = 2       # luminol Correlator max shift, in buckets
ANOM_WINDOW_BUCKETS = 24    # ±120 s anomaly clip (:434-446), in buckets

@query(
    "luminosity_shift_correlation",
    f"""
WITH m AS (
  SELECT event_type,
         (floor(epoch_ms(ts) / 1000.0 / 3600) * 3600)::BIGINT AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2
), an AS (
  SELECT event_type, arg_max(bucket, v) AS abucket FROM m GROUP BY event_type
), win AS (
  SELECT m.event_type, m.bucket, m.v
  FROM m JOIN an ON m.event_type = an.event_type
  WHERE m.bucket BETWEEN an.abucket - {ANOM_WINDOW_BUCKETS} * 3600
                     AND an.abucket + {ANOM_WINDOW_BUCKETS} * 3600
), lagged AS (
  SELECT a.event_type AS metric_a, b.event_type AS metric_b, s.shift,
         corr(a.v, b.v) AS coef
  FROM win a
  CROSS JOIN (SELECT unnest(range(-{SHIFT_MAX_BUCKETS}, {SHIFT_MAX_BUCKETS + 1})) AS shift) s
  JOIN m b ON b.event_type <> a.event_type
          AND b.bucket = a.bucket + s.shift * 3600
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT metric_a, metric_b, shift, coef,
         -- deterministic best: ROUNDED |coef| DESC, then smallest shift —
         -- ties are real on short overlaps (|corr| = 1.0) and the raw
         -- doubles differ in the last ulp between engines
         row_number() OVER (PARTITION BY metric_a, metric_b
                            ORDER BY round(abs(coef), 6) DESC, shift ASC) AS rn,
         max(CASE WHEN shift = 0 THEN coef END)
           OVER (PARTITION BY metric_a, metric_b) AS coef0
  FROM lagged WHERE coef IS NOT NULL
)
SELECT metric_a, metric_b,
       round(coef0, 6) AS coefficient,
       shift::BIGINT AS shift,
       round(coef, 6) AS shifted_coefficient,
       (abs(coef) >= {CORRELATION_THRESHOLD}) AS correlated
FROM ranked
WHERE rn = 1
  AND coef0 IS NOT NULL  -- sparse series: no defined zero-shift overlap → skip pair
ORDER BY metric_a, metric_b
""",
    doc="Luminosity lagged cross-correlation: the luminol Correlator output "
        "shape [metric, coefficient, shift, shifted_coefficient] "
        "(process_correlations.py:459-462) — the candidate series is clipped "
        "to a window around the anomalous metric's peak (the ±120 s clip at "
        ":434-446, rescaled to buckets), Pearson is evaluated at every shift "
        "in ±SHIFT_MAX, and the best |coefficient| wins (correlated iff it "
        "clears LUMINOL_CROSS_CORRELATION_THRESHOLD, settings.py:2096)",
)
def luminosity_shift_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type",
        (F.floor(_ms("ts") / 1000.0 / 3600) * 3600).cast("long").alias("bucket"),
    ).agg(F.avg("value").alias("v"))
    # per-metric anomaly bucket = the peak bucket (stand-in for the Panorama
    # anomaly timestamp); tiny → broadcast
    an = m.groupBy("event_type").agg(F.max_by("bucket", "v").alias("abucket"))
    win = (
        m.join(F.broadcast(an), "event_type")
        .where(
            F.col("bucket").between(
                F.col("abucket") - ANOM_WINDOW_BUCKETS * 3600,
                F.col("abucket") + ANOM_WINDOW_BUCKETS * 3600,
            )
        )
        .select("event_type", "bucket", "v")
    )
    shifted = win.withColumn(
        "shift", F.explode(F.sequence(F.lit(-SHIFT_MAX_BUCKETS), F.lit(SHIFT_MAX_BUCKETS)))
    )
    b = m.select(
        F.col("event_type").alias("b_event_type"),
        F.col("bucket").alias("b_bucket"),
        F.col("v").alias("b_v"),
    )
    lagged = (
        shifted.join(
            b,
            (F.col("b_event_type") != F.col("event_type"))
            & (F.col("b_bucket") == F.col("bucket") + F.col("shift") * 3600),
        )
        .groupBy(
            F.col("event_type").alias("metric_a"),
            F.col("b_event_type").alias("metric_b"),
            "shift",
        )
        .agg(F.corr("v", "b_v").alias("coef"))
        .where(F.col("coef").isNotNull())
    )
    wpair = Window.partitionBy("metric_a", "metric_b")
    ranked = (
        lagged.withColumn(
            "rn",
            F.row_number().over(
                wpair.orderBy(F.round(F.abs("coef"), 6).desc(), F.col("shift").asc())
            ),
        )
        .withColumn(
            "coef0", F.max(F.when(F.col("shift") == 0, F.col("coef"))).over(wpair)
        )
        .where((F.col("rn") == 1) & F.col("coef0").isNotNull())
    )
    return ranked.select(
        "metric_a",
        "metric_b",
        F.round("coef0", 6).alias("coefficient"),
        F.col("shift").cast("long").alias("shift"),
        F.round("coef", 6).alias("shifted_coefficient"),
        (F.abs("coef") >= CORRELATION_THRESHOLD).alias("correlated"),
    )


# ---------------------------------------------------------------------------
# luminosity: the driver's correlation store + related-metrics grouping
# (luminosity/luminosity.py:311-400)
# ---------------------------------------------------------------------------


def _luminosity_store_oracle() -> str:
    """Lazy: wraps the shift-correlation oracle registered above."""
    from .registry import QUERIES as _Q

    base = _Q["luminosity_shift_correlation"].oracle.replace(
        "ORDER BY metric_a, metric_b", ""
    )
    return f"""
WITH base AS ({base}), store AS (
  SELECT metric_a AS metric, metric_b AS related_metric,
         round(coefficient, 5) AS coefficient,
         abs(shift)::BIGINT AS shifted,
         round(shifted_coefficient, 5) AS shifted_coefficient,
         correlated
  FROM base
  WHERE abs(shift) < 2 AND coefficient IS NOT NULL AND coefficient <> 0
)
SELECT *,
       row_number() OVER (PARTITION BY metric
                          ORDER BY abs(shifted_coefficient) DESC,
                                   related_metric) AS rank
FROM store ORDER BY metric, rank
"""


@query(
    "luminosity_related_metrics",
    _luminosity_store_oracle,
    doc="the Luminosity driver's persisted correlation store + related-"
        "metrics grouping (luminosity/luminosity.py:311-400): every "
        "computed correlation row with a present coefficient and "
        "|shift| < 2 is INSERTed keyed by the anomaly's metric "
        "(shifted-too-far rows are dropped and counted, :340-344; "
        "coefficients rounded to 5 dp exactly as the INSERT does, "
        ":374-376) — the 0.9 threshold gates the correlated REPORT, not "
        "the store. Per metric the stored rows rank by |shifted_"
        "coefficient| — the related-metrics group an operator pivots to "
        "when triaging an alert",
)
def luminosity_related_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = luminosity_shift_correlation(spark, sf_dir)
    store = (
        base.where(
            (F.abs(F.col("shift")) < 2)
            & F.col("coefficient").isNotNull()
            & (F.col("coefficient") != 0)
        )
        .select(
            F.col("metric_a").alias("metric"),
            F.col("metric_b").alias("related_metric"),
            F.round("coefficient", 5).alias("coefficient"),
            F.abs("shift").cast("long").alias("shifted"),
            F.round("shifted_coefficient", 5).alias("shifted_coefficient"),
            "correlated",
        )
    )
    w = Window.partitionBy("metric").orderBy(
        F.abs(F.col("shifted_coefficient")).desc(), F.col("related_metric")
    )
    return store.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).orderBy("metric", "rank")


# ---------------------------------------------------------------------------
# alert dedup  (analyzer.py:1871,2057-2064 — EXPIRATION_TIME TTL keys)
# ---------------------------------------------------------------------------

ALERT_EXPIRATION_SECONDS = 3600

@query(
    "alert_dedup",
    _E_CTE
    + f"""
, p AS (
  SELECT event_type, rn, ts,
         avg(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pmean,
         stddev_samp(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pstd,
         avg(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ptail
  FROM e
), anom AS (
  SELECT event_type, rn, ts,
         lag(ts) OVER (PARTITION BY event_type ORDER BY rn) AS prev_ts
  FROM p WHERE rn > 10 AND abs(ptail - pmean) > 3 * pstd
)
SELECT event_type,
       count(*)::BIGINT AS n_anomalies,
       count(*) FILTER (WHERE prev_ts IS NULL
                        OR epoch_ms(ts) - epoch_ms(prev_ts) > {ALERT_EXPIRATION_SECONDS} * 1000)::BIGINT AS n_alerts
FROM anom GROUP BY event_type ORDER BY event_type
""",
    doc="alert expiration dedup: suppress re-alerts within EXPIRATION_TIME of "
        "the previous anomaly (analyzer.py:1871,2057-2064), as an anti-join/"
        "lag instead of Redis TTL keys",
)
def alert_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    anom = p.where(
        (F.col("rn") > 10) & (F.abs(F.col("ptail") - F.col("pmean")) > 3 * F.col("pstd"))
    ).select(
        "event_type",
        "rn",
        "ts",
        F.lag("ts").over(Window.partitionBy("event_type").orderBy("rn")).alias("prev_ts"),
    )
    fresh = F.col("prev_ts").isNull() | (
        (_ms("ts") - _ms("prev_ts")) > ALERT_EXPIRATION_SECONDS * 1000
    )
    return anom.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_anomalies"),
        F.count(F.when(fresh, 1)).cast("long").alias("n_alerts"),
    )


# ---------------------------------------------------------------------------
# ionosphere layers rules  (ionosphere/layers.py:130-530)
# ---------------------------------------------------------------------------

# one "layers" definition, constants playing the rows of layers_algorithms
# (ionosphere/layers.py:163-186):
LAYER_D_BOUNDARY = 450.0   # D:  breach if last value > boundary → anomaly stands
LAYER_D1_LIMIT = 0.05      # D1: breach if ANY of last k values < limit
LAYER_D1_TIMES = 3
LAYER_E_LIMIT = 5.0        # E:  matched if ANY of last k values < limit
LAYER_E_TIMES = 3
LAYER_ES_DOW = (1, 2, 3, 4, 5)  # Es: layer applies Mon–Fri (ISO dow)
LAYER_F1_FROM_HOUR = 6          # F1: layer applies from 06:00…
LAYER_F2_UNTIL_HOUR = 22        # F2: …until 22:00

@query(
    "ionosphere_layers",
    _E_CTE
    + f"""
, p AS (
  SELECT event_type, rn, value, ts,
         avg(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pmean,
         stddev_samp(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pstd,
         avg(value) OVER (PARTITION BY event_type ORDER BY rn
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ptail,
         max(CASE WHEN value < {LAYER_D1_LIMIT} THEN 1 ELSE 0 END)
             OVER (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN {LAYER_D1_TIMES - 1} PRECEDING AND CURRENT ROW) AS d1_any,
         max(CASE WHEN value < {LAYER_E_LIMIT} THEN 1 ELSE 0 END)
             OVER (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN {LAYER_E_TIMES - 1} PRECEDING AND CURRENT ROW) AS e_any
  FROM e
), anom AS (
  SELECT event_type, rn, value,
         (isodow(ts) BETWEEN {LAYER_ES_DOW[0]} AND {LAYER_ES_DOW[-1]}
          AND hour(ts) >= {LAYER_F1_FROM_HOUR}
          AND hour(ts) < {LAYER_F2_UNTIL_HOUR}) AS in_window,
         (value > {LAYER_D_BOUNDARY}) AS d_breach,
         (d1_any = 1) AS d1_breach,
         (e_any = 1) AS e_matched
  FROM p WHERE rn > 10 AND abs(ptail - pmean) > 3 * pstd
)
SELECT event_type,
       count(*)::BIGINT AS n_anomalies,
       count(*) FILTER (WHERE in_window)::BIGINT AS n_in_window,
       count(*) FILTER (WHERE d_breach)::BIGINT AS n_d_breach,
       count(*) FILTER (WHERE d1_breach)::BIGINT AS n_d1_breach,
       count(*) FILTER (WHERE in_window AND NOT d_breach AND NOT d1_breach
                        AND e_matched)::BIGINT AS n_suppressed,
       count(*) FILTER (WHERE NOT (in_window AND NOT d_breach AND NOT d1_breach
                        AND e_matched))::BIGINT AS n_alerts
FROM anom GROUP BY event_type ORDER BY event_type
""",
    doc="Ionosphere layers rule DSL over anomaly candidates "
        "(ionosphere/layers.py:409-530): a layer MATCH suppresses the anomaly "
        "as not-anomalous. D breach (last value > boundary, :412-438) and D1 "
        "breach (any of last k values past limit, :441-472) veto the match; "
        "the E rule matches when any of the last k values is inside the limit "
        "(:475-512 — matched on first hit, reference loop breaks). Es/F1/F2 "
        "(:177-186) restrict when the layer applies (day-of-week / from-time "
        "/ until-time); the reference parses but does not evaluate them "
        "(:520-526 'not implemented yet') — here the declared window "
        "semantics are implemented: outside the window the layer cannot "
        "match, so the anomaly stands",
)
def ionosphere_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _series(spark, sf_dir)
    wexp = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtail = Window.partitionBy("event_type").orderBy("rn").rowsBetween(-2, 0)
    wd1 = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(-(LAYER_D1_TIMES - 1), 0)
    )
    we = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(-(LAYER_E_TIMES - 1), 0)
    )
    p = e.select(
        "event_type",
        "rn",
        "value",
        "ts",
        F.avg("value").over(wexp).alias("pmean"),
        F.stddev_samp("value").over(wexp).alias("pstd"),
        F.avg("value").over(wtail).alias("ptail"),
        F.max((F.col("value") < LAYER_D1_LIMIT).cast("int")).over(wd1).alias("d1_any"),
        F.max((F.col("value") < LAYER_E_LIMIT).cast("int")).over(we).alias("e_any"),
    )
    # ISO day-of-week 1=Mon..7=Sun in both engines: duckdb isodow ≡ weekday+1
    isodow = F.weekday("ts") + 1
    anom = p.where(
        (F.col("rn") > 10) & (F.abs(F.col("ptail") - F.col("pmean")) > 3 * F.col("pstd"))
    ).select(
        "event_type",
        (
            isodow.between(LAYER_ES_DOW[0], LAYER_ES_DOW[-1])
            & (F.hour("ts") >= LAYER_F1_FROM_HOUR)
            & (F.hour("ts") < LAYER_F2_UNTIL_HOUR)
        ).alias("in_window"),
        (F.col("value") > LAYER_D_BOUNDARY).alias("d_breach"),
        (F.col("d1_any") == 1).alias("d1_breach"),
        (F.col("e_any") == 1).alias("e_matched"),
    )
    suppressed = (
        F.col("in_window")
        & ~F.col("d_breach")
        & ~F.col("d1_breach")
        & F.col("e_matched")
    )
    return anom.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_anomalies"),
        F.count(F.when(F.col("in_window"), 1)).cast("long").alias("n_in_window"),
        F.count(F.when(F.col("d_breach"), 1)).cast("long").alias("n_d_breach"),
        F.count(F.when(F.col("d1_breach"), 1)).cast("long").alias("n_d1_breach"),
        F.count(F.when(suppressed, 1)).cast("long").alias("n_suppressed"),
        F.count(F.when(~suppressed, 1)).cast("long").alias("n_alerts"),
    )


# ---------------------------------------------------------------------------
# ionosphere profile match  (ionosphere/ionosphere.py:1864-1998)
# ---------------------------------------------------------------------------

PROFILE_PERCENT_SIMILAR = 1.0   # settings.py:1750
PROFILE_SPLIT = 0.7             # first 70% of the span = the approved profile
MINMAX_RANGE_TOLERANCE = 0.15   # settings.py:1781 IONOSPHERE_MINMAX_SCALING_RANGE_TOLERANCE

# the profile/calc split timestamp (epoch ms): one definition shared by both
# ionosphere queries and both engines, so the two can never disagree on
# where the approved profile ends
PROFILE_CUT_EXPR_SQL = (
    f"min(epoch_ms(ts)) + {PROFILE_SPLIT}"
    " * (max(epoch_ms(ts)) - min(epoch_ms(ts)))"
)


def profile_cut(ev: DataFrame) -> DataFrame:
    """1-row frame with the profile/calc cut timestamp (epoch ms); rows at
    ``_ms(ts) < cut`` form the approved profile (Spark twin of
    ``PROFILE_CUT_EXPR_SQL``)."""
    return ev.agg(
        (
            F.min(_ms("ts"))
            + F.lit(PROFILE_SPLIT) * (F.max(_ms("ts")) - F.min(_ms("ts")))
        ).alias("cut")
    )

# the deterministic tsfresh stand-in summed on both raw and min-max-scaled
# values (count/sum/mean/std/min/max/abs-energy)
_FSUM_TERMS = (
    "count(*) * 1e0 + sum({v}) + avg({v}) + stddev_samp({v})"
    " + min({v}) + max({v}) + sum({v} * {v})"
)

@query(
    "ionosphere_profile_match",
    f"""
WITH span AS (
  SELECT {PROFILE_CUT_EXPR_SQL} AS cut
  FROM events
), f AS (
  SELECT event_type,
         (epoch_ms(ts) < (SELECT cut FROM span)) AS is_profile,
         {_FSUM_TERMS.format(v="value")} AS features_sum,
         min(value) AS mn, max(value) AS mx
  FROM events GROUP BY 1, 2
), scaled AS (
  -- min-max scale each side to [0,1] with ITS OWN range (the reference
  -- scales the fp series and the anomalous series independently,
  -- ionosphere.py:2269-2334) and recompute the same feature sum
  SELECT e.event_type, f.is_profile,
         {_FSUM_TERMS.format(v="sv")} AS features_sum_scaled
  FROM (SELECT event_type, value,
               (epoch_ms(ts) < (SELECT cut FROM span)) AS is_profile
        FROM events) e
  JOIN f ON f.event_type = e.event_type AND f.is_profile = e.is_profile
  CROSS JOIN LATERAL (SELECT CASE WHEN f.mx = f.mn THEN 0e0
                      ELSE (e.value - f.mn) / (f.mx - f.mn) END AS sv) s
  GROUP BY e.event_type, f.is_profile
), ph AS (
  SELECT f.event_type, f.features_sum AS fp_sum, f.mn AS p_mn, f.mx AS p_mx,
         s.features_sum_scaled AS fp_sum_scaled
  FROM f JOIN scaled s ON s.event_type = f.event_type AND s.is_profile
  WHERE f.is_profile
), ch AS (
  SELECT f.event_type, f.features_sum AS calc_sum, f.mn AS c_mn, f.mx AS c_mx,
         s.features_sum_scaled AS calc_sum_scaled
  FROM f JOIN scaled s ON s.event_type = f.event_type AND NOT s.is_profile
  WHERE NOT f.is_profile
), j AS (
  -- FULL join: a series living entirely on one side of the cut surfaces as
  -- an unmatchable row instead of silently vanishing from the report
  SELECT * FROM ph FULL JOIN ch USING (event_type)
)
, k AS (
  -- each predicate computed ONCE (the Spark builder mirrors this shape);
  -- nullif keeps a zero/NULL profile sum off the ANSI /0 path, and the
  -- boolean verdicts coalesce NULL -> FALSE (with an exact 0-vs-0 match)
  SELECT j.*,
         abs((calc_sum - fp_sum) / nullif(fp_sum, 0) * 100) AS pct,
         ((p_mn = c_mn OR abs(c_mn - p_mn) <= {MINMAX_RANGE_TOLERANCE} * abs(p_mn))
          AND (p_mx = c_mx OR abs(c_mx - p_mx) <= {MINMAX_RANGE_TOLERANCE} * abs(p_mx)))
           AS eligible,
         abs((calc_sum_scaled - fp_sum_scaled)
             / nullif(fp_sum_scaled, 0) * 100) AS pct_s
  FROM j
), k2 AS (
  SELECT k.*,
         coalesce(pct <= {PROFILE_PERCENT_SIMILAR},
                  fp_sum = 0 AND calc_sum = 0, FALSE) AS m_raw,
         coalesce(eligible, FALSE) AS elig,
         coalesce(pct_s <= {PROFILE_PERCENT_SIMILAR}, FALSE) AS m_s
  FROM k
)
SELECT event_type,
       round(fp_sum, 6) AS fp_sum,
       round(calc_sum, 6) AS calc_sum,
       round(pct, 6) AS percent_different,
       m_raw AS matched,
       elig AS minmax_eligible,
       round(pct_s, 6) AS minmax_percent_different,
       (NOT m_raw AND elig AND m_s) AS matched_minmax,
       (m_raw OR (NOT m_raw AND elig AND m_s)) AS not_anomalous
FROM k2 ORDER BY event_type
""",
    doc="Ionosphere features-profile match with the min-max second chance "
        "(ionosphere.py:1864-1998 + 2027-2455, settings.py:1750,1767,1781): "
        "a window whose feature sums sit within "
        "IONOSPHERE_FEATURES_PERCENT_SIMILAR of an approved profile's is "
        "not-anomalous; when the raw sums do NOT match and both series "
        "ranges agree within IONOSPHERE_MINMAX_SCALING_RANGE_TOLERANCE "
        "(15%), both are min-max scaled to [0,1] and the sums compared "
        "again. Profile = first 70% of the span; feature set = the "
        "deterministic 7-term tsfresh stand-in (the full 101-calculator "
        "matrix lives in tsfresh_features); the reference's int()-bucketed "
        "range comparison is restated as the documented +/-15% margin",
)
def ionosphere_profile_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    span = profile_cut(ev)

    def fsum(v):
        return (
            F.count("*").cast("double")
            + F.sum(v)
            + F.avg(v)
            + F.stddev_samp(v)
            + F.min(v)
            + F.max(v)
            + F.sum(v * v)
        )

    base = ev.crossJoin(F.broadcast(span)).select(
        "event_type", "value", (_ms("ts") < F.col("cut")).alias("is_profile")
    )
    f = base.groupBy("event_type", "is_profile").agg(
        fsum(F.col("value")).alias("features_sum"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    sv = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    )
    scaled = (
        base.join(F.broadcast(f), ["event_type", "is_profile"])
        .select("event_type", "is_profile", sv.alias("sv"))
        .groupBy("event_type", "is_profile")
        .agg(fsum(F.col("sv")).alias("features_sum_scaled"))
    )
    p = (
        f.where(F.col("is_profile"))
        .join(scaled.where(F.col("is_profile")), ["event_type", "is_profile"])
        .select(
            "event_type",
            F.col("features_sum").alias("fp_sum"),
            F.col("mn").alias("p_mn"),
            F.col("mx").alias("p_mx"),
            F.col("features_sum_scaled").alias("fp_sum_scaled"),
        )
    )
    c = (
        f.where(~F.col("is_profile"))
        .join(scaled.where(~F.col("is_profile")), ["event_type", "is_profile"])
        .select(
            "event_type",
            F.col("features_sum").alias("calc_sum"),
            F.col("mn").alias("c_mn"),
            F.col("mx").alias("c_mx"),
            F.col("features_sum_scaled").alias("calc_sum_scaled"),
        )
    )
    j = p.join(c, "event_type", "full")
    pct = F.abs(
        (F.col("calc_sum") - F.col("fp_sum"))
        / F.nullif(F.col("fp_sum"), F.lit(0.0))
        * 100
    )
    pct_s = F.abs(
        (F.col("calc_sum_scaled") - F.col("fp_sum_scaled"))
        / F.nullif(F.col("fp_sum_scaled"), F.lit(0.0))
        * 100
    )
    tol = MINMAX_RANGE_TOLERANCE
    eligible = F.coalesce(
        (
            (F.col("p_mn") == F.col("c_mn"))
            | (F.abs(F.col("c_mn") - F.col("p_mn")) <= tol * F.abs(F.col("p_mn")))
        )
        & (
            (F.col("p_mx") == F.col("c_mx"))
            | (F.abs(F.col("c_mx") - F.col("p_mx")) <= tol * F.abs(F.col("p_mx")))
        ),
        F.lit(False),
    )
    matched = F.coalesce(
        pct <= PROFILE_PERCENT_SIMILAR,
        (F.col("fp_sum") == 0) & (F.col("calc_sum") == 0),
        F.lit(False),
    )
    matched_minmax = (
        ~matched
        & eligible
        & F.coalesce(pct_s <= PROFILE_PERCENT_SIMILAR, F.lit(False))
    )
    return j.select(
        "event_type",
        F.round("fp_sum", 6).alias("fp_sum"),
        F.round("calc_sum", 6).alias("calc_sum"),
        F.round(pct, 6).alias("percent_different"),
        matched.alias("matched"),
        eligible.alias("minmax_eligible"),
        F.round(pct_s, 6).alias("minmax_percent_different"),
        matched_minmax.alias("matched_minmax"),
        (matched | matched_minmax).alias("not_anomalous"),
    )


# ---------------------------------------------------------------------------
# mirage second pass: aggregate-then-broadcast  (SURVEY §2.5, §3.3)
# ---------------------------------------------------------------------------

@query(
    "mirage_second_pass",
    """
WITH base AS (
  SELECT event_type, avg(value) AS long_mean, stddev_samp(value) AS long_std
  FROM events GROUP BY event_type
), daily AS (
  SELECT event_type, date_trunc('day', ts)::DATE::VARCHAR AS day, avg(value) AS day_avg
  FROM events GROUP BY 1, 2
)
SELECT d.event_type, d.day,
       round(d.day_avg, 6) AS day_avg,
       round(b.long_mean, 6) AS long_mean,
       coalesce(abs(d.day_avg - b.long_mean) > 3 * b.long_std, FALSE) AS anomalous
FROM daily d JOIN base b ON d.event_type = b.event_type
ORDER BY d.event_type, d.day
""",
    doc="Mirage restated: long-window baselines aggregated ONCE, broadcast-"
        "joined back to short-window partitions (two-pass aggregate-then-"
        "broadcast; mirage/mirage.py:541-545, SURVEY §3.3)",
)
def mirage_second_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.avg("value").alias("long_mean"), F.stddev_samp("value").alias("long_std")
    )
    daily = ev.groupBy(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.avg("value").alias("day_avg"))
    return daily.join(F.broadcast(base), "event_type").select(
        "event_type",
        "day",
        F.round("day_avg", 6).alias("day_avg"),
        F.round("long_mean", 6).alias("long_mean"),
        F.coalesce(
            F.abs(F.col("day_avg") - F.col("long_mean")) > 3 * F.col("long_std"),
            F.lit(False),
        ).alias(
            "anomalous"
        ),
    )


# ---------------------------------------------------------------------------
# per-day stats (the partition_stats pattern on events)
# ---------------------------------------------------------------------------

@query(
    "events_daily_stats",
    """
SELECT date_trunc('day', ts)::DATE::VARCHAR AS day, event_type,
       count(*)::BIGINT AS n,
       round(avg(value), 6) AS value_avg,
       round(min(value), 6) AS value_min,
       round(max(value), 6) AS value_max,
       round(quantile_cont(value, 0.5), 6) AS value_p50,
       round(quantile_cont(value, 0.95), 6) AS value_p95,
       count(DISTINCT user_id)::BIGINT AS distinct_users
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="per-(day, event_type) stats row — the partition_stats pattern "
        "(plans/stats.py) with exact quantiles for the oracle",
)
def events_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("value"), 6).alias("value_avg"),
        F.round(F.min("value"), 6).alias("value_min"),
        F.round(F.max("value"), 6).alias("value_max"),
        F.round(F.percentile("value", 0.5), 6).alias("value_p50"),
        F.round(F.percentile("value", 0.95), 6).alias("value_p95"),
        F.count_distinct("user_id").cast("long").alias("distinct_users"),
    )


# ---------------------------------------------------------------------------
# relational consensus ensemble — fully oracled k-of-n over the
# SQL-expressible detectors (analyzer/algorithms.py:595-690 restated)
# ---------------------------------------------------------------------------

RELATIONAL_CONSENSUS = 4  # k of the 6 SQL-expressible detectors (≈ 6-of-9)

@query(
    "drift_ensemble_relational",
    _E_CTE
    + f"""
, med AS (
  SELECT event_type, median(value)::DOUBLE AS med FROM e GROUP BY 1
), dev AS (
  SELECT e.event_type, abs(e.value - med.med) AS d, e.rn, e.n
  FROM e JOIN med USING (event_type)
), mad_det AS (
  SELECT event_type,
         CASE WHEN median(d) = 0 THEN false
              ELSE max(CASE WHEN rn = n THEN d END) / median(d) > 6
         END AS a_mad
  FROM dev GROUP BY 1
), base AS (
  SELECT event_type,
         coalesce(abs({_TAIL_SQL} - avg(value)) > 3 * stddev_samp(value),
                  FALSE) AS a_stddev,
         coalesce(abs({_LAST_SQL} - avg(value) FILTER (WHERE rn < n))
          > 3 * stddev_samp(value) FILTER (WHERE rn < n), FALSE) AS a_msc,
         coalesce(abs({_TAIL_SQL} - avg(value) FILTER (WHERE x < 86400))
          > 3 * stddev_samp(value) FILTER (WHERE x < 86400), FALSE) AS a_fha
  FROM e GROUP BY 1
), fit AS (
  SELECT event_type, covar_pop(x, value) / nullif(var_pop(x), 0) AS m,
         avg(value) - covar_pop(x, value) / nullif(var_pop(x), 0) * avg(x) AS c
  FROM e GROUP BY 1
), r AS (
  SELECT e.event_type, e.rn, e.n, e.value - (fit.m * e.x + fit.c) AS err
  FROM e JOIN fit USING (event_type)
), ls_det AS (
  SELECT event_type,
         coalesce(abs(avg(err) FILTER (WHERE rn > n - 3)) > 3 * stddev_pop(err)
          AND round(stddev_pop(err)) <> 0
          AND round(avg(err) FILTER (WHERE rn > n - 3)) <> 0, FALSE) AS a_ls
  FROM r GROUP BY 1
), hstats AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx, {_TAIL_SQL} AS t
  FROM e GROUP BY 1
), binned AS (
  SELECT e.event_type, {_HIST_BIN} AS bin, {_HIST_TBIN} AS tbin
  FROM e JOIN hstats s USING (event_type)
), hist_det AS (
  SELECT event_type,
         (count(*) FILTER (WHERE bin = tbin) <= 20) AS a_hist
  FROM binned GROUP BY 1
)
SELECT b.event_type, a_stddev, a_msc, a_fha, a_mad, a_ls, a_hist,
       (a_stddev::INT + a_msc::INT + a_fha::INT + a_mad::INT
        + a_ls::INT + a_hist::INT)::BIGINT AS consensus_count,
       ((a_stddev::INT + a_msc::INT + a_fha::INT + a_mad::INT
         + a_ls::INT + a_hist::INT) >= {RELATIONAL_CONSENSUS}) AS anomalous
FROM base b
JOIN mad_det USING (event_type)
JOIN ls_det USING (event_type)
JOIN hist_det USING (event_type)
ORDER BY b.event_type
""",
    doc="k-of-n CONSENSUS (analyzer/algorithms.py:679-687) restated fully "
        "relationally over the 6 SQL-expressible detectors (stddev_from_"
        "average, mean_subtraction_cumulation, first_hour_average, MAD, "
        "least_squares, histogram_bins) so the CONSENSUS ARITHMETIC itself "
        "gets an oracled correctness row — the 9-kernel form with EWM/"
        "Grubbs/KS stays in the pandas-UDF path (drift_ensemble_daily, "
        "rows-only). k=4 of 6 mirrors the reference's 6-of-9 ratio",
)
def drift_ensemble_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the windowed series feeds SIX detector branches — materialize it once
    # (at 10^12 rows this is the same scratch-table barrier as plans/
    # validate's slim projection; without it every branch rescans the source)
    e = _series(spark, sf_dir).localCheckpoint()
    tail = _tail_avg_col()
    last = F.max(F.when(F.col("rn") == F.col("n"), F.col("value")))
    head = F.when(F.col("rn") < F.col("n"), F.col("value"))
    fha_base = F.when(F.col("x") < 86400, F.col("value"))

    base = e.groupBy("event_type").agg(
        F.coalesce(
            F.abs(tail - F.avg("value")) > 3 * F.stddev_samp("value"),
            F.lit(False),
        ).alias("a_stddev"),
        F.coalesce(
            F.abs(last - F.avg(head)) > 3 * F.stddev_samp(head), F.lit(False)
        ).alias("a_msc"),
        F.coalesce(
            F.abs(tail - F.avg(fha_base)) > 3 * F.stddev_samp(fha_base),
            F.lit(False),
        ).alias("a_fha"),
    )

    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "rn", "n", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    last_d = F.max(F.when(F.col("rn") == F.col("n"), F.col("d")))
    mad_det = dev.groupBy("event_type").agg(
        F.when(F.median("d") == 0, F.lit(False))
        .otherwise(last_d / F.median("d") > 6)
        .alias("a_mad")
    )

    varx = F.nullif(F.var_pop("x"), F.lit(0.0))
    fit = e.groupBy("event_type").agg(
        (F.covar_pop("x", "value") / varx).alias("m"),
        (
            F.avg("value") - F.covar_pop("x", "value") / varx * F.avg("x")
        ).alias("c"),
    )
    r = e.join(F.broadcast(fit), "event_type").select(
        "event_type",
        "rn",
        "n",
        (F.col("value") - (F.col("m") * F.col("x") + F.col("c"))).alias("err"),
    )
    tail_err = F.avg(F.when(F.col("rn") > F.col("n") - 3, F.col("err")))
    ls_det = r.groupBy("event_type").agg(
        F.coalesce(
            (F.abs(tail_err) > 3 * F.stddev_pop("err"))
            & (F.round(F.stddev_pop("err"), 0) != 0)
            & (F.round(tail_err, 0) != 0),
            F.lit(False),
        ).alias("a_ls")
    )

    hstats = e.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"), tail.alias("t")
    )
    width = F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
    bin_of = lambda col: F.least(  # noqa: E731
        F.lit(14),
        F.greatest(F.lit(0), F.floor((col - F.col("mn")) * 15.0 / width)),
    ).cast("long")
    binned = e.join(F.broadcast(hstats), "event_type").select(
        "event_type",
        bin_of(F.col("value")).alias("bin"),
        bin_of(F.col("t")).alias("tbin"),
    )
    hist_det = binned.groupBy("event_type").agg(
        (F.count(F.when(F.col("bin") == F.col("tbin"), 1)) <= 20).alias("a_hist")
    )

    dets = (
        base.join(mad_det, "event_type")
        .join(ls_det, "event_type")
        .join(hist_det, "event_type")
    )
    flags = ["a_stddev", "a_msc", "a_fha", "a_mad", "a_ls", "a_hist"]
    count = sum((F.col(f).cast("int") for f in flags), F.lit(0))
    return dets.select(
        "event_type",
        *flags,
        count.cast("long").alias("consensus_count"),
        (count >= RELATIONAL_CONSENSUS).alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# detector: the full sample-fed ks gate (analyzer/algorithms.py:370-401)
# and the ADF tau at the lag-0 collapse — the two ks_test sub-gates the
# flagship twins cannot exercise (their stat series carry no samples)
# ---------------------------------------------------------------------------

def _ks_gate_consts():
    from ..operators.stats_math import kolmogorov_isf

    return kolmogorov_isf(0.05)


_KS_LAMBDA_05 = _ks_gate_consts()

_KS_GATE_SQL = (
    _E_CTE
    + f"""
, g AS (
  SELECT event_type, value,
         CASE WHEN rn <= n / 2 THEN 1 ELSE 0 END AS g1,
         CASE WHEN rn <= n / 2 THEN 0 ELSE 1 END AS g2
  FROM e
), c AS (
  SELECT event_type, value,
         sum(g1) OVER (PARTITION BY event_type ORDER BY value
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         sum(g2) OVER (PARTITION BY event_type ORDER BY value
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
         sum(g1) OVER (PARTITION BY event_type) AS n1,
         sum(g2) OVER (PARTITION BY event_type) AS n2
  FROM g
), d AS (
  SELECT event_type,
         max(abs(c1::DOUBLE / nullif(n1, 0) - c2::DOUBLE / nullif(n2, 0))) AS ks_d,
         max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2
  FROM c GROUP BY event_type
)
SELECT event_type, n1, n2,
       floor(ks_d * 1000000 + 0.5) / 1000000 AS ks_d,
       floor(sqrt(n1::DOUBLE * n2 / (n1 + n2)) * ks_d * 1000000 + 0.5)
         / 1000000 AS scaled_d,
       coalesce(sqrt(n1::DOUBLE * n2 / (n1 + n2)) * ks_d > {_KS_LAMBDA_05!r},
                FALSE) AS p_lt_05,
       coalesce(ks_d > 0.5, FALSE) AS d_exceeds,
       coalesce(sqrt(n1::DOUBLE * n2 / (n1 + n2)) * ks_d > {_KS_LAMBDA_05!r}
                AND ks_d > 0.5, FALSE) AS gate
FROM d ORDER BY event_type
"""
)


@query(
    "detector_ks_gate",
    _KS_GATE_SQL,
    doc="the SAMPLE-FED ks_test gate arithmetic the 9-of-9 flagship twins "
        "cannot exercise: the REAL stats_math.ks_2samp kernel (exact D + "
        "asymptotic Smirnov p) runs per event_type on the first-half vs "
        "second-half windows, and the oracle restates p < .05 as the "
        "closed-form critical line sqrt(n*m/(n+m))*D > kolmogorov_isf(.05) "
        "(the constant the round-3 verdict asked for) plus the D > .5 "
        "branch (analyzer/algorithms.py:387-389); boundary equivalence is "
        "exact to the bisection tolerance (1e-13)",
)
def detector_ks_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    lam = _KS_LAMBDA_05

    def _gate(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        from ..operators.stats_math import ks_2samp

        pdf = pdf.sort_values("rn")
        n = len(pdf)
        half = n // 2
        a = pdf["value"].to_numpy(dtype=np.float64)[:half]
        b = pdf["value"].to_numpy(dtype=np.float64)[half:]
        if a.size == 0 or b.size == 0:
            # single-point series: the first half is empty and ks_2samp
            # returns (NaN, NaN); the oracle's nullif(n1, 0) path emits the
            # same NULL-D / all-FALSE row (pinned by the degenerate battery)
            d_out = scaled_out = None
            p_lt, d_ex = False, False
        else:
            d, p = ks_2samp(a, b)
            scaled = math.sqrt(a.size * b.size / (a.size + b.size)) * d
            d_out = math.floor(d * 1e6 + 0.5) / 1e6
            scaled_out = math.floor(scaled * 1e6 + 0.5) / 1e6
            p_lt, d_ex = bool(p < 0.05), bool(d > 0.5)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iat[0]],
                "n1": [a.size],
                "n2": [b.size],
                "ks_d": [d_out],
                "scaled_d": [scaled_out],
                "p_lt_05": [p_lt],
                "d_exceeds": [d_ex],
                "gate": [bool(p_lt and d_ex)],
            }
        )

    _ = lam  # pinned at module import; the kernel computes p itself
    out_schema = (
        "event_type string, n1 long, n2 long, ks_d double, scaled_d double, "
        "p_lt_05 boolean, d_exceeds boolean, gate boolean"
    )
    return (
        _series(spark, sf_dir)
        .select("event_type", "rn", "value")
        .groupBy("event_type")
        .applyInPandas(_gate, out_schema)
    )


def _adf_consts():
    from ..operators.stats_math import mackinnon_tau_crit

    return mackinnon_tau_crit(0.05)


_ADF_TAU_05 = _adf_consts()
_ADF_N = 6  # series length at which maxlag collapses to 0 (min(10,(n-1)//2-2))

_ADF_SQL = f"""
WITH s AS (
  SELECT event_type, round(value * 100)::BIGINT / 100.0 AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
), six AS (
  SELECT event_type, v, rn FROM s WHERE rn <= {_ADF_N}
), p AS (
  SELECT event_type, v AS ylag,
         lead(v) OVER (PARTITION BY event_type ORDER BY rn) - v AS dx
  FROM six
), reg AS (
  SELECT event_type,
         count(*) AS m,
         covar_pop(ylag, dx) / nullif(var_pop(ylag), 0) AS b,
         avg(dx) - covar_pop(ylag, dx) / nullif(var_pop(ylag), 0) * avg(ylag) AS a,
         var_pop(ylag) AS vx
  FROM p WHERE dx IS NOT NULL GROUP BY event_type
), ssr AS (
  SELECT p.event_type, r.m, r.b, r.vx,
         sum(pow(p.dx - (r.b * p.ylag + r.a), 2)) AS ssr
  FROM p JOIN reg r ON r.event_type = p.event_type
  WHERE p.dx IS NOT NULL
  GROUP BY p.event_type, r.m, r.b, r.vx
), ets AS (
  SELECT DISTINCT event_type FROM six
), tt AS (
  -- degenerate contract (pinned by the degenerate battery): a series
  -- without the full {_ADF_N}-point prefix (m < {_ADF_N - 1}), constant
  -- lags (vx = 0), or an exact OLS fit (ssr = 0 — the kernel's lstsq sees
  -- se -> 0 / tau -> ±inf there) reports tau NULL, stationary NULL; the
  -- |tau| > 1e8 clamp keeps near-exact fits (float-residual ssr ~ 1e-30)
  -- in the same NULL bucket on both engines instead of overflowing floor
  SELECT e.event_type, s.m, s.vx, s.ssr,
         b / nullif(sqrt((ssr / (m - 2)) / (m * vx)), 0) AS rawtau,
         (s.event_type IS NULL OR s.m < {_ADF_N - 1} OR s.vx = 0
          OR s.ssr = 0 OR s.ssr IS NULL) AS degen
  FROM ets e LEFT JOIN ssr s ON s.event_type = e.event_type
)
SELECT event_type,
       CASE WHEN degen OR abs(rawtau) > 1e8 THEN NULL
            ELSE floor(rawtau * 1000000 + 0.5) / 1000000 END AS tau,
       0::BIGINT AS usedlag,
       CASE WHEN degen OR abs(rawtau) > 1e8 THEN NULL
            ELSE rawtau < {_ADF_TAU_05!r} END AS stationary
FROM tt ORDER BY event_type
"""


@query(
    "detector_adf_tau",
    _ADF_SQL,
    doc="the ADF stationarity gate of ks_test oracled where it is exactly "
        "closed-form: on 6-point (cents-quantized) series the kernel's "
        "maxlag collapses to 0 (min(10,(n-1)//2-2)), so adfuller's OLS is "
        "the 2-regressor [y_lag, 1] fit — tau = b/se restated via "
        "covar_pop/var_pop and ssr, and p < .05 as the constant line "
        "tau < mackinnon_tau_crit(.05) (our MacKinnon response surface has "
        "no sample-size term); degenerate series (short prefix, constant "
        "lags, exact fits where se->0) report tau/stationary NULL under an "
        "engine-identical contract pinned by the degenerate battery; the "
        "AIC lag-selection path for longer series stays pinned by "
        "tests/test_stats_math.py goldens (reference "
        "analyzer/algorithms.py:390)",
)
def detector_adf_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    tau05 = _ADF_TAU_05

    def _adf(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        from ..operators.stats_math import adfuller

        pdf = pdf.sort_values("rn").head(_ADF_N)
        vals = pdf["v"].to_numpy(dtype=np.float64)
        # degenerate contract mirroring the oracle: short prefix, or a
        # (near-)exact fit where adfuller's se -> 0 pushes tau to ±inf /
        # past the 1e8 clamp -> tau NULL, stationary NULL (constant or
        # perfectly-linear 6-point prefixes are exactly this shape; an
        # unguarded floor() raises on inf/NaN and aborts the whole query)
        if vals.size < _ADF_N:
            tau_out, lag, stat = None, 0, None
        else:
            tau, p, lag = adfuller(vals, 10)
            if not math.isfinite(tau) or abs(tau) > 1e8:
                tau_out, stat = None, None
            else:
                tau_out = math.floor(tau * 1e6 + 0.5) / 1e6
                stat = bool(p < 0.05)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iat[0]],
                "tau": [tau_out],
                "usedlag": [lag],
                "stationary": pd.array([stat], dtype="boolean"),
            }
        )

    _ = tau05  # literal lives in the oracle; the kernel computes p itself
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        (F.round(F.col("value") * 100, 0).cast("long") / 100.0).alias("v"),
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= _ADF_N)
    return s.groupBy("event_type").applyInPandas(
        _adf, "event_type string, tau double, usedlag long, stationary boolean"
    )

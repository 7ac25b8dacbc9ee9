"""Distribution-drift verdicts over per-partition stat series.

This is the Spark restatement of Skyline's analysis sweep (SURVEY §3.2):

    stats table (small)  →  groupBy(lang, stat).applyInPandas(ensemble)  →
    one verdict row per (target partition, lang, stat)

The *expensive* work (scanning the 10^12-row page table) happened in
``plans.stats``; this stage only touches the tiny stats table (partitions ×
langs × stats rows), so the pandas UDF is cheap by construction — the same
shape as Skyline analyzing 250k small Redis series, not the raw datapoints.

Semantics per (lang, stat) series:
- each partition step is mapped to ``partition_seconds`` of pseudo-time, so
  the reference kernels run unchanged with rescaled DetectorParams;
- the "latest datapoint" for a target partition is that partition's stat
  value; history = the prior ``lookback_partitions`` values (Skyline's
  FULL_DURATION window, `settings.py:89`);
- the ks_test slot runs on raw value *samples* (reference = prior
  partitions' samples, probe = the target's — SURVEY §2.1 #9) via the same
  kernel with window parameters selecting [prior | current];
- gates: TOO_SHORT when history < min_history; BORING when the skyline
  boredom rule fires on the stat series OR the target partition's sample is
  constant (constant column → skip drift, SURVEY §2.2); consensus is the
  reference's k-of-n with None counting toward k.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..config import (
    STATUS_BORING,
    STATUS_FAIL,
    STATUS_OK,
    STATUS_TOO_SHORT,
    ValidationConfig,
)
from ..operators.detectors import ALGORITHMS, DetectorParams, ks_test
from ..operators.ensemble import consensus_anomalous
from .stats import DRIFT_STATS, PARTITION_COLS, SAMPLE_STAT

__all__ = ["drift_verdicts", "DRIFT_SCHEMA", "SAMPLE_BACKED_STATS"]

# stats whose ks_test slot is fed by the raw text_len sample
SAMPLE_BACKED_STATS = {"text_len_avg", "text_len_p50", "text_len_p95"}

DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("partition_date", T.DateType()),
        T.StructField("lang", T.StringType()),
        T.StructField("stat", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("anomalous", T.BooleanType()),
        T.StructField("ensemble", T.ArrayType(T.BooleanType(), containsNull=True)),
        T.StructField("triggered", T.ArrayType(T.StringType())),
        T.StructField("datapoint", T.DoubleType()),
    ]
)

_SCALAR_DETECTORS = [name for name in ALGORITHMS if name != "ks_test"]


def _series_verdicts(
    dates: np.ndarray,
    ts_all: np.ndarray,
    values_all: np.ndarray,
    samples_all,
    target_idx: np.ndarray,
    lang: str,
    stat: str,
    cfg: ValidationConfig,
    sample_backed: set,
    out: dict,
    algorithms: dict | None = None,
) -> None:
    """Ensemble for each target index of ONE series, appending to column
    lists. Pure numpy/python — no pandas objects per series, so the wrapper
    overhead stays amortized across a whole bucket of series."""
    P = cfg.partition_seconds
    ens_cfg = cfg.ensemble
    algos = ALGORITHMS if algorithms is None else algorithms
    n_detectors = len(algos)
    max_false = n_detectors - ens_cfg.consensus + 1
    has_samples = samples_all is not None and stat in sample_backed

    for i in target_idx:
        lo = max(0, i + 1 - cfg.lookback_partitions)
        ts = ts_all[lo : i + 1]
        values = values_all[lo : i + 1]
        now = float(ts_all[i])

        out["partition_date"].append(dates[i])
        out["lang"].append(lang)
        out["stat"].append(stat)
        out["datapoint"].append(float(values_all[i]))

        # --- gates (surfaced as statuses, SURVEY §2.2) -------------------
        sample_i = samples_all[i] if has_samples else None
        boring_sample = (
            sample_i is not None
            and len(sample_i) >= 2
            and len(set(np.asarray(sample_i).tolist())) == ens_cfg.boredom_set_size
        )
        tail = values[-ens_cfg.max_tolerable_boredom :]
        boring_series = (
            len(values) >= ens_cfg.max_tolerable_boredom
            and len(set(tail.tolist())) == ens_cfg.boredom_set_size
        )
        if len(values) < cfg.min_history:
            out["status"].append(STATUS_TOO_SHORT)
            out["anomalous"].append(False)
            out["ensemble"].append([])
            out["triggered"].append([])
            continue
        if boring_sample or boring_series:
            out["status"].append(STATUS_BORING)
            out["anomalous"].append(False)
            out["ensemble"].append([])
            out["triggered"].append([])
            continue

        # --- ordered ensemble with optimized early-exit ------------------
        # windows scale with the EFFECTIVE history (short early series get a
        # proportionally placed first-hour baseline, like Skyline's 1h/24h).
        # full_duration is the ACTUAL ts span, not (eff-1)*P: ts carries
        # real calendar ordinals, so a date gap inside the lookback makes
        # the span exceed the index count and an index-derived duration
        # would shift first_hour_average's baseline cutoff into the middle
        # of the window. Identical on gapless data (span == (eff-1)*P).
        eff = len(values)
        span = int(ts[-1] - ts[0]) if eff > 1 else P
        params = DetectorParams(
            full_duration=max(span, P),
            baseline_head_seconds=max(P, eff // 3 * P),
            # the anomalous window is exactly one partition (see DetectorParams)
            tail_points=1,
        )
        ensemble: list[bool | None] = []
        consensus_possible = True
        for name in algos:
            if not consensus_possible:
                ensemble.append(False)  # padded False (`algorithms.py:637-638`)
                continue
            if name == "ks_test":
                verdict = _ks_on_sample_arrays(
                    ts_all, samples_all if has_samples else None, i, lo, now, cfg
                )
            else:
                verdict = algos[name](ts, values, now, params)
            ensemble.append(verdict)
            if ens_cfg.run_optimized_workflow and ensemble.count(False) >= max_false:
                consensus_possible = False

        anomalous = consensus_anomalous(ensemble, ens_cfg.consensus)
        out["status"].append(STATUS_FAIL if anomalous else STATUS_OK)
        out["anomalous"].append(anomalous)
        out["ensemble"].append(ensemble)
        out["triggered"].append([n for n, v in zip(algos, ensemble) if v is True])


def _empty_out() -> dict:
    return {f.name: [] for f in DRIFT_SCHEMA}


def _ks_on_sample_arrays(ts_all, samples_all, i, lo, now, cfg):
    """ks_test over raw-value samples: prior partitions vs the target.

    Reuses the reference kernel unchanged by assigning every sample point its
    partition's pseudo-timestamp and choosing windows that select
    [prior partitions | target partition].
    """
    if samples_all is None:
        return False  # no sample → insufficient points, reference returns False
    ts_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    for j in range(lo, i + 1):
        s = samples_all[j]
        if s is None or len(s) == 0:
            continue
        arr = np.asarray(s, dtype=np.float64)
        ts_parts.append(np.full(arr.size, ts_all[j]))
        val_parts.append(arr)
    if not ts_parts:
        return False
    P = cfg.partition_seconds
    params = DetectorParams(
        full_duration=cfg.lookback_partitions * P,
        ks_reference_seconds=cfg.lookback_partitions * P,
        ks_probe_seconds=P // 2,
    )
    return ks_test(np.concatenate(ts_parts), np.concatenate(val_parts), now, params)


def drift_verdicts(
    stats_long: DataFrame,
    samples: DataFrame,
    cfg: ValidationConfig | None = None,
    targets_df: DataFrame | None = None,
    drift_stats: list[str] | None = None,
    sample_backed: set[str] | None = None,
    latest_only: bool = False,
    algorithms: dict | None = None,
) -> DataFrame:
    """stats + samples → per-(partition, lang, stat) drift verdict rows.

    ``targets_df``: (partition_date, lang) pairs to validate (e.g. the not-
    yet-checkpointed ones, for resume); None = every partition. Non-target
    rows still flow into the UDF as baseline history — the left join only
    *flags* targets (broadcast: the pair list is tiny by construction).

    ``latest_only``: steady-state sweep shape — validate each series' NEWEST
    partition only, selected *inside* the kernel (the UDF sees the whole
    ordered series, so "latest" is the last index). Skips the target-flag
    broadcast join entirely; with one target per series that broadcast is
    one row per series — a driver-side collect+rebroadcast that is pure
    fixed cost at any cluster size.

    ``drift_stats`` / ``sample_backed``: which stat series run the ensemble
    and which of them feed their ks_test slot from the raw-value sample;
    defaults are the page-table stat names (plans/stats.py).

    ``algorithms``: ordered kernel dict to run instead of the full registry
    (the reference's per-app algorithm-set selection,
    ``crucible_algorithms.py:458-481``) — e.g. the SQL-expressible subset
    for the oracled flagship twins; None = every registered kernel.
    """
    cfg = cfg or ValidationConfig()
    drift_stats = DRIFT_STATS if drift_stats is None else drift_stats
    sample_backed = SAMPLE_BACKED_STATS if sample_backed is None else sample_backed
    # project to exactly the kernel's columns — anything else (fingerprint,
    # carrier columns) would be shuffled AND pushed through the Arrow
    # boundary for every row. Null partition keys are excluded: pages whose
    # warc_ts/lang failed the schema coercion produce null-keyed stat rows,
    # which the constraints layer already reports as violations — inside the
    # kernel a None date has no .toordinal() and np.unique cannot sort None
    # against str, so letting them through would crash the job instead of
    # reporting (the report-not-crash contract in plans/validate.py)
    scalar = (
        stats_long.where(F.col("stat").isin(drift_stats))
        .where(
            F.col(PARTITION_COLS[0]).isNotNull()
            & F.col(PARTITION_COLS[1]).isNotNull()
        )
        .select(*PARTITION_COLS, "stat", "value")
    )
    samp = samples.where(F.col("stat") == SAMPLE_STAT).select(
        *PARTITION_COLS, F.col("sample")
    )
    # samples are one bounded row per (partition, lang) — broadcast so the
    # big stats side never sorts/shuffles for this join.
    # EMPTY array, never NULL, for sample-less rows: a null ArrayType column
    # through the grouped-map Arrow boundary is pathologically slow (measured
    # 41s vs 3s for 6M rows on a no-op UDF — the null path falls out of the
    # vectorized writer); the kernels already treat len==0 as "no sample"
    no_sample = F.array().cast("array<double>")
    enriched = scalar.join(F.broadcast(samp), PARTITION_COLS, "left").withColumn(
        "sample",
        F.when(
            F.col("stat").isin(list(sample_backed)),
            F.coalesce(F.col("sample"), no_sample),
        ).otherwise(no_sample),
    )
    if latest_only:
        pass  # target selection happens in-kernel; no flag column shipped
    elif targets_df is None:
        enriched = enriched.withColumn("is_target", F.lit(True))
    else:
        flags = targets_df.select(*PARTITION_COLS).withColumn("is_target", F.lit(True))
        enriched = enriched.join(F.broadcast(flags), PARTITION_COLS, "left").withColumn(
            "is_target", F.coalesce(F.col("is_target"), F.lit(False))
        )

    # Group MANY (lang, stat) series into each UDF invocation: grouping by
    # the raw pair means one Arrow round-trip per tiny series, and the fixed
    # per-group overhead (batch setup, pandas construction) dominates the
    # kernels themselves. Hash-bucketing the pairs amortizes that overhead
    # over ~|pairs|/kernel_buckets series per call; the sub-series split
    # happens with a cheap in-worker pandas groupby. Bucket count ≈ 4× the
    # shuffle parallelism keeps every core busy without reintroducing the
    # overhead. xxhash spreads pairs evenly, so no bucket skew.
    # snapshot the registry DRIVER-side into the closure: Spark's python
    # workers re-import this module and would otherwise see only built-ins,
    # silently dropping kernels added via register_detector (cloudpickle
    # serializes the dict, including by-value user functions)
    algos = dict(ALGORITHMS if algorithms is None else algorithms)
    func = lambda pdf: _bucket_verdicts(  # noqa: E731
        pdf, cfg, sample_backed, algos, latest_only
    )
    # 16× the shuffle width: measured best on multi-executor topologies (4×
    # leaves visible balls-into-bins imbalance across reduce tasks; beyond
    # 16× is flat) — empty buckets cost nothing, so over-provisioning is safe
    n_buckets = cfg.kernel_buckets or 16 * int(
        stats_long.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    bucketed = enriched.withColumn(
        "_bucket", F.pmod(F.xxhash64("lang", "stat"), F.lit(n_buckets))
    )
    return bucketed.groupBy("_bucket").applyInPandas(func, DRIFT_SCHEMA)


def _bucket_verdicts(
    pdf: pd.DataFrame,
    cfg: ValidationConfig,
    sample_backed: set[str] | None = None,
    algorithms: dict | None = None,
    latest_only: bool = False,
) -> pd.DataFrame:
    """Run _series_verdicts for every (lang, stat) series in the bucket.

    One vectorized prep pass per bucket (sort, ordinal conversion, group
    boundary detection via numpy) — pandas groupby per tiny series costs
    more than the kernels themselves.
    """
    backed = SAMPLE_BACKED_STATS if sample_backed is None else sample_backed
    cols = [f.name for f in DRIFT_SCHEMA]
    if len(pdf) == 0:
        return pd.DataFrame(columns=cols)
    P = cfg.partition_seconds

    langs = pdf["lang"].to_numpy()
    stats = pdf["stat"].to_numpy()
    dates = pdf["partition_date"].to_numpy()
    ords = np.fromiter((d.toordinal() for d in dates), np.int64, len(dates))
    # sort by (lang, stat, date) once; np.unique gives the series boundaries
    lang_codes, lang_inv = np.unique(langs, return_inverse=True)
    stat_codes, stat_inv = np.unique(stats, return_inverse=True)
    key = lang_inv.astype(np.int64) * len(stat_codes) + stat_inv
    order = np.lexsort((ords, key))
    key_s = key[order]
    bounds = np.flatnonzero(np.diff(key_s)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(key_s)]))

    dates_s = dates[order]
    ts_s = ords[order].astype(np.float64) * P
    values_s = pdf["value"].to_numpy(np.float64)[order]
    targets_s = pdf["is_target"].to_numpy()[order] if not latest_only else None
    samples_s = pdf["sample"].to_numpy()[order] if "sample" in pdf else None
    langs_s = langs[order]
    stats_s = stats[order]

    out = _empty_out()
    deriv = cfg.derivative_stats
    for a, b in zip(starts, ends):
        dates_g = dates_s[a:b]
        ts_g = ts_s[a:b]
        values_g = values_s[a:b]
        samples_g = samples_s[a:b] if samples_s is not None else None
        targets_g = targets_s[a:b] if targets_s is not None else None

        if stats_s[a] in deriv and len(values_g) >= 2:
            # nonNegativeDerivative (skyline_functions.py:1044-1100):
            # consecutive diffs; counter resets (negative diffs) are DROPPED
            # — a reset point gets no verdict, exactly like the reference
            # skipping it from analysis
            dv = np.diff(values_g)
            keep = dv >= 0
            values_g = dv[keep]
            dates_g = dates_g[1:][keep]
            ts_g = ts_g[1:][keep]
            if samples_g is not None:
                samples_g = samples_g[1:][keep]
            if targets_g is not None:
                targets_g = targets_g[1:][keep]

        if latest_only:
            if len(values_g) == 0:
                continue
            tgt = np.array([len(values_g) - 1])
        else:
            tgt = np.flatnonzero(targets_g)
        if tgt.size == 0:
            continue
        _series_verdicts(
            dates_g,
            ts_g,
            values_g,
            samples_g,
            tgt,
            langs_s[a],
            stats_s[a],
            cfg,
            backed,
            out,
            algorithms,
        )
    if not out["partition_date"]:
        # empty dict-of-lists defaults every column to float64, which Arrow
        # refuses to cast to date32 — hand back an object-dtyped empty frame
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(out, columns=cols)

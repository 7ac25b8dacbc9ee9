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


def _group_verdicts(pdf: pd.DataFrame, cfg: ValidationConfig) -> pd.DataFrame:
    """Run the ensemble for every target partition of one (lang, stat) group."""
    pdf = pdf.sort_values("partition_date").reset_index(drop=True)
    lang = pdf["lang"].iat[0]
    stat = pdf["stat"].iat[0]
    P = cfg.partition_seconds
    ts_all = pdf["partition_date"].map(lambda d: d.toordinal() * P).to_numpy(np.float64)
    values_all = pdf["value"].to_numpy(np.float64)
    ens_cfg = cfg.ensemble
    n_detectors = len(ALGORITHMS)
    max_false = n_detectors - ens_cfg.consensus + 1

    out: list[dict] = []
    for i in np.flatnonzero(pdf["is_target"].to_numpy()):
        row = {
            "partition_date": pdf["partition_date"].iat[i],
            "lang": lang,
            "stat": stat,
            "datapoint": float(values_all[i]),
        }
        lo = max(0, i + 1 - cfg.lookback_partitions)
        ts = ts_all[lo : i + 1]
        values = values_all[lo : i + 1]
        now = float(ts_all[i])

        # --- gates (surfaced as statuses, SURVEY §2.2) -------------------
        sample_i = pdf["sample"].iat[i] if "sample" in pdf else None
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
            out.append({**row, "status": STATUS_TOO_SHORT, "anomalous": False,
                        "ensemble": [], "triggered": []})
            continue
        if boring_sample or boring_series:
            out.append({**row, "status": STATUS_BORING, "anomalous": False,
                        "ensemble": [], "triggered": []})
            continue

        # --- ordered ensemble with optimized early-exit ------------------
        # windows scale with the EFFECTIVE history (short early series get a
        # proportionally placed first-hour baseline, like Skyline's 1h/24h)
        # series span is (eff-1) steps; baseline head = oldest third
        eff = len(values)
        params = DetectorParams(
            full_duration=(eff - 1) * P,
            baseline_head_seconds=max(P, eff // 3 * P),
            # the anomalous window is exactly one partition (see DetectorParams)
            tail_points=1,
        )
        ensemble: list[bool | None] = []
        consensus_possible = True
        for name in ALGORITHMS:
            if not consensus_possible:
                ensemble.append(False)  # padded False (`algorithms.py:637-638`)
                continue
            if name == "ks_test":
                verdict = _ks_on_samples(pdf, i, lo, now, cfg)
            else:
                verdict = ALGORITHMS[name](ts, values, now, params)
            ensemble.append(verdict)
            if ens_cfg.run_optimized_workflow and ensemble.count(False) >= max_false:
                consensus_possible = False

        anomalous = consensus_anomalous(ensemble, ens_cfg.consensus)
        out.append(
            {
                **row,
                "status": STATUS_FAIL if anomalous else STATUS_OK,
                "anomalous": anomalous,
                "ensemble": ensemble,
                "triggered": [n for n, v in zip(ALGORITHMS, ensemble) if v is True],
            }
        )
    cols = [f.name for f in DRIFT_SCHEMA]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def _ks_on_samples(pdf: pd.DataFrame, i: int, lo: int, now: float, cfg: ValidationConfig):
    """ks_test over raw-value samples: prior partitions vs the target.

    Reuses the reference kernel unchanged by assigning every sample point its
    partition's pseudo-timestamp and choosing windows that select
    [prior partitions | target partition].
    """
    if "sample" not in pdf or pdf["stat"].iat[0] not in SAMPLE_BACKED_STATS:
        return False  # no sample → insufficient points, reference returns False
    P = cfg.partition_seconds
    ts_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    for j in range(lo, i + 1):
        s = pdf["sample"].iat[j]
        if s is None or len(s) == 0:
            continue
        arr = np.asarray(s, dtype=np.float64)
        ts_parts.append(np.full(arr.size, pdf["partition_date"].iat[j].toordinal() * P))
        val_parts.append(arr)
    if not ts_parts:
        return False
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
) -> DataFrame:
    """stats + samples → per-(partition, lang, stat) drift verdict rows.

    ``targets_df``: (partition_date, lang) pairs to validate (e.g. the not-
    yet-checkpointed ones, for resume); None = every partition. Non-target
    rows still flow into the UDF as baseline history — the left join only
    *flags* targets (broadcast: the pair list is tiny by construction).
    """
    cfg = cfg or ValidationConfig()
    scalar = stats_long.where(F.col("stat").isin(DRIFT_STATS))
    samp = samples.where(F.col("stat") == SAMPLE_STAT).select(
        *PARTITION_COLS, F.col("sample")
    )
    enriched = scalar.join(samp, PARTITION_COLS, "left").withColumn(
        "sample",
        F.when(F.col("stat").isin(list(SAMPLE_BACKED_STATS)), F.col("sample")),
    )
    if targets_df is None:
        enriched = enriched.withColumn("is_target", F.lit(True))
    else:
        flags = targets_df.select(*PARTITION_COLS).withColumn("is_target", F.lit(True))
        enriched = enriched.join(F.broadcast(flags), PARTITION_COLS, "left").withColumn(
            "is_target", F.coalesce(F.col("is_target"), F.lit(False))
        )

    func = lambda pdf: _group_verdicts(pdf, cfg)  # noqa: E731
    return enriched.groupBy("lang", "stat").applyInPandas(func, DRIFT_SCHEMA)

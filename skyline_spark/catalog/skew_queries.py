"""Explicit skew handling: salted two-phase aggregation + kernel replay.

The north rule requires partitioning/shuffle/skew handled *explicitly*.
Spark's hash aggregation already does map-side partial aggregation for
algebraic aggs (so plain groupBy is skew-immune there); the patterns that
DO need explicit help are non-algebraic collections and per-key windows.
``salted_group_count`` demonstrates the two-phase salt→merge shape with a
plain-GROUP-BY oracle proving result equivalence; the same shape backs the
bounded sample collection in plans/stats.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions import text as X
from .registry import load, query

N_SALTS = 16


@query(
    "salted_group_count",
    """
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       floor(avg(n_chars) * 1000000 + 0.5) / 1000000 AS avg_chars
FROM documents GROUP BY source ORDER BY source
""",
    doc="salted two-phase aggregation: group by (key, salt) partials, then "
        "merge by key — identical result to the plain GROUP BY oracle, but a "
        "hot key's rows spread over N_SALTS reducers (the explicit-skew "
        "pattern for non-algebraic aggs; algebraic aggs get this free from "
        "map-side partial aggregation)",
)
def salted_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    salted = d.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(N_SALTS)))
    partial = salted.groupBy("source", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum("n_chars").alias("pchars"),
    )
    return (
        partial.groupBy("source")
        .agg(
            F.sum("pn").cast("long").alias("n_docs"),
            F.sum("pchars").cast("long").alias("total_chars"),
            # r6, not native round(): the engines resolve exact half-way
            # 6th decimals differently (see functions/text.py::r6)
            X.r6(F.sum("pchars") / F.sum("pn")).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# crucible: full-ensemble sliding replay (rows-only; kernels not SQL-able)
# ---------------------------------------------------------------------------

_REPLAY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("index", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("consensus_count", T.IntegerType()),
        # comma-joined (reference emits a list into anomalies.csv,
        # crucible_algorithms.py:540-607) — serialized so row-level tooling
        # can sort/hash the rows
        T.StructField("triggered_algorithms", T.StringType()),
        # self-describing truncation: true when the series exceeded
        # REPLAY_MAX_POINTS and `index` is therefore relative to the kept
        # tail window rather than the full series
        T.StructField("truncated", T.BooleanType()),
        # absolute position of the kept window's first point in the full
        # series (0 when not truncated) — index + window_start is the
        # full-series index
        T.StructField("window_start", T.LongType()),
    ]
)

REPLAY_MAX_POINTS = 512


def _replay_group(pdf: pd.DataFrame, algos: dict | None = None) -> pd.DataFrame:
    """Reference semantics: for index in range(10, len(ts)) run each detector
    on the prefix ts[:index]; group triggers per timestamp and emit rows with
    consensus_count (crucible/crucible_algorithms.py:441-516, 540-607)."""
    from ..operators.detectors import ALGORITHMS, DetectorParams

    if algos is None:
        algos = ALGORITHMS
    n_full = len(pdf)
    pdf = pdf.sort_values(["ts", "event_id"]).tail(REPLAY_MAX_POINTS)
    truncated = n_full > len(pdf)
    window_start = n_full - len(pdf)
    ts = pdf["ts"].astype("int64").to_numpy() / 1e9
    values = pdf["value"].to_numpy(np.float64)
    et = pdf["event_type"].iat[0]
    span = max(ts[-1] - ts[0], 1.0)
    params = DetectorParams(full_duration=int(span))
    out = []
    # reference loop: `sliced = timeseries[:index]` — the prefix EXCLUDES
    # point `index`, so the verdict attaches to sliced[-1] = point index-1
    # (prefix lengths 10..n-1, never the full series)
    for i in range(10, len(ts)):
        prefix_ts, prefix_v = ts[:i], values[:i]
        now = float(prefix_ts[-1])
        triggered = [
            name
            for name, fn in algos.items()
            if fn(prefix_ts, prefix_v, now, params) is True
        ]
        if triggered:
            out.append(
                {
                    "event_type": et,
                    "index": i - 1,
                    "value": float(prefix_v[-1]),
                    "consensus_count": len(triggered),
                    "triggered_algorithms": ",".join(triggered),
                    "truncated": truncated,
                    "window_start": window_start,
                }
            )
    cols = [f.name for f in _REPLAY_SCHEMA]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


@query(
    "replay_full_ensemble",
    None,
    doc="Crucible sliding replay of the FULL 9-detector ensemble: every "
        "prefix of each series re-scored in a grouped-map pandas UDF "
        "(crucible_algorithms.py:441-607); emits the anomalies.csv shape "
        "(index, value, consensus_count, triggered_algorithms). NOTE: replay "
        f"is O(n²) per series by reference semantics, so each series is "
        f"truncated to its last {REPLAY_MAX_POINTS} points — the output is "
        "self-describing via `truncated` + `window_start` (index + "
        "window_start = full-series index). Algorithm-set "
        "selection per `crucible_algorithms.py:458-481`: skyline_app/"
        "algorithms kwargs resolve the kernel subset (default: the full "
        "registered ensemble, the reference's ['all'])",
)
def replay_full_ensemble(
    spark: SparkSession,
    sf_dir: str,
    skyline_app: str = "crucible",
    algorithms: list[str] | None = None,
) -> DataFrame:
    from functools import partial

    from ..operators.ensemble import resolve_algorithm_set

    algos = resolve_algorithm_set(skyline_app, algorithms)
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    return ev.groupBy("event_type").applyInPandas(
        partial(_replay_group, algos=algos), _REPLAY_SCHEMA
    )

"""Roomba-style table maintenance: duplicate dedup + retention trim.

Spark restatement of `/root/reference/skyline/horizon/roomba.py:86-181`: the
reference walks every Redis key, unpacks the series, keeps the FIRST
datapoint for each duplicated timestamp, trims points older than
``FULL_DURATION + ROOMBA_GRACE_TIME``, and writes the cleaned series back
under a WATCH/retry loop. Here the same two rules are a pure DataFrame
transform over any keyed table (checkpoint, stats history, ingested
series); snapshot-isolated table formats replace the WATCH loop
(plans/checkpoint.py module doc).

Scale shape: the retention trim is a partition-prunable filter that runs
BEFORE the dedup shuffle; the dedup itself is one shuffle on the logical
key (for series tables the key includes the timestamp, so hot series
spread across many (key, ts) groups — no single-reducer skew).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["vacuum", "vacuum_checkpoint"]


def vacuum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    retention_seconds: float | None = None,
    now_ts: float | None = None,
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """First-wins dedup on ``key_cols`` + retention trim on ``ts_col``.

    - rows sharing ``key_cols`` collapse to the FIRST by ``order_cols``
      (for a series table pass ``key_cols=(series_key…, ts)`` and an
      arrival-order column — roomba.py:141-149 keeps the first datapoint
      for each duplicated timestamp);
    - rows with ``ts_col`` older than ``now_ts - retention_seconds`` are
      dropped (roomba.py:151-166, the FULL_DURATION + grace trim).
    """
    out = df
    if retention_seconds is not None and now_ts is not None:
        cutoff = F.to_timestamp(F.lit(now_ts - retention_seconds))
        out = out.where(F.col(ts_col).cast("timestamp") >= cutoff)
    order = list(order_cols) if order_cols else [ts_col]
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order])
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def vacuum_checkpoint(
    checkpoint: DataFrame, now_ts: float, retention_days: float = 90.0
) -> DataFrame:
    """Maintain the append-only checkpoint table: collapse re-appended
    duplicate (partition, lang, snapshot, version) rows to the earliest
    ``validated_at`` and trim runs past retention."""
    return vacuum(
        checkpoint,
        key_cols=["partition_date", "lang", "snapshot_id", "detector_version_hash"],
        ts_col="validated_at",
        retention_seconds=retention_days * 86400.0,
        now_ts=now_ts,
        order_cols=["validated_at", "run_id"],
    )

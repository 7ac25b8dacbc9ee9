"""Checkpoint / lineage table — resumable validation runs.

The Panorama-anomalies + Redis-TTL-dedup restatement (SURVEY §2.3, §3.3):
one row per validated (partition_date, lang) carrying the partition content
fingerprint (snapshot id), the detector versions that produced the verdict,
a digest of the stats, and run metrics (FIXTURES F5 ``checkpoint`` schema).

Resume = an anti-join: a partition needs (re)validation iff its current
``(partition_date, lang, snapshot_id, engine detector-version hash)`` tuple
has no checkpoint row. Changed data changes the fingerprint; changed kernels
change the version hash; both force revalidation — nothing else does.

Storage is plain parquet (append-only, partitioned by run) so it works
anywhere; on an Iceberg deployment this table maps 1:1 to an Iceberg table
with snapshot isolation (optimistic concurrency is then native, replacing
Roomba's WATCH/retry loop — `horizon/roomba.py:60-196`).
"""

from __future__ import annotations

import json
import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..operators.detectors import DETECTOR_VERSIONS
from .stats import PARTITION_COLS

__all__ = [
    "CHECKPOINT_SCHEMA",
    "RUN_METRICS_SCHEMA",
    "detector_version_hash",
    "load_checkpoint",
    "append_checkpoint",
    "pending_partitions",
    "checkpoint_history",
    "run_metrics_rows",
    "append_run_metrics",
    "load_run_metrics",
]

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("partition_date", T.DateType()),
        T.StructField("lang", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("detector_version_hash", T.StringType()),
        T.StructField("detector_versions", T.MapType(T.StringType(), T.StringType())),
        T.StructField("stat_digests", T.BinaryType()),
        T.StructField("row_count", T.LongType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("validated_at", T.TimestampType()),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType())),
        # the partition's full stat vector + capped ks_test sample, carried
        # so a PRUNED resume (ValidationConfig.pruned_resume) can rebuild
        # drift baselines from the checkpoint instead of rescanning
        # already-validated partitions. Bounded: ~13 doubles + <=sample_cap
        # doubles per (partition, lang) row. Old checkpoints (written before
        # these columns) read back as NULL — the pruned path refuses them
        # loudly (checkpoint_history) rather than silently shortening
        # baselines.
        T.StructField("stat_values", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("sample", T.ArrayType(T.DoubleType())),
    ]
)


#: per-run lineage metrics — the Spark restatement of the Analyzer's
#: end-of-run accounting (`analyzer/analyzer.py:2343-2413`: run_time,
#: total metrics / analyzed / anomalies, the exceptions dict and the
#: per-algorithm anomaly_breakdown it logs and ships to Graphite), persisted
#: as ONE row per run_id next to the checkpoint instead of log lines, so
#: production-run forensics live in the lineage table (VERDICT r4 item 3).
RUN_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("validated_at", T.TimestampType()),
        # wall seconds, supplied by the writer once actions finished (the
        # frame itself is lazy, so build time cannot know it); NULL when the
        # caller did not measure
        T.StructField("run_time_s", T.DoubleType()),
        T.StructField("total_partitions", T.LongType()),
        T.StructField("total_analyzed", T.LongType()),
        T.StructField("total_anomalies", T.LongType()),
        # skip statuses, keyed TOO_SHORT / STALE / BORING (always all three
        # keys — stable map shape, zero-filled)
        T.StructField(
            "exceptions", T.MapType(T.StringType(), T.LongType(), False)
        ),
        # per-detector trigger counts over consensus-anomalous stat series
        # (always every detector key, zero-filled)
        T.StructField(
            "anomaly_breakdown", T.MapType(T.StringType(), T.LongType(), False)
        ),
        T.StructField("detector_version_hash", T.StringType()),
    ]
)


def detector_version_hash(versions: dict[str, str] | None = None) -> str:
    versions = versions or DETECTOR_VERSIONS
    blob = json.dumps(sorted(versions.items())).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def load_checkpoint(spark: SparkSession, path: str) -> DataFrame:
    """Empty frame iff the checkpoint does not exist yet (first run).

    ONLY the missing-table case maps to "no checkpoint": a permission
    error, corrupted footer, or transient store failure must raise —
    swallowing it would silently mark every partition pending and
    re-validate the whole 10^12-row table with no signal that anything
    went wrong. Routed through the table-format seam
    (sources/table_format.py): parquet in-sandbox, Iceberg by swapping
    DEFAULT_FORMAT."""
    from ..sources.table_format import DEFAULT_FORMAT

    return DEFAULT_FORMAT.read_or_empty(spark, path, CHECKPOINT_SCHEMA)


def append_checkpoint(df: DataFrame, path: str) -> None:
    from ..sources.table_format import DEFAULT_FORMAT

    DEFAULT_FORMAT.append(df, path)


def pending_partitions(
    current: DataFrame,
    checkpoint: DataFrame,
    version_hash: str | None = None,
    run_ts: float | None = None,
    max_age_days: float | None = None,
) -> DataFrame:
    """(partition_date, lang) pairs needing validation.

    ``current``: one row per (partition_date, lang) with ``snapshot_id``
    (the content fingerprint from plans.stats). Anti-join against checkpoint
    rows with the same snapshot + detector versions — pure DataFrame logic,
    no driver collect (SURVEY §4 "Resumability").

    ``max_age_days``: periodic re-validation (the batch restatement of the
    reference's hourly Mirage periodic checks, `analyzer.py:305-449`) —
    checkpoint rows whose ``validated_at`` is more than this many days
    before ``run_ts`` stop suppressing re-validation, so every partition is
    re-checked at least that often even with unchanged data and kernels.
    """
    version_hash = version_hash or detector_version_hash()
    done = checkpoint.where(F.col("detector_version_hash") == version_hash)
    if max_age_days is not None and run_ts is not None:
        cutoff = F.to_timestamp(F.lit(run_ts - max_age_days * 86400.0))
        done = done.where(F.col("validated_at") >= cutoff)
    done = done.select(*PARTITION_COLS, "snapshot_id")
    return current.select(*PARTITION_COLS, "snapshot_id").join(
        done, [*PARTITION_COLS, "snapshot_id"], "left_anti"
    )


def checkpoint_history(checkpoint: DataFrame):
    """Rebuild the drift inputs (stats series + ks_test samples) for
    already-validated partitions FROM the checkpoint — the piece that makes
    a resumed run skip the heavy scan of unchanged partitions entirely
    (ValidationConfig.pruned_resume).

    The checkpoint is append-only, so a re-validated partition has several
    rows; the LATEST (validated_at, run_id) wins — exactly the row whose
    stat_values/sample describe the data the recorded snapshot_id hashes.

    Returns ``(stats_long, samples, latest_cache)``: the first two shaped
    like plans.stats ``partition_stats`` / ``stat_samples`` output, ready to
    union with the freshly computed target-partition frames; the third is
    the cached per-pair frame both derive from — the caller owns releasing
    it (``.unpersist()``) once the run's actions are done. Raises if any
    surviving row predates the stat_values/sample columns: silently
    shortening drift baselines would change verdicts with no signal —
    re-run once without pruning to rewrite the checkpoint instead.
    """
    from .stats import SAMPLE_STAT

    payload = F.struct(
        F.col("snapshot_id"), F.col("stat_values"), F.col("sample")
    )
    order = F.struct(F.col("validated_at"), F.col("run_id"))
    latest = (
        checkpoint.groupBy(*PARTITION_COLS)
        .agg(F.max_by(payload, order).alias("p"))
        .select(
            *PARTITION_COLS,
            F.col("p.snapshot_id").alias("fingerprint"),
            F.col("p.stat_values").alias("stat_values"),
            F.col("p.sample").alias("sample"),
        )
    )
    # checkpoint-sized (one row per partition x lang) and consumed by two
    # frames below plus the legacy-row guard — cache for the run
    latest = latest.cache()
    n_legacy = (
        latest.where(F.col("stat_values").isNull()).limit(1).count()
    )
    if n_legacy:
        latest.unpersist()
        raise RuntimeError(
            "pruned resume needs stat_values/sample in every checkpoint row, "
            "but this checkpoint has rows written before those columns "
            "existed; run validate() once without pruned_resume to refresh "
            "it (silently shortening drift baselines is not an option)"
        )
    stats_long = latest.select(
        *PARTITION_COLS,
        "fingerprint",
        F.explode("stat_values").alias("stat", "value"),
    )
    samples = latest.select(
        *PARTITION_COLS,
        F.lit(SAMPLE_STAT).alias("stat"),
        F.col("sample"),
    ).where(F.col("sample").isNotNull())
    return stats_long, samples, latest


def run_metrics_rows(
    verdicts: DataFrame,
    run_id: str,
    run_ts: float,
    run_time_s: float | None = None,
    version_hash: str | None = None,
    algorithm_names: list[str] | None = None,
) -> DataFrame:
    """ONE RUN_METRICS_SCHEMA row from a run's verdict table.

    Mirrors the reference's end-of-run accounting exactly
    (`analyzer/analyzer.py:2343-2413`):
      total_analyzed  = total − Σ exceptions (TooShort/Stale/Boring skips),
      total_anomalies = partitions whose verdict is FAIL,
      anomaly_breakdown[algo] = over every consensus-anomalous stat series,
        how many recorded ensembles show that detector triggered (the
        reference increments per triggered_algorithms entry of each
        anomalous metric).
    Pure DataFrame aggregation over the checkpoint-sized verdict frame; the
    three 1-row legs meet in broadcast crossJoins (house pattern)."""
    from ..config import STATUS_BORING, STATUS_FAIL, STATUS_STALE, STATUS_TOO_SHORT

    names = list(algorithm_names or DETECTOR_VERSIONS)
    skip = [STATUS_TOO_SHORT, STATUS_STALE, STATUS_BORING]

    def _n(status):
        return F.coalesce(
            F.sum(F.when(F.col("status") == status, 1).otherwise(0)), F.lit(0)
        ).cast("long")

    totals = verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("total_partitions"),
        (
            F.count(F.lit(1))
            - sum(_n(s) for s in skip)  # noqa: B905 — column sum
        ).cast("long").alias("total_analyzed"),
        _n(STATUS_FAIL).alias("total_anomalies"),
        F.map_from_arrays(
            F.array(*[F.lit(s) for s in skip]),
            F.array(*[_n(s) for s in skip]),
        ).alias("exceptions"),
    )
    # consensus-anomalous stats → their recorded ensemble arrays → per-slot
    # trigger counts (slot order = the run's algorithm dict order)
    fired = (
        verdicts.select(
            F.explode_outer("consensus").alias("stat", "anom"), "ensemble"
        )
        .where(F.col("anom"))
        .select(F.element_at("ensemble", F.col("stat")).alias("arr"))
        .agg(
            *[
                F.coalesce(
                    F.sum(
                        F.when(F.element_at("arr", i + 1), 1).otherwise(0)
                    ),
                    F.lit(0),
                ).cast("long").alias(f"_t{i}")
                for i in range(len(names))
            ]
        )
    )
    breakdown = fired.select(
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in names]),
            F.array(*[F.col(f"_t{i}") for i in range(len(names))]),
        ).alias("anomaly_breakdown")
    )
    # session-TZ-independent instant (see plans/validate.py stage 7 note)
    validated_at = F.timestamp_seconds(F.lit(float(run_ts)))
    return (
        totals.crossJoin(F.broadcast(breakdown))
        .select(
            F.lit(run_id).alias("run_id"),
            validated_at.alias("validated_at"),
            F.lit(run_time_s).cast("double").alias("run_time_s"),
            "total_partitions",
            "total_analyzed",
            "total_anomalies",
            "exceptions",
            "anomaly_breakdown",
            F.lit(version_hash or detector_version_hash()).alias(
                "detector_version_hash"
            ),
        )
    )


def append_run_metrics(df: DataFrame, path: str) -> None:
    from ..sources.table_format import DEFAULT_FORMAT

    DEFAULT_FORMAT.append(df, path)


def load_run_metrics(spark: SparkSession, path: str) -> DataFrame:
    """Empty frame iff the run-metrics table does not exist yet; any other
    read failure raises (same loud-failure contract as load_checkpoint)."""
    from ..sources.table_format import DEFAULT_FORMAT

    return DEFAULT_FORMAT.read_or_empty(spark, path, RUN_METRICS_SCHEMA)

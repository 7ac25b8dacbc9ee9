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
    "detector_version_hash",
    "load_checkpoint",
    "append_checkpoint",
    "pending_partitions",
    "checkpoint_history",
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


def detector_version_hash(versions: dict[str, str] | None = None) -> str:
    versions = versions or DETECTOR_VERSIONS
    blob = json.dumps(sorted(versions.items())).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def load_checkpoint(spark: SparkSession, path: str) -> DataFrame:
    """Empty frame iff the checkpoint does not exist yet (first run).

    ONLY the missing-path case maps to "no checkpoint": a permission error,
    corrupted footer, or transient store failure must raise — swallowing it
    would silently mark every partition pending and re-validate the whole
    10^12-row table with no signal that anything went wrong.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], CHECKPOINT_SCHEMA)
        raise


def append_checkpoint(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


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

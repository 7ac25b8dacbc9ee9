"""SparkSession factory with scale-appropriate defaults.

All knobs here are the ones that matter at 100 TB: AQE (runtime re-planning +
skew-join splitting), Arrow batching for the pandas-UDF kernels, and a
shuffle-partition count sized to the parallelism level. On a real cluster
these come from spark-submit conf; the factory is for local runs and tests.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "skyline-spark-validate",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver JVM runs every task. Measured sweep at 32
        # threads on the allocation-heavy stages: 16g + capped GC threads is
        # 2-4x faster than either an 8g heap (collection pressure) or a
        # cores-scaled 68g heap (G1 region scanning + 20+ GC threads spinning
        # — load sat at 18 with 50x the CPU burned for identical results)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # ship the package to python workers — same mechanism as
    # `spark-submit --py-files` on a real cluster (north rule)
    from .packaging import attach_package

    attach_package(spark)
    return spark

"""Decompose the kernel stage: no-op UDF vs real ensemble at N executors.

The no-op variant pays scan + shuffle + Arrow decode + scheduling but zero
kernel compute; the difference isolates the python kernel time. Usage:
    python tools/diag_kernel.py <series_parquet_path> [n_exec ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = '''
import sys, time, json
sys.path.insert(0, {repo!r})
n_exec = {n_exec}
import pandas as pd
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local-cluster[{{n_exec}},1,6144]")
     .appName("diag-kernel")
     .config("spark.sql.shuffle.partitions", str({n_exec}))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.driver.memory", "4g")
     .config("spark.ui.enabled", "false").getOrCreate())
from skyline_spark.packaging import attach_package
attach_package(spark)
from skyline_spark.config import ValidationConfig
from skyline_spark.plans.drift import drift_verdicts, DRIFT_SCHEMA, _bucket_verdicts

series = spark.read.parquet({series_path!r})
samples = series.limit(0).select("partition_date","lang","stat",F.array().cast("array<double>").alias("sample"))
targets = series.groupBy("lang").agg(F.max("partition_date").alias("partition_date")).cache(); targets.count()
cfg = ValidationConfig(min_history=4, kernel_buckets=128)
drift_verdicts(series.limit(2000), samples, cfg, targets_df=targets, drift_stats=["value_avg"]).count()

out = {{}}
def t(label, fn):
    t0 = time.time(); fn(); out[label] = round(time.time() - t0, 2)
    print(f"PHASE {{label}}: {{out[label]}}s", flush=True)

# identical plan, no-op UDF: same scan/shuffle/arrow, zero kernel work
from pyspark.sql import functions as F2
flags = targets.select("partition_date","lang").withColumn("is_target", F.lit(True))
enriched = (series.where(F.col("stat").isin(["value_avg"]))
    .join(F.broadcast(samples.select("partition_date","lang","sample")), ["partition_date","lang"], "left")
    .join(F.broadcast(flags), ["partition_date","lang"], "left")
    .withColumn("is_target", F.coalesce(F.col("is_target"), F.lit(False)))
    .withColumn("_bucket", F.pmod(F.xxhash64("lang", "stat"), F.lit(128))))
cols = [f.name for f in DRIFT_SCHEMA]
def noop(pdf):
    return pd.DataFrame(columns=cols)
def timed_kernel(pdf):
    return _bucket_verdicts(pdf, cfg, {{"value_avg"}})

t("noop_udf", lambda: enriched.groupBy("_bucket").applyInPandas(noop, DRIFT_SCHEMA).count())
t("noop_udf2", lambda: enriched.groupBy("_bucket").applyInPandas(noop, DRIFT_SCHEMA).count())
t("real_kernel", lambda: drift_verdicts(series, samples, cfg, targets_df=targets, drift_stats=["value_avg"]).count())
t("real_kernel2", lambda: drift_verdicts(series, samples, cfg, targets_df=targets, drift_stats=["value_avg"]).count())
print("RESULT " + json.dumps(out), flush=True)
spark.stop()
'''


def main() -> None:
    series_path = sys.argv[1]
    sizes = [int(a) for a in sys.argv[2:]] or [2, 8]
    results = {}
    for n in sizes:
        print(f"=== {n} executors ===", flush=True)
        script = _CHILD.format(repo=REPO, n_exec=n, series_path=series_path)
        out = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True, timeout=3600
        )
        for line in out.stdout.splitlines():
            if line.startswith("PHASE "):
                print(" ", line)
        lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise SystemExit(f"failed at {n}")
        results[n] = json.loads(lines[-1][len("RESULT "):])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

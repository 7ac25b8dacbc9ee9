"""Stage-level diagnosis of kernel/validate scaling (VERDICT round-1 item 2/3).

Runs each phase as its own timed action at two local-cluster sizes over the
SAME pre-materialized parquet input, so generation cost is excluded and the
per-phase scaling is visible. Usage:

    python tools/diag_scaling.py            # both sizes
    python tools/diag_scaling.py 8          # one size
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXEC_MEM_MB = 6144
KERNEL_SERIES = 100_000
VALIDATE_ROWS = 4_000_000

_CHILD = '''
import sys, time, json
sys.path.insert(0, {repo!r})
n_exec = {n_exec}
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local-cluster[{{n_exec}},1,{mem}]")
     .appName("diag-scaling")
     .config("spark.sql.shuffle.partitions", str({n_exec}))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.adaptive.skewJoin.enabled", "true")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.driver.memory", "4g")
     .config("spark.executor.memory", "{mem}m")
     .config("spark.ui.enabled", "false").getOrCreate())
from skyline_spark.packaging import attach_package
attach_package(spark)
from pyspark.sql import functions as F
from skyline_spark.config import ValidationConfig
from skyline_spark.plans.drift import drift_verdicts
from skyline_spark.plans.validate import validate
from skyline_spark.plans import stats as stats_mod

out = {{}}
def t(label, fn):
    t0 = time.time(); r = fn(); dt = time.time() - t0
    out[label] = round(dt, 2)
    print(f"PHASE {{label}}: {{dt:.2f}}s", flush=True)
    return r

series = spark.read.parquet({series_path!r})
samples = series.limit(0).select("partition_date","lang","stat",F.array().cast("array<double>").alias("sample"))
targets = series.groupBy("lang").agg(F.max("partition_date").alias("partition_date")).cache(); targets.count()
# warm python workers / JIT
drift_verdicts(series.limit(2000), samples, ValidationConfig(min_history=4),
               targets_df=targets, drift_stats=["value_avg"]).count()

t("kernel_scan_only", lambda: series.count())
for nb in ({n_exec}, 4 * {n_exec}, 16 * {n_exec}, 64 * {n_exec}):
    cfg = ValidationConfig(min_history=4, kernel_buckets=nb)
    t(f"kernel_buckets_{{nb}}", lambda cfg=cfg: drift_verdicts(
        series, samples, cfg, targets_df=targets, drift_stats=["value_avg"]).count())

pages = spark.read.parquet({pages_path!r})
t("pages_scan_only", lambda: pages.count())
cfgv = ValidationConfig(min_history=4)
res = t("validate_build_ckpts", lambda: validate(pages, cfgv, run_ts=1.7e9))
t("validate_verdicts_count", lambda: res.verdicts.count())
t("validate_violations_write", lambda: res.violations.write.mode("overwrite").format("noop").save())
t("validate_checkpoint_write", lambda: res.checkpoint.write.mode("overwrite").format("noop").save())

# decompose the ckpt build
slim_l = t("slim_ckpt_alone", lambda: stats_mod.slim_pages(
    pages.select(*[F.col(f.name) for f in pages.schema.fields])).localCheckpoint(eager=True))
t("stats_ckpt_alone", lambda: stats_mod.partition_stats(slim_l).localCheckpoint(eager=True))
t("samples_ckpt_alone", lambda: stats_mod.stat_samples(slim_l, cfgv.sample_cap).localCheckpoint(eager=True))

print("RESULT " + json.dumps(out), flush=True)
spark.stop()
'''


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2, 8]
    tmp = tempfile.mkdtemp(prefix="diag_scaling_")
    series_path = os.path.join(tmp, "series")
    pages_path = os.path.join(tmp, "pages")

    prep = f'''
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
from skyline_spark.sources.synth import synth_pages
spark = (SparkSession.builder.master("local[16]")
     .config("spark.sql.shuffle.partitions", "16")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.driver.memory", "8g")
     .config("spark.ui.enabled", "false").getOrCreate())
n_series, pts = {KERNEL_SERIES}, 60
series = (
    spark.range(n_series * pts)
    .select((F.col("id") % n_series).alias("sid"), (F.col("id") / n_series).cast("long").alias("step"))
    .select(
        F.to_date(F.lit("2020-01-01")).alias("partition_date"),
        F.concat(F.lit("s"), F.col("sid")).alias("lang"),
        F.lit("value_avg").alias("stat"),
        F.col("step"),
        (F.sin(F.col("sid") + F.col("step") * 0.7) * 10.0 + (F.col("step") % 7).cast("double")).alias("value"),
    )
    .withColumn("partition_date", F.date_add("partition_date", F.col("step").cast("int")))
    .drop("step").withColumn("fingerprint", F.lit(0).cast("long"))
)
series.write.mode("overwrite").parquet({series_path!r})
synth_pages(spark, {VALIDATE_ROWS}, 30).write.mode("overwrite").parquet({pages_path!r})
spark.stop()
'''
    print("materializing shared inputs ...", flush=True)
    subprocess.run([sys.executable, "-c", prep], check=True)

    results = {}
    for n in sizes:
        print(f"=== {n} executors ===", flush=True)
        script = _CHILD.format(
            repo=REPO, n_exec=n, mem=EXEC_MEM_MB,
            series_path=series_path, pages_path=pages_path,
        )
        out = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True, timeout=3600
        )
        for line in out.stdout.splitlines():
            if line.startswith("PHASE "):
                print(" ", line)
        lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise SystemExit(f"diag at {n} executors failed")
        results[n] = json.loads(lines[-1][len("RESULT "):])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

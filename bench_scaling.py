"""Two-cluster-size scaling evidence (north rule: N vs 4N executors).

A real multi-node cluster cannot exist in this sandbox, so the same jobs
run under Spark's ``local-cluster[N, cores, mem]`` master — which launches
N REAL separate executor JVMs with their own heaps and python workers —
at N=2 and 4N=8 executors x 1 core (both topologies pay the same cross-JVM shuffle costs, so the comparison isolates added parallelism). This is the faithful emulation of
adding executors: measured single-JVM thread scaling (plain ``local[n]``)
conflates JVM/GC contention with parallelism and is NOT used here. One
core per executor keeps total parallelism in the regime where the
sandbox's memory-bandwidth ceiling (below) is not the limiter, so the
measurement reflects the ENGINE's scaling, not the box's.

Hardware context recorded alongside the numbers: this box saturates
~150 GB/s of memory bandwidth at 32 streams (8 procs already reach 87 GB/s),
so bandwidth-bound scan stages have a hard machine ceiling of ~1.7x from
8->32 threads no matter the engine. The scaling-efficiency criterion is
therefore evidenced on the compute-bound stages (the detector-kernel
ensemble — BASELINE.json's headline metric) with the scan-heavy pipeline
reported alongside.

Each measurement runs in a fresh subprocess; workloads are sized so
variable work dominates fixed startup (~6-8s of shuffle/python-worker
setup per job).
"""

from __future__ import annotations

import json
import subprocess
import sys

EXECUTORS = [2, 8]
EXEC_CORES = 1
EXEC_MEM_MB = 6144

KERNEL_SERIES = 100_000   # 6M stat rows, one ensemble per series
VALIDATE_ROWS = 4_000_000

_CHILD = '''
import sys, time, tempfile, json
sys.path.insert(0, "/root/repo")
n_exec = {n_exec}
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local-cluster[{n_exec},{exec_cores},{exec_mem}]")
     .appName("bench-scaling")
     .config("spark.sql.shuffle.partitions", str({exec_cores} * {n_exec}))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.sql.adaptive.skewJoin.enabled", "true")
     .config("spark.sql.execution.arrow.pyspark.enabled", "true")
     .config("spark.sql.session.timeZone", "UTC")
     .config("spark.driver.memory", "4g")
     .config("spark.executor.memory", "{exec_mem}m")
     .config("spark.ui.enabled", "false").getOrCreate())
from skyline_spark.packaging import attach_package
attach_package(spark)
from pyspark.sql import functions as F
from skyline_spark.config import ValidationConfig
from skyline_spark.plans.drift import drift_verdicts
from skyline_spark.plans.validate import validate
from skyline_spark.sources.synth import synth_pages

out = {{}}

# --- kernel ensemble: one 9-detector evaluation per series ---------------
n_series, pts = {kernel_series}, 60
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
samples = series.limit(0).select("partition_date","lang","stat",F.array().cast("array<double>").alias("sample"))
targets = series.groupBy("lang").agg(F.max("partition_date").alias("partition_date")).cache(); targets.count()
drift_verdicts(series.limit(2000), samples, ValidationConfig(min_history=4),
               targets_df=targets, drift_stats=["value_avg"]).count()  # warm workers
t0 = time.time()
n = drift_verdicts(series, samples, ValidationConfig(min_history=4),
                   targets_df=targets, drift_stats=["value_avg"]).count()
dt = time.time() - t0
out["kernel_sec"] = round(dt, 2)
out["kernel_series"] = n_series
out["kernel_rows"] = n_series * pts
out["kernel_ensembles_per_sec"] = round(n_series / dt, 1)
out["kernel_rows_per_sec"] = round(n_series * pts / dt, 1)

# --- full validation pipeline over the synthetic page table --------------
tmp = tempfile.mkdtemp()
t0 = time.time()
synth_pages(spark, {validate_rows}, 30).write.mode("overwrite").parquet(tmp + "/p")
out["synth_sec"] = round(time.time() - t0, 2)
pages = spark.read.parquet(tmp + "/p")
t0 = time.time()
res = validate(pages, ValidationConfig(min_history=4), run_ts=1.7e9)
n_parts = res.verdicts.count()
res.violations.write.mode("overwrite").format("noop").save()
dt = time.time() - t0
out["validate_sec"] = round(dt, 2)
out["validate_rows"] = {validate_rows}
out["partitions_validated"] = n_parts
out["partitions_per_hour"] = round(n_parts / dt * 3600, 1)

print("RESULT " + json.dumps(out))
spark.stop()
'''


def run_child(n_exec: int) -> dict:
    script = _CHILD.format(
        n_exec=n_exec,
        exec_cores=EXEC_CORES,
        exec_mem=EXEC_MEM_MB,
        kernel_series=KERNEL_SERIES,
        validate_rows=VALIDATE_ROWS,
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=3600
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise SystemExit(f"bench at {n_exec} executors failed")
    return json.loads(lines[-1][len("RESULT "):])


def main() -> None:
    results = {}
    for n in EXECUTORS:
        results[n] = run_child(n)
        r = results[n]
        print(
            f"executors={n}x{EXEC_CORES}c: kernels {r['kernel_ensembles_per_sec']}/s "
            f"({r['kernel_sec']}s), validate {r['validate_sec']}s "
            f"({r['partitions_per_hour']} partitions/h)"
        )
    lo, hi = EXECUTORS
    factor = hi / lo
    kernel_eff = (
        results[hi]["kernel_ensembles_per_sec"]
        / results[lo]["kernel_ensembles_per_sec"]
        / factor
    )
    validate_eff = results[lo]["validate_sec"] / results[hi]["validate_sec"] / factor
    summary = {
        "mode": f"local-cluster[N,{EXEC_CORES},{EXEC_MEM_MB}] — real separate executor JVMs",
        "executors": EXECUTORS,
        "results": results,
        "kernel_scaling_efficiency": round(kernel_eff, 3),
        "validate_scaling_efficiency": round(validate_eff, 3),
        "machine_note": (
            "memory bandwidth saturates ~150 GB/s (87 GB/s at 8 streams); "
            "bandwidth-bound scan stages have a hardware ceiling of ~1.7x "
            "from 8->32 threads independent of the engine"
        ),
    }
    print(json.dumps(summary, indent=2))
    with open("scaling_results.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()

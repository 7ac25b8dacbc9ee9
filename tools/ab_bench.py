"""A/B evidence runs for contested bench numbers (VERDICT r3 ask #3).

Round 3 left an evidence conflict: BASELINE.md called `dedup_embedding_lsh`
"flat within VM noise" while both committed snapshots recorded 10-12 s
(vs 2.2-4.0 s in round 2); `dedup_clusters` and the `validate_pages`
steady state drifted the same direction. This tool produces the committed
rep evidence: N timed reps per contested stanza in ONE session (same
config bench.py uses), plus the host load context, written as JSON so the
number can be judged against the run spread instead of a single sample.

Usage: python tools/ab_bench.py [out.json] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERY_REPS = [
    "dedup_embedding_lsh",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_simhash",  # round 5: flood-guard cost A/B
]


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def main(out_path: str = "AB_r04.json", reps: int = 5) -> None:
    t_start = time.time()
    load1, load5, _ = os.getloadavg()

    from skyline_spark.catalog import QUERIES
    from skyline_spark.session import get_spark

    spark = get_spark("skyline-ab", cores=CORES)
    results: dict = {
        "sf_dir": SF_DIR,
        "cores": CORES,
        "reps": reps,
        "loadavg_at_start": [round(load1, 2), round(load5, 2)],
        "queries": {},
    }

    # warm the python worker pool / codegen once, like bench.py
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v):
        return v * 1.0

    _noop(spark.range(1000).select(_warm(F.col("id").cast("double")).alias("w")))

    for name in QUERY_REPS:
        times = []
        for _ in range(reps):
            t0 = time.time()
            _noop(QUERIES[name].build(spark, SF_DIR))
            times.append(round(time.time() - t0, 3))
        results["queries"][name] = {
            "reps": times,
            "best": min(times),
            "median": sorted(times)[len(times) // 2],
            "worst": max(times),
        }
        print(name, times, flush=True)

    # validate_pages steady state: cold run excluded, then reps
    import shutil
    import tempfile

    from skyline_spark.config import ValidationConfig
    from skyline_spark.plans.stats import with_partition
    from skyline_spark.plans.validate import validate
    from skyline_spark.sources.synth import synth_pages

    sf = float(SF_DIR.rstrip("/").split("sf")[-1]) if "sf" in SF_DIR else 0.1
    n_rows = max(int(2_000_000 * sf / 0.1), 20_000)
    tmp = tempfile.mkdtemp(prefix="skyline_ab_")
    pages_path = os.path.join(tmp, "pages")
    with_partition(
        synth_pages(spark, n_rows=n_rows, n_days=30)
    ).repartition("partition_date").write.mode("overwrite").partitionBy(
        "partition_date"
    ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    def _one():
        t0 = time.time()
        res = validate(pages, ValidationConfig(min_history=4), run_ts=1_700_000_000.0)
        res.verdicts.count()
        _noop(res.violations)
        dt = round(time.time() - t0, 3)
        res.release()
        return dt

    cold = _one()
    steady = [_one() for _ in range(max(3, reps - 2))]
    results["queries"]["validate_pages"] = {
        "cold": cold,
        "reps": steady,
        "best": min(steady),
        "median": sorted(steady)[len(steady) // 2],
        "worst": max(steady),
    }
    print("validate_pages cold", cold, "steady", steady, flush=True)
    shutil.rmtree(tmp, ignore_errors=True)

    results["wall_total"] = round(time.time() - t_start, 1)
    results["loadavg_at_end"] = [round(x, 2) for x in os.getloadavg()[:2]]
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "AB_r04.json",
        int(sys.argv[2]) if len(sys.argv) > 2 else 5,
    )

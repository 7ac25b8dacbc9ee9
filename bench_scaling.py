"""Two-cluster-size scaling evidence (north rule).

A real N-vs-4N-executor comparison needs a cluster; in this sandbox the
same job runs at two parallelism levels — ``local[8]`` and ``local[32]`` —
on identical input, and throughput at both plus the scaling efficiency
( (T_8 / T_32) / 4 ) is reported and recorded in BENCH.md.

Each measurement runs in a fresh subprocess so the two SparkContexts (and
their thread pools / codegen caches) cannot contaminate each other.
"""

from __future__ import annotations

import json
import subprocess
import sys

CORES = [8, 32]

_CHILD = """
import json, sys
sys.path.insert(0, "/root/repo")
from bench import run_bench
r = run_bench(cores={cores}, sf_dir={sf_dir!r}, quiet=True)
print("RESULT " + json.dumps(r))
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results = {}
    for cores in CORES:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.format(cores=cores, sf_dir=sf_dir)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-3000:], out.stderr[-3000:])
            raise SystemExit(f"bench at local[{cores}] failed")
        results[cores] = json.loads(line[-1][len("RESULT "):])
        print(f"local[{cores}]: total {results[cores]['value']}s, "
              f"kernel {results[cores]['kernel_rows_per_sec']} rows/s, "
              f"{results[cores]['partitions_per_hour']} partitions/h")

    lo, hi = CORES
    speedup = results[lo]["value"] / results[hi]["value"]
    eff = speedup / (hi / lo)
    kernel_speedup = (
        results[hi]["kernel_rows_per_sec"] / results[lo]["kernel_rows_per_sec"]
    )
    kernel_eff = kernel_speedup / (hi / lo)
    summary = {
        "sf_dir": sf_dir,
        "cores": CORES,
        "total_sec": {c: results[c]["value"] for c in CORES},
        "kernel_rows_per_sec": {c: results[c]["kernel_rows_per_sec"] for c in CORES},
        "partitions_per_hour": {c: results[c]["partitions_per_hour"] for c in CORES},
        "end_to_end_speedup": round(speedup, 3),
        "end_to_end_efficiency": round(eff, 3),
        "kernel_speedup": round(kernel_speedup, 3),
        "kernel_efficiency": round(kernel_eff, 3),
        "per_query": {
            name: {c: results[c]["queries"].get(name) for c in CORES}
            for name in results[hi]["queries"]
        },
    }
    print(json.dumps(summary, indent=2))
    with open("scaling_results.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()

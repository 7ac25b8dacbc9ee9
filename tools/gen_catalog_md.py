"""Generate CATALOG.md — the query-by-query index of the paired registry.

Run: ``python tools/gen_catalog_md.py`` (writes CATALOG.md at the repo root).
tests/test_catalog.py::test_catalog_md_is_current regenerates the content and
asserts the committed file matches, so the index cannot drift from the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """\
# CATALOG — every registered query

Auto-generated from `skyline_spark/catalog` by `tools/gen_catalog_md.py`;
do not edit by hand. Each row is one `queries()` entry in the driver
contract (`__spark_entry__.py`). "oracled" means a DuckDB oracle SQL string
is registered and the in-repo parity tests (and the driver's CORRECTNESS
gate) compare values; "rows-only" means the semantics are not
SQL-expressible (kernel ensembles, binary decode plumbing, self-checking
invariants over synthesized inputs) and the driver records the weaker
rows/schema check.
"""


def render() -> str:
    from skyline_spark.catalog import QUERIES

    lines = [HEADER]
    n_oracled = sum(1 for s in QUERIES.values() if s.oracle is not None)
    lines.append(
        f"\n{len(QUERIES)} queries, {n_oracled} oracled, "
        f"{len(QUERIES) - n_oracled} rows-only.\n"
    )
    lines.append("| Query | Check | What it does |")
    lines.append("|---|---|---|")
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        kind = "oracled" if spec.oracle is not None else "rows-only"
        doc = " ".join((spec.doc or "—").split())
        lines.append(f"| `{name}` | {kind} | {doc} |")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(out, "w") as f:
        f.write(render())
    print(f"wrote {out}")

"""operators/graph.py — exact-integer PageRank semantics.

The catalog parity sweep (test_catalog.py) already compares
``link_graph_pagerank`` against its unrolled DuckDB oracle; these tests pin
the operator itself against an independent pure-Python reimplementation of
the fixed-point update on a hand-built graph, plus the invariants the
int64 design guarantees (bounded mass leak, plan stays JVM-side).
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from skyline_spark.operators.graph import DAMP_DEN, DAMP_NUM, RANK_SCALE, pagerank

# triangle-with-a-chord multigraph: node 0 fans out, 2 funnels back,
# including a duplicate (multi-)edge 1→2 and a self-loop 2→2
EDGES = [(0, 1), (0, 2), (1, 2), (1, 2), (2, 0), (2, 2)]
N = 3


def _pagerank_py(edges: list[tuple[int, int]], n: int, iters: int) -> dict[int, int]:
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((DAMP_DEN - DAMP_NUM) * (RANK_SCALE // n)) // DAMP_DEN
    pr = {v: RANK_SCALE // n for v in range(n)}
    for _ in range(iters):
        s: dict[int, int] = {v: 0 for v in range(n)}
        for u, v in edges:
            s[v] += pr[u] // outdeg[u]
        pr = {v: base + (DAMP_NUM * s[v]) // DAMP_DEN for v in range(n)}
    return pr


def _frames(spark):
    nodes = spark.createDataFrame(
        [(v, N) for v in range(N)], "id long, n_nodes long"
    )
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    return nodes, edges


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_matches_pure_python(spark, iters):
    nodes, edges = _frames(spark)
    got = {
        r["id"]: r["pr"]
        for r in pagerank(nodes, edges, iterations=iters).collect()
    }
    assert got == _pagerank_py(EDGES, N, iters)


def test_pagerank_mass_leak_bounded(spark):
    """Floor divisions only ever LOSE mass, and at most ~(outdeg+1) units
    per node per iteration — the documented alternative to renormalizing."""
    iters = 5
    nodes, edges = _frames(spark)
    total = (
        pagerank(nodes, edges, iterations=iters)
        .agg(F.sum("pr").alias("t"))
        .collect()[0]["t"]
    )
    assert total <= RANK_SCALE
    # generous bound: per node per iteration the two div-100s and the
    # per-edge div-outdeg each drop < 1 unit of their operand's scale
    max_leak = iters * N * (len(EDGES) + 2) * DAMP_DEN
    assert total >= RANK_SCALE - max_leak


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    iters=st.integers(min_value=1, max_value=4),
)
def test_pagerank_random_graphs_match_pure_python(spark, n, seed, iters):
    """Property: on any dangling-free multigraph (every node emits ≥1 edge,
    self-loops and duplicates allowed), the distributed fixed-point result
    equals the sequential reimplementation exactly — int64 arithmetic leaves
    no room for 'close enough'."""
    rnd = random.Random(seed)
    edges = [
        (u, rnd.randrange(n))
        for u in range(n)
        for _ in range(rnd.randint(1, 3))
    ]
    nodes_df = spark.createDataFrame([(v, n) for v in range(n)], "id long, n_nodes long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["pr"]
        for r in pagerank(nodes_df, edges_df, iterations=iters).collect()
    }
    assert got == _pagerank_py(edges, n, iters)


def test_pagerank_plan_is_jvm_side(spark):
    import contextlib
    import io

    nodes, edges = _frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pagerank(nodes, edges, iterations=2).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

from skyline_spark.operators.graph import HITS_SCALE, hits  # noqa: E402


def _hits_py(edges, n, rounds):
    hub = {v: HITS_SCALE for v in range(n)}
    auth = {v: 0 for v in range(n)}
    for _ in range(rounds):
        auth = {v: 0 for v in range(n)}
        for u, v in edges:
            auth[v] += hub[u]
        hub = {v: 0 for v in range(n)}
        for u, v in edges:
            hub[u] += auth[v]
    return auth, hub


@pytest.mark.parametrize("rounds", [1, 3])
def test_hits_matches_pure_python(spark, rounds):
    nodes, edges = _frames(spark)
    got = {
        r.id: (r.auth, r.hub)
        for r in hits(nodes, edges, rounds=rounds).collect()
    }
    auth, hub = _hits_py(EDGES, N, rounds)
    assert got == {v: (auth[v], hub[v]) for v in range(N)}


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_hits_random_multigraph(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(2, 12)
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randint(1, 4 * n))
    ]
    nodes = spark.createDataFrame([(v, n) for v in range(n)], "id long, n_nodes long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.auth, r.hub) for r in hits(nodes, edf, rounds=2).collect()}
    auth, hub = _hits_py(edges, n, 2)
    assert got == {v: (auth[v], hub[v]) for v in range(n)}

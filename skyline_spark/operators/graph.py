"""Distributed link-graph PageRank in exact int64 fixed-point.

Web-corpus curation ranks hosts/documents by link structure (the classic
Common-Crawl quality prior: Page et al. 1999, "The PageRank Citation
Ranking"); this module provides the iterative Spark plan for it.

Why fixed-point integers: float PageRank sums in-neighbor contributions in
partition order, so two runs (or two engines) disagree in the last bits and
a value-hash comparison is meaningless. Here ranks are int64 micro-units of
a RANK_SCALE total; per-edge contribution is ``pr div outdeg`` and the
damping update is ``(15*r0) div 100 + (85*sum) div 100`` — every operation
is exact integer arithmetic, so the result is bit-identical regardless of
partitioning, engine, or summation order (int64 addition is associative).
The floor divisions leak a bounded amount of rank mass per iteration
(< outdeg + 100/100ths of a unit per node) instead of renormalizing — a
deterministic, documented bias of at most ~1e-10 of the total at the
default scale.

Plan shape (per iteration, the standard distributed PageRank):
  ranks ⋈ edges on src   (hash shuffle on src)
  groupBy dst, SUM       (hash shuffle on dst; partial aggregation map-side)
  nodes left-join sums   (co-partitioned with the next iteration's src join)
K is fixed and small, so lineage stays shallow and no checkpoint barrier is
needed; a convergence-driven variant would localCheckpoint every ~5 rounds
exactly as operators/components.py does for pointer jumping. At 10^12
edges both shuffles are id+long only — the slimmest possible rows.

Dangling nodes (outdeg 0) would lose their mass here; the catalog caller
constructs a graph where every node emits a fixed number of links, so the
dangling-mass redistribution term of the original paper is intentionally
omitted. This is a documented input contract, not a runtime check (an
assertion would cost an extra action): a caller whose graph can dangle
must add the paper's redistribution term or accept the mass loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["RANK_SCALE", "HITS_SCALE", "pagerank", "hits"]

#: total rank mass in integer micro-units (1e12 ≪ 2^63 even after the
#: 85× damping multiply on a node that collects the whole graph's mass)
RANK_SCALE = 1_000_000_000_000

#: damping factor as an exact rational (85/100 = 0.85)
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(nodes: DataFrame, edges: DataFrame, *, iterations: int = 5) -> DataFrame:
    """Exact-integer PageRank.

    nodes: one row per vertex with columns (id, n_nodes) where n_nodes is
      the (constant) vertex count — callers that computed it once via a
      1-row broadcast cross join pass it through rather than re-counting.
    edges: (src, dst) rows; parallel edges are multi-edges (they contribute
      once each) and every src MUST appear (no dangling nodes — see module
      docstring).

    Returns (id, pr) with pr in int64 micro-units summing to ~RANK_SCALE.
    """
    # out-degree is static across iterations: compute once, co-partitioned
    # with the per-iteration src join (both hash on src). Both loop-invariant
    # frames are lazily localCheckpoint'ed (the components.py idiom): without
    # the cut, every iteration re-plans their whole subtree — measured as ~2
    # duplicate scans per iteration level once AQE converts the tiny-side
    # joins to broadcasts, which defeats ReuseExchange
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=False)

    base_expr = f"({DAMP_DEN - DAMP_NUM} * ({RANK_SCALE} div n_nodes)) div {DAMP_DEN}"
    base = nodes.select(
        F.col("id"), F.expr(base_expr).cast("long").alias("base")
    ).localCheckpoint(eager=False)

    ranks = nodes.select(
        F.col("id"), F.expr(f"{RANK_SCALE} div n_nodes").cast("long").alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            edges_deg.join(
                ranks.select(F.col("id").alias("src"), "pr"), "src"
            )
            .select(F.col("dst").alias("id"), F.expr("pr div outdeg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = base.join(contrib, "id", "left").select(
            "id",
            (
                F.col("base")
                + F.expr(f"({DAMP_NUM} * coalesce(s, 0L)) div {DAMP_DEN}")
            ).cast("long").alias("pr"),
        )
    return ranks


#: initial hub/authority mass per node for exact-integer HITS — small
#: enough that 3 alternating rounds at bounded degree stay far from int64
#: range (values grow ×(in_deg·out_deg) ≈ OUT_DEG² per round; 1e6 · 9³ ≈
#: 7.3e8 per node), large enough that integer reads keep 6+ significant
#: digits. A deployment running more rounds or fatter degrees lowers this
#: the same way RANK_SCALE is sized for PageRank.
HITS_SCALE = 1_000_000


def hits(nodes: DataFrame, edges: DataFrame, *, rounds: int = 3) -> DataFrame:
    """Exact-integer HITS (Kleinberg 1999, "Authoritative Sources in a
    Hyperlinked Environment").

    Alternating updates — ``auth_k(v) = Σ_{u→v} hub_{k-1}(u)`` then
    ``hub_k(u) = Σ_{u→v} auth_k(v)`` — with NO per-round normalization:
    every operation is an int64 sum, so the result is bit-identical under
    any partitioning/engine (the reason float HITS can't be value-hashed),
    and the fixed round count bounds the magnitude instead of a norm.
    Rankings are invariant to the omitted normalization; callers derive
    display-scale floats from the integer masses once at the end.

    nodes: (id) one row per vertex; edges: (src, dst) multigraph rows.
    Returns (id, auth, hub) in int64 mass units.

    Plan shape per half-step: scores ⋈ edges on one endpoint (hash
    shuffle) → groupBy the other endpoint (partial agg map-side) → left
    join back to nodes — the same slim id+long shuffles as pagerank().
    """
    if rounds < 1:
        raise ValueError("hits() needs rounds >= 1 (auth is undefined before the first update)")
    ids = nodes.select("id")
    hub = ids.select("id", F.lit(HITS_SCALE).cast("long").alias("hub"))
    auth = None
    for _ in range(rounds):
        contrib = (
            edges.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").cast("long").alias("s"))
        )
        auth = ids.join(
            contrib.withColumnRenamed("dst", "id"), "id", "left"
        ).select("id", F.coalesce("s", F.lit(0)).cast("long").alias("auth"))
        back = (
            edges.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").cast("long").alias("s"))
        )
        hub = ids.join(
            back.withColumnRenamed("src", "id"), "id", "left"
        ).select("id", F.coalesce("s", F.lit(0)).cast("long").alias("hub"))
    return auth.join(hub, "id")

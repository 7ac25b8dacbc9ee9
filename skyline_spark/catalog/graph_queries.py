"""Link-graph ranking over the synthetic web corpus.

``link_graph_pagerank`` — the classic web-corpus quality prior (Page et
al. 1999; Common Crawl publishes exactly this as its host-level ranking):
every document deterministically emits ``OUT_DEG`` outlinks derived from
the portable hash (``h32(doc_id ‖ ':j') mod N``), and PageRank runs for a
fixed ``PR_ITERS`` damped iterations. Demonstrates the third distributed
iterative pattern in the catalog next to pointer-jumping connected
components (``dedup_clusters``) and Lloyd's k-means (``kmeans_lloyd``):
a per-iteration (ranks ⋈ edges on src) → (groupBy dst) pair of slim
id+long shuffles.

House parity rules: ranks live in int64 micro-units of ``RANK_SCALE``
(``operators/graph.py``), every update is exact integer arithmetic
(order-independent, so Spark's partition-parallel sums and DuckDB's
single-threaded unrolled CTEs agree bit-for-bit); the one readability
double (``pr_norm``, mean-1 normalized) divides identical integers in
both engines under ``X.r6``. The oracle unrolls the ``PR_ITERS``
iterations as chained CTEs generated from the same constants.

Graph contract: the synthetic corpus has dense doc_ids 0..N-1, so every
hashed dst exists and no node dangles (each emits exactly OUT_DEG links);
contributions to a nonexistent id would be dropped by the final left join
identically in both engines. A production corpus would first pass a
dense-relabel (hash ids → zipWithIndex) map stage.

Reference analog: none — Skyline ranks nothing; this belongs to the
LLM-data-pipeline surface added on top of the reference's scope (quality
priors for crawl curation), alongside dedup, mixing, and selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as X
from ..operators.graph import DAMP_DEN, DAMP_NUM, RANK_SCALE, pagerank
from .registry import load, query
from .text_queries import _spread

#: outlinks emitted per document (hash-derived, multigraph: duplicate
#: targets and self-links are kept and contribute once per edge)
OUT_DEG = 3
#: fixed damped-iteration count (unrolled in the oracle)
PR_ITERS = 5


def _edges_values_sql() -> str:
    return ", ".join(f"({j})" for j in range(1, OUT_DEG + 1))


EDGE_SALT_FMT = "d.doc_id::VARCHAR || ':' || j.j::VARCHAR"


def _edge_dst_sql() -> str:
    '''The ONE hash-edge rule in SQL form: dst of (doc ``d``, outlink
    ``j``), over CTE ``n(n_nodes)``. Every oracle touching the link
    multigraph (PageRank, HITS, anchor aggregation) interpolates THIS
    string; the Spark twin is :func:`_edge_dst_exprs` — no query can
    silently rank or aggregate a different graph.'''
    return f"{X.h32_sql(EDGE_SALT_FMT)} % n.n_nodes"


def _edge_dst_exprs(id_col, n_col):
    '''Spark twin of :func:`_edge_dst_sql`: the OUT_DEG dst columns of one
    source node.'''
    return [
        (
            X.h32(F.concat(id_col.cast("string"), F.lit(f":{j}")))
            % n_col
        ).cast("long")
        for j in range(1, OUT_DEG + 1)
    ]


def _iteration_cte(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""r{k} AS (
  SELECT b.doc_id,
         (b.base + ({DAMP_NUM} * COALESCE(SUM(p.pr // ed.outdeg), 0)) // {DAMP_DEN})::BIGINT AS pr
  FROM b
  LEFT JOIN ed ON ed.dst = b.doc_id
  LEFT JOIN {prev} p ON p.doc_id = ed.src
  GROUP BY b.doc_id, b.base
)"""


_PAGERANK_ORACLE = (
    f"""WITH n AS (SELECT count(*)::BIGINT AS n_nodes FROM documents),
e AS (
  SELECT d.doc_id AS src,
         {_edge_dst_sql()} AS dst
  FROM documents d, n, (VALUES {_edges_values_sql()}) j(j)
),
deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
r0 AS (SELECT doc_id, ({RANK_SCALE} // n_nodes)::BIGINT AS pr FROM documents, n),
b AS (SELECT doc_id,
             (({DAMP_DEN - DAMP_NUM} * ({RANK_SCALE} // n_nodes)) // {DAMP_DEN})::BIGINT AS base
      FROM documents, n),
"""
    + ",\n".join(_iteration_cte(k) for k in range(1, PR_ITERS + 1))
    + f"""
SELECT r{PR_ITERS}.doc_id,
       r{PR_ITERS}.pr AS pr_int,
       {X.r6_sql(f"r{PR_ITERS}.pr / {RANK_SCALE}.0 * n.n_nodes")} AS pr_norm
FROM r{PR_ITERS}, n
ORDER BY doc_id
"""
)


def _hash_graph(spark: SparkSession, sf_dir: str):
    """The shared hash-derived link graph both ranking queries run on:
    (nodes, edges) with nodes = (id, n_nodes) localCheckpoint-cut (it feeds
    edge derivation, the iteration input, AND the final n_nodes re-join)
    and edges = h32(id ‖ ':j') % n_nodes for j in 1..OUT_DEG, ALSO cut —
    the iterative consumers reference edges 2×rounds times, and without
    the cut every half-step re-plans the hash+explode subtree. One
    definition so PageRank and HITS can never silently rank different
    graphs."""
    d = _spread(load(spark, sf_dir, "documents")).select("doc_id")
    n1 = d.agg(F.count("*").cast("long").alias("n_nodes"))
    nodes = (
        d.crossJoin(F.broadcast(n1))
        .select(F.col("doc_id").alias("id"), "n_nodes")
        .localCheckpoint(eager=False)
    )
    dsts = _edge_dst_exprs(F.col("id"), F.col("n_nodes"))
    edges = nodes.select(
        F.col("id").alias("src"), F.explode(F.array(*dsts)).alias("dst")
    ).localCheckpoint(eager=False)
    return nodes, edges


@query(
    "link_graph_pagerank",
    _PAGERANK_ORACLE,
    doc="link-graph PageRank quality prior (Page et al. 1999; the Common-"
        "Crawl host-ranking shape): hash-derived outlinks, 5 damped "
        "iterations of the (ranks ⋈ edges on src → groupBy dst) slim-shuffle "
        "pair, ranks in exact int64 fixed-point so partition-parallel sums "
        "are bit-identical to the oracle's unrolled CTEs",
)
def link_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _hash_graph(spark, sf_dir)
    pr = pagerank(nodes, edges, iterations=PR_ITERS)
    return (
        pr.join(nodes, "id")
        .select(
            F.col("id").alias("doc_id"),
            F.col("pr").alias("pr_int"),
            X.r6(F.col("pr") / F.lit(float(RANK_SCALE)) * F.col("n_nodes")).alias(
                "pr_norm"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities — the second link-graph prior
# ---------------------------------------------------------------------------

from ..operators.graph import HITS_SCALE, hits  # noqa: E402

#: alternating auth/hub rounds (unrolled in the oracle)
HITS_ROUNDS = 3


def _hits_auth_cte(k: int) -> str:
    return f"""a{k} AS (
  SELECT d.doc_id AS id, COALESCE(sum(h.hub), 0)::BIGINT AS auth
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN h{k - 1} h ON h.id = e.src
  GROUP BY 1
),
h{k} AS (
  SELECT d.doc_id AS id, COALESCE(sum(a.auth), 0)::BIGINT AS hub
  FROM documents d
  LEFT JOIN e ON e.src = d.doc_id
  LEFT JOIN a{k} a ON a.id = e.dst
  GROUP BY 1
)"""


_HITS_ORACLE = (
    f"""WITH n AS (SELECT count(*)::BIGINT AS n_nodes FROM documents),
e AS (
  SELECT d.doc_id AS src,
         {_edge_dst_sql()} AS dst
  FROM documents d, n, (VALUES {_edges_values_sql()}) j(j)
),
h0 AS (SELECT doc_id AS id, {HITS_SCALE}::BIGINT AS hub FROM documents),
"""
    + ",\n".join(_hits_auth_cte(k) for k in range(1, HITS_ROUNDS + 1))
    + f""",
tot AS (
  SELECT sum(a.auth)::BIGINT AS sa, sum(h.hub)::BIGINT AS sh
  FROM a{HITS_ROUNDS} a JOIN h{HITS_ROUNDS} h USING (id)
)
SELECT a.id AS doc_id,
       a.auth AS auth_int,
       h.hub AS hub_int,
       {X.r6_sql(f"a.auth / tot.sa::DOUBLE * n.n_nodes")} AS auth_norm,
       {X.r6_sql(f"h.hub / tot.sh::DOUBLE * n.n_nodes")} AS hub_norm
FROM a{HITS_ROUNDS} a JOIN h{HITS_ROUNDS} h USING (id), tot, n
ORDER BY doc_id
"""
)


@query(
    "link_graph_hits",
    _HITS_ORACLE,
    doc="HITS hubs & authorities (Kleinberg 1999) over the same hash-"
        f"derived link graph as PageRank: {HITS_ROUNDS} alternating exact-"
        "int64 rounds with NO per-round normalization (rankings are "
        "normalization-invariant; the fixed round count bounds magnitude), "
        "so partition-parallel sums are bit-identical to the oracle's "
        "unrolled CTEs; per half-step the plan is the same slim id+long "
        "(scores ⋈ edges → groupBy other endpoint) shuffle pair as "
        "pagerank; mean-1 normalized doubles derived once at the end",
)
def link_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = _hash_graph(spark, sf_dir)
    scores = hits(nodes, edges, rounds=HITS_ROUNDS)
    tot = scores.agg(
        F.sum("auth").cast("long").alias("sa"),
        F.sum("hub").cast("long").alias("sh"),
    )
    return (
        scores.join(nodes, "id")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("id").alias("doc_id"),
            F.col("auth").alias("auth_int"),
            F.col("hub").alias("hub_int"),
            X.r6(
                F.col("auth") / F.col("sa").cast("double") * F.col("n_nodes")
            ).alias("auth_norm"),
            X.r6(
                F.col("hub") / F.col("sh").cast("double") * F.col("n_nodes")
            ).alias("hub_norm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# anchor-text aggregation per link target
# ---------------------------------------------------------------------------
#
# The web-corpus signal search/quality stacks aggregate alongside PageRank:
# what do OTHER pages call this page? Anchor text per inbound link, rolled
# up per target — top anchor by (count desc, anchor asc), inlink mass,
# anchor diversity. Runs on the SAME hash-derived multigraph as PageRank/
# HITS (one definition, _hash_graph's edge rule), with each link's anchor
# = the source doc's first token (deterministic, SQL-expressible in both
# engines). Self-links count like any other edge (multigraph semantics).
#
# Scale shape: the anchor is computed IN the edge-derivation projection —
# one corpus scan, no docs⋈docs join; (dst, anchor) counts are the one
# shuffle (map-side partials), the per-dst argmax is the ngram_dup_rate
# window-then-rollup pattern. Targets with zero inbound links don't appear
# (hash multigraph leaves ~ (1-1/n)^(3n) ≈ 5% of ids unhit) — the consumer
# left-joins this as a feature table, absent = no anchors.

_ANCHOR_ORACLE = f"""
WITH n AS (SELECT count(*)::BIGINT AS n_nodes FROM documents),
links AS (
  SELECT {_edge_dst_sql()} AS dst,
         regexp_extract(lower(d.text), '^\\s*(\\S+)', 1) AS anchor
  FROM documents d, n, (VALUES {_edges_values_sql()}) j(j)
), cnt AS (
  SELECT dst, anchor, count(*)::BIGINT AS c FROM links GROUP BY dst, anchor
), ranked AS (
  SELECT dst, anchor, c,
         row_number() OVER (PARTITION BY dst ORDER BY c DESC, anchor) AS rk
  FROM cnt
)
SELECT dst AS doc_id,
       sum(c)::BIGINT AS n_inlinks,
       count(*)::BIGINT AS distinct_anchors,
       min(CASE WHEN rk = 1 THEN anchor END) AS top_anchor,
       max(CASE WHEN rk = 1 THEN c END)::BIGINT AS top_anchor_count
FROM ranked GROUP BY dst ORDER BY doc_id
"""


@query(
    "anchor_text_topk",
    _ANCHOR_ORACLE,
    doc="anchor-text aggregation per link target (the search/quality "
        "signal aggregated alongside PageRank): on the SAME hash-derived "
        "multigraph as link_graph_pagerank/hits, each inbound link carries "
        "the source doc's first token as its anchor; per target — inlink "
        "mass, anchor diversity, top anchor (count desc, anchor asc). "
        "Anchor computed in the edge-derivation projection: one corpus "
        "scan, NO docs-to-docs join, one (dst, anchor) shuffle with "
        "map-side partials, then the window-then-rollup argmax",
)
def anchor_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    n1 = d.agg(F.count("*").cast("long").alias("n_nodes"))
    anchor = F.regexp_extract(F.lower("text"), r"^\s*(\S+)", 1)
    dsts = _edge_dst_exprs(F.col("doc_id"), F.col("n_nodes"))
    links = (
        d.crossJoin(F.broadcast(n1))
        .select(anchor.alias("anchor"), F.explode(F.array(*dsts)).alias("dst"))
    )
    cnt = links.groupBy("dst", "anchor").agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("dst").orderBy(F.desc("c"), F.asc("anchor"))
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .groupBy("dst")
        .agg(
            F.sum("c").cast("long").alias("n_inlinks"),
            F.count("*").cast("long").alias("distinct_anchors"),
            F.min(F.when(F.col("rk") == 1, F.col("anchor"))).alias("top_anchor"),
            F.max(F.when(F.col("rk") == 1, F.col("c")))
            .cast("long")
            .alias("top_anchor_count"),
        )
        .select(
            F.col("dst").alias("doc_id"),
            "n_inlinks",
            "distinct_anchors",
            "top_anchor",
            "top_anchor_count",
        )
        .orderBy("doc_id")
    )

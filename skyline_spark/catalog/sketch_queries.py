"""Count-Min-Sketch heavy hitters — the streaming-counts member of the
mergeable-sketch family.

The checkpoint already carries two mergeable digests for VALUES (log-
histogram, bounded value error) and RANKS (Greenwald-Khanna, bounded rank
error); ``heavy_hitters_cms`` adds the classic one for COUNTS (Cormode &
Muthukrishnan 2005): a ``CMS_D x CMS_W`` grid of integer cells where cell
``(i, h_i(x))`` accumulates every occurrence of ``x``. Point estimate =
min over the D rows; always an OVERcount, and with probability
``1-(1/2)^D`` the overcount is at most ``(e/W)·N``. The grid is cell-wise
additive, so per-partition sketches merge by summing — the property that
lets a 10^12-token corpus build it in one scan with map-side partials
(D·W longs per partial), stream it incrementally, or union sketches
across crawls.

Like ``checkpoint_digest_quantiles``, the catalog query judges the sketch
against exact ground truth: estimate each of the TOP_K exact-top tokens
and emit the overcount plus a ``within_bound`` verdict against the ε·N
line (fixed-point integer comparison, no float). Everything is int64
arithmetic on the portable h32, so Spark's partition-parallel sums and
DuckDB's single-threaded CTEs agree bit-for-bit.

Scale shape: token-count agg (the one corpus-sized shuffle, shared with
the candidate top-K) → CMS grid as D probe rows per distinct token + hash
agg to ≤ D·W cells → the K audited candidates probe the (tiny, broadcast)
grid. At production scale the candidate set comes from the same counts
pass (or a previous crawl's hitters); the sketch itself never needs exact
counts — they are computed here BECAUSE the query's point is to audit the
sketch against them.

Reference analog: none — this extends the reference's scope alongside the
GK/log-histogram digests (SURVEY north-star "mergeable sketches").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as X
from .registry import load, query
from .text_queries import _spread

#: sketch depth (rows) — overcount-bound failure probability (1/2)^D
CMS_D = 4
#: sketch width (buckets per row) — overcount bound (e/W)·N
CMS_W = 64
#: audited heavy hitters (the exact top-K tokens by count, ties by token)
CMS_TOP_K = 24

#: ceil(e/W · 2^20): both engines check the probabilistic bound in fixed
#: point — overcount·2^20 <= EPS_FP·N  ⇔  overcount <= (e/W)·N — keeping
#: the verdict column pure integer arithmetic
EPS_FP = 44_561


def _bucket_sql(i: int, tok: str = "t") -> str:
    inner = f"{tok} || ':cms{i}'"
    return f"{X.h32_sql(inner)} % {CMS_W}"


def _probes_sql(src: str) -> str:
    """D rows per token of ``src`` (which must expose t, cnt): (t, cnt, i,
    bucket_i). Generated UNION ALL keeps the oracle plain ANSI."""
    return "\nUNION ALL\n".join(
        f"SELECT t, cnt, {i} AS i, {_bucket_sql(i)} AS bucket FROM {src}"
        for i in range(CMS_D)
    )


_CMS_ORACLE = f"""
WITH toks AS (
  SELECT t, count(*)::BIGINT AS cnt
  FROM documents, unnest({X.tokens_sql("text")}) AS u(t)
  GROUP BY t
),
total AS (SELECT sum(cnt)::BIGINT AS n FROM toks),
probes AS (
{_probes_sql("toks")}
),
cells AS (
  SELECT i, bucket, sum(cnt)::BIGINT AS cell FROM probes GROUP BY i, bucket
),
topk AS (
  SELECT t, cnt FROM toks ORDER BY cnt DESC, t LIMIT {CMS_TOP_K}
),
tprobes AS (
{_probes_sql("topk")}
),
est AS (
  SELECT tp.t, tp.cnt, min(c.cell)::BIGINT AS est
  FROM tprobes tp JOIN cells c ON c.i = tp.i AND c.bucket = tp.bucket
  GROUP BY tp.t, tp.cnt
)
SELECT est.t AS token,
       est.cnt AS exact_cnt,
       est.est AS est_cnt,
       (est.est - est.cnt)::BIGINT AS overcount,
       ((est.est - est.cnt) * 1048576 <= {EPS_FP} * total.n) AS within_bound
FROM est, total
ORDER BY exact_cnt DESC, token
"""


def _bucket_expr(i: int, tok: F.Column) -> F.Column:
    return F.pmod(X.h32(F.concat(tok, F.lit(f":cms{i}"))), F.lit(CMS_W))


@query(
    "heavy_hitters_cms",
    _CMS_ORACLE,
    doc="Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005): a "
        f"{CMS_D}x{CMS_W} int64 grid built in one pass (cell-wise additive "
        "→ map-side partials, mergeable across partitions/crawls like the "
        "checkpoint's GK/log-histogram digests), then the exact top-"
        f"{CMS_TOP_K} tokens are point-estimated (min over rows — always "
        "an overcount) and judged against the (e/W)·N bound in fixed-point "
        "integer arithmetic; the oracle rebuilds the identical grid from "
        "the same h32 row-hashes, so estimates match bit-for-bit",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load(spark, sf_dir, "documents")).select("text")
    # toks feeds three consumers (grid build, candidate top-K, the N total)
    # — cut the lineage once so the corpus scan + token agg run once instead
    # of once per consumer (same pattern as link_graph_pagerank's nodes cut)
    toks = (
        docs.select(F.explode(X.tokens_expr(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    total = toks.agg(F.sum("cnt").cast("long").alias("n"))

    def probes(src: DataFrame) -> DataFrame:
        rows = F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    _bucket_expr(i, F.col("t")).alias("bucket"),
                )
                for i in range(CMS_D)
            ]
        )
        return src.select(
            "t", "cnt", F.explode(rows).alias("p")
        ).select("t", "cnt", F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))

    cells = (
        probes(toks)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )
    topk = toks.orderBy(F.col("cnt").desc(), "t").limit(CMS_TOP_K)
    est = (
        probes(topk)
        .join(cells, ["i", "bucket"])
        .groupBy("t", "cnt")
        .agg(F.min("cell").cast("long").alias("est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            F.col("t").alias("token"),
            F.col("cnt").alias("exact_cnt"),
            F.col("est").alias("est_cnt"),
            (F.col("est") - F.col("cnt")).cast("long").alias("overcount"),
            (
                (F.col("est") - F.col("cnt")) * F.lit(1_048_576)
                <= F.lit(EPS_FP) * F.col("n")
            ).alias("within_bound"),
        )
        .orderBy(F.col("exact_cnt").desc(), "token")
    )

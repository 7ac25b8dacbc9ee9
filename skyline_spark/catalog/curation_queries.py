"""Corpus-curation operators from the published LLM-data-pipeline playbook:

- ``quality_classifier_score`` — fastText-style hashed linear classifier
  inference (the DCLM / FineWeb-Edu quality-filter shape: Joulin et al. 2017
  "Bag of Tricks for Efficient Text Classification"; model weights stand in
  as a deterministic fixture, the inference plumbing is real).
- ``ccnet_perplexity_buckets`` — CCNet-style LM-perplexity head/middle/tail
  bucketing (Wenzek et al. 2020 "CCNet: Extracting High Quality Monolingual
  Datasets from Web Crawl Data"): a bigram LM with add-one smoothing is
  trained on the corpus itself, every document is scored, and each language
  is split into perplexity terciles.
- ``semdedup_prune`` — SemDeDup semantic deduplication (Abbas et al. 2023
  "SemDeDup: Data-efficient learning at web-scale through semantic
  deduplication"): k-means-cluster the embedding space, then prune
  within-cluster near-duplicates by pairwise cosine, keeping the points
  farthest from their centroid first.
- ``curation_verdicts`` / ``curation_report`` — the four canonical stages
  (exact dedup → heuristic filters → classifier → per-language token
  budget) composed as ONE pass with per-doc stage verdicts as columns,
  plus the per-language funnel rollup a pipeline operator watches.

All of these follow the house parity rules: integer-valued intermediate sums
(associative, order-independent), one final double division, ``X.r6``
rounding, and the portable md5-based ``X.h32`` wherever pseudo-randomness is
needed — so the DuckDB oracles match hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as X
from .registry import load, query
from .text_queries import (
    KMEANS_A2_CTES,
    _cos_sql,
    kmeans_a2,
)

# ---------------------------------------------------------------------------
# quality_classifier_score — hashed-bag-of-words linear classifier inference
# ---------------------------------------------------------------------------

#: hashing-trick feature buckets (fastText's default is 2M bigram buckets;
#: scaled to the fixture corpus' 31-token vocabulary)
QCLF_BUCKETS = 1024
#: integer weight span: w(b) ∈ {-1000..1000}, interpreted /1000 — integer
#: per-token weights make the document sum EXACT and order-independent,
#: so both engines agree bit-for-bit with no fold-order pinning
QCLF_WSPAN = 2001

_QCLF_TOKS = X.tokens_sql("text")


def _qclf_weight_sql(tok: str) -> str:
    bucket = f"(({X.h32_sql(tok)}) % {QCLF_BUCKETS})"
    keyed = X.h32_sql("'qw:' || " + bucket + "::VARCHAR")
    return f"(({keyed}) % {QCLF_WSPAN} - 1000)"


_QCLF_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_QCLF_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(toks, t -> {_qclf_weight_sql('t')}::BIGINT)),
           (acc, x) -> acc + x) AS score_q
  FROM t
)
SELECT doc_id,
       n_tokens::BIGINT AS n_tokens,
       {X.r6_sql('score_q::DOUBLE / (1000.0 * nullif(n_tokens, 0))')} AS clf_score,
       score_q > 0 AS clf_keep
FROM s ORDER BY doc_id
"""


@query(
    "quality_classifier_score",
    _QCLF_ORACLE,
    doc="fastText-style quality-classifier inference (DCLM / FineWeb-Edu "
        "filtering stage): hashing-trick bag-of-words — token → "
        f"h32 % {QCLF_BUCKETS} bucket → integer weight "
        f"(h32('qw:'||bucket) % {QCLF_WSPAN} − 1000)/1000 — summed per "
        "document, kept iff the mean weight is positive. The weight table "
        "is a deterministic md5 fixture standing in for trained parameters "
        "(both engines re-derive each weight in-expression; a real model "
        "would broadcast its weight array into the same plan shape). "
        "ZERO-shuffle: score and verdict are computed inside one projection "
        "over the scan via transform/aggregate higher-order functions — at "
        "100 TB this is a pure map stage, whole-stage-codegen'd, with "
        "nothing but the scan's own partitioning. Integer per-token weights "
        "keep the document sum exact and order-independent (the same trick "
        "the k-means recenter uses), so no fold-order pinning is needed",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = X.tokens_expr(F.col("text"))

    def w_of(t):
        bucket = (X.h32(t) % QCLF_BUCKETS).cast("string")
        return (
            X.h32(F.concat(F.lit("qw:"), bucket)) % QCLF_WSPAN - 1000
        ).cast("long")

    score_q = F.aggregate(
        F.transform(toks, w_of), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n = F.size(toks).cast("long")
    return (
        d.select("doc_id", n.alias("_nt"), score_q.alias("_sq"))
        .select(
            "doc_id",
            F.col("_nt").alias("n_tokens"),
            X.r6(
                F.col("_sq").cast("double")
                / (F.lit(1000.0) * F.nullif(F.col("_nt"), F.lit(0)).cast("double"))
            ).alias("clf_score"),
            (F.col("_sq") > 0).alias("clf_keep"),
        )
    )


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets — self-trained bigram LM, per-language terciles
# ---------------------------------------------------------------------------

#: LM vocabulary: top-V unigrams by corpus frequency (ties to the lexically
#: smaller token); everything else maps to <unk>. The fixture corpus has 31
#: distinct tokens, so V=24 genuinely exercises the OOV path. CCNet proper
#: uses a SentencePiece vocab + KenLM 5-gram; the bigram restatement keeps
#: the same shape (train on text → score every doc → bucket per language).
CCNET_V = 24
#: add-one smoothing denominator offset = |vocab ∪ {<unk>}|
CCNET_SMOOTH = CCNET_V + 1
#: fixed-point scale for per-bigram log-probs: lp_q = floor(ln(p)·2^20 + 0.5)
#: — summing INTEGER lp_q per doc is exact and order-independent; the only
#: cross-engine freedom left is libm ln's final ulp, which would have to
#:   land within ~1e-16 of a 2^-20 boundary to flip a floor (never observed;
#:   the binned-entropy tsfresh oracle relies on the same ln+round bound)
CCNET_Q = 1 << 20

_CCNET_TOKS = X.tokens_sql("text")

_CCNET_ORACLE = f"""
WITH t0 AS (
  SELECT doc_id, lang, {_CCNET_TOKS} AS toks FROM documents
), t AS (
  SELECT * FROM t0 WHERE len(toks) >= 2
), p AS (
  SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
), v AS (
  SELECT w FROM (SELECT unnest(toks) AS w FROM t)
  GROUP BY w ORDER BY count(*) DESC, w LIMIT {CCNET_V}
), m AS (
  SELECT doc_id, lang,
         CASE WHEN w1 IN (SELECT w FROM v) THEN w1 ELSE '<unk>' END AS v1,
         CASE WHEN w2 IN (SELECT w FROM v) THEN w2 ELSE '<unk>' END AS v2
  FROM p
), c12 AS (
  SELECT v1, v2, count(*) AS c12 FROM m GROUP BY v1, v2
), c1 AS (
  SELECT v1, sum(c12) AS c1 FROM c12 GROUP BY v1
), lm AS (
  SELECT c12.v1, c12.v2,
         CAST(floor(ln((c12.c12 + 1.0) / (c1.c1 + {CCNET_SMOOTH}.0))
                    * {CCNET_Q}.0 + 0.5) AS BIGINT) AS lp_q
  FROM c12 JOIN c1 USING (v1)
), s AS (
  SELECT m.doc_id, m.lang, count(*) AS n, sum(lm.lp_q) AS sl
  FROM m JOIN lm ON m.v1 = lm.v1 AND m.v2 = lm.v2
  GROUP BY m.doc_id, m.lang
), b AS (
  SELECT doc_id, lang, n, sl,
         ntile(3) OVER (
           PARTITION BY lang
           ORDER BY (-sl)::DOUBLE / ({CCNET_Q}.0 * n) ASC, doc_id
         ) AS tercile
  FROM s
)
SELECT doc_id, lang,
       n::BIGINT AS n_bigrams,
       {X.r6_sql(f'(-sl)::DOUBLE / ({CCNET_Q}.0 * n)')} AS nll_rate,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM b ORDER BY doc_id
"""


@query(
    "ccnet_perplexity_buckets",
    _CCNET_ORACLE,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): a bigram LM "
        f"with add-one smoothing over the top-{CCNET_V} unigram vocabulary "
        "(+<unk>) is trained on the corpus, every document is scored by its "
        "mean negative log-prob per bigram, and each language is split into "
        "head/middle/tail terciles (head = lowest perplexity, the slice "
        "CCNet keeps). Reported as nll_rate, not exp(nll_rate): x→exp(x) is "
        "monotone so the buckets are identical, and pure-rational outputs "
        "stay bit-portable (same reasoning as text_tfidf_topk's un-logged "
        "IDF). Scale shape: pass 1 trains the LM — unigram top-V is a "
        "TakeOrderedAndProject over the distinct-token partial aggregate, "
        f"the bigram table is capped at (V+1)² = {(CCNET_V + 1) ** 2} rows — "
        "pass 2 scores with the whole LM BROADCAST (two vocab joins + one "
        "LM join, all broadcast-hash); each doc's exploded bigrams stay in "
        "the scan partition, so the per-doc groupBy partial-aggregates to "
        "one row per doc before its single shuffle. The per-lang ntile is "
        "exact (matches the oracle); at 10^12 docs you'd swap it for GK-"
        "digest tercile cut points (operators/gk.py) at the cost of "
        "approximate boundaries. Per-bigram log-probs are floor-quantized "
        "to 2^-20 integers so document sums are exact in any order",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", X.tokens_expr(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 2)

    bi = F.zip_with(
        F.expr("slice(toks, 1, size(toks) - 1)"),
        F.expr("slice(toks, 2, size(toks) - 1)"),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = t.select("doc_id", "lang", F.explode(bi).alias("bg")).select(
        "doc_id", "lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )

    uni = t.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    # vocab and LM are tiny (V and ≤(V+1)² rows) but their lineage re-scans
    # and re-tokenizes the corpus; localCheckpoint barriers pin each to ONE
    # corpus pass — train-vocab, train-LM, score = 3 scans total, the same
    # staged-materialization pattern text_tfidf_topk uses
    vocab = (
        uni.orderBy(F.col("c").desc(), "w")
        .limit(CCNET_V)
        .select("w", F.lit(True).alias("in_v"))
        .localCheckpoint()
    )

    mapped = (
        pairs.join(
            F.broadcast(vocab.select(F.col("w").alias("w1"), F.col("in_v").alias("i1"))),
            "w1", "left")
        .join(
            F.broadcast(vocab.select(F.col("w").alias("w2"), F.col("in_v").alias("i2"))),
            "w2", "left")
        .select(
            "doc_id", "lang",
            F.when(F.col("i1"), F.col("w1")).otherwise(F.lit("<unk>")).alias("v1"),
            F.when(F.col("i2"), F.col("w2")).otherwise(F.lit("<unk>")).alias("v2"),
        )
    )

    c12 = mapped.groupBy("v1", "v2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("v1").agg(F.sum("c12").alias("c1"))
    lm = c12.join(c1, "v1").select(
        "v1", "v2",
        F.floor(
            F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.lit(float(CCNET_SMOOTH))))
            * F.lit(float(CCNET_Q)) + F.lit(0.5)
        ).cast("long").alias("lp_q"),
    ).localCheckpoint()

    s = (
        mapped.join(F.broadcast(lm), ["v1", "v2"])
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n"), F.sum("lp_q").alias("sl"))
    )
    nll = (-F.col("sl")).cast("double") / (F.lit(float(CCNET_Q)) * F.col("n"))
    w_t = Window.partitionBy("lang").orderBy(nll.asc(), F.col("doc_id"))
    return (
        s.withColumn("tercile", F.ntile(3).over(w_t))
        .select(
            "doc_id", "lang",
            F.col("n").cast("long").alias("n_bigrams"),
            X.r6(nll).alias("nll_rate"),
            F.when(F.col("tercile") == 1, F.lit("head"))
            .when(F.col("tercile") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# semdedup_prune — cluster-then-prune semantic dedup over the embedding space
# ---------------------------------------------------------------------------

#: within-cluster cosine above which the later-ranked point is pruned.
#: SemDeDup's production ε targets cosine ≈ 0.95 on real text embeddings;
#: the synthetic fixture vectors are near-orthogonal (within-cluster pair
#: cosine: median 0.05, p95 0.25, max 0.51 at sf0.01), so — same precedent
#: as EMB_COS_DUP_T — the fixture threshold is scaled to 0.35 to keep the
#: checked output non-vacuous (~16% pruned).
SEMDEDUP_TAU = 0.35

_SEMDEDUP_ORACLE = f"""
WITH {KMEANS_A2_CTES}, ranked AS (
  SELECT vec_id, cluster, q, cos,
         row_number() OVER (
           PARTITION BY cluster ORDER BY cos ASC NULLS LAST, vec_id
         ) AS r
  FROM a2
), dup AS (
  SELECT s.vec_id, min(o.vec_id) AS dup_of
  FROM ranked s JOIN ranked o
    ON s.cluster = o.cluster AND o.r < s.r
  WHERE {_cos_sql('s.q', 'o.q')} >= {SEMDEDUP_TAU}
  GROUP BY s.vec_id
)
SELECT rk.vec_id,
       rk.cluster::BIGINT AS cluster,
       rk.r::BIGINT AS keep_rank,
       {X.r6_sql('rk.cos')} AS centroid_cos,
       d.dup_of IS NOT NULL AS pruned,
       d.dup_of
FROM ranked rk LEFT JOIN dup d USING (vec_id)
ORDER BY rk.vec_id
"""


def _semdedup_cluster_kernel(pdf):
    """Per-cluster SemDeDup prune — the paper's own per-cluster numpy shape.

    Rank = (centroid_cos ASC NULLS LAST, vec_id), i.e. farthest-from-centroid
    kept first; a point's ``dup_of`` is the smallest vec_id among
    EARLIER-ranked cluster-mates within cosine ≥ τ, else the -1 sentinel
    (mapped to NULL outside — Arrow would otherwise round-trip NULL as NaN).

    Engine-portable by construction: the quantized components are integers
    ≤ 2^20, so every pairwise dot is an integer ≤ 64·2^40 < 2^53 — EXACT in
    float64 under ANY summation order, which is what lets the O(c²) leg run
    as one BLAS matmul instead of 3c² interpreted 64-element SQL folds
    (measured 17 s → sub-second at sf0.1 for the join form vs this kernel).
    sqrt and division are IEEE-correctly-rounded, so cosines match the
    oracle bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["q"]])
    vid = pdf["vec_id"].to_numpy(dtype=np.int64)
    cos_c = pd.to_numeric(pdf["cos"]).to_numpy(dtype=np.float64)

    # rank: centroid-cos ASC with NULL(NaN)s last, vec_id tiebreak
    nan_last = np.where(np.isnan(cos_c), np.inf, cos_c)
    order = np.lexsort((vid, nan_last))
    r = np.empty(len(vid), dtype=np.int64)
    r[order] = np.arange(1, len(vid) + 1)

    dots = q @ q.T
    norms = np.sqrt(np.diag(dots).copy())
    denom = np.outer(norms, norms)
    cos_p = np.where(denom > 0.0, dots / np.where(denom > 0.0, denom, 1.0), -np.inf)

    dup = np.full(len(vid), -1, dtype=np.int64)
    ge = cos_p >= SEMDEDUP_TAU
    for i in range(len(vid)):
        mask = ge[i] & (r < r[i])
        if mask.any():
            dup[i] = vid[mask].min()

    # NULL centroid-cos (zero vectors) arrives as NaN through Arrow; send it
    # back as a true None so Spark sees NULL again, not NaN
    cos_out = pdf["cos"].astype(object).where(pd.notna(pdf["cos"]), None)
    return pd.DataFrame(
        {
            "vec_id": vid,
            "cluster": pdf["cluster"].to_numpy(dtype=np.int64),
            "r": r,
            "cos": cos_out.to_numpy(),
            "dup_of": dup,
        }
    )


@query(
    "semdedup_prune",
    _SEMDEDUP_ORACLE,
    doc="SemDeDup (Abbas et al. 2023): embeddings are k-means-clustered "
        "(the exact kmeans_lloyd assignment — both queries share one CTE/"
        "builder), then inside each cluster points are ranked farthest-from-"
        "centroid-first (SemDeDup keeps low centroid-similarity points) and "
        f"a point is pruned iff some earlier-ranked cluster-mate sits within "
        f"cosine ≥ {SEMDEDUP_TAU} (one-pass leader variant of the greedy "
        "chain, deterministic and engine-portable; dup_of names the "
        "earliest such leader). Scale shape — the paper's own: ONE hash "
        "shuffle on cluster id into a grouped-map Arrow kernel that does "
        "the O(c²) pairwise leg as a single exact integer-dot matmul "
        "(quantized dots < 2^53 are order-independent in float64, so BLAS "
        "agrees with the oracle's SQL fold bit-for-bit); work is never "
        "cross-cluster, and SemDeDup's regime grows K with corpus size so "
        "c stays bounded (50k clusters at LAION scale in the paper). The "
        "join restatement of the same rule is the DuckDB oracle",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    a2 = kmeans_a2(spark, sf_dir, keep_q=True)
    pruned = a2.groupBy("cluster").applyInPandas(
        _semdedup_cluster_kernel,
        "vec_id long, cluster long, r long, cos double, dup_of long",
    )
    return pruned.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        F.col("r").cast("long").alias("keep_rank"),
        X.r6(F.col("cos")).alias("centroid_cos"),
        (F.col("dup_of") >= 0).alias("pruned"),
        F.when(F.col("dup_of") >= 0, F.col("dup_of")).alias("dup_of"),
    )


# ---------------------------------------------------------------------------
# one-pass curation pipeline: dedup → heuristics → classifier → token budget
# ---------------------------------------------------------------------------

#: per-language token quota for the final budget stage (greedy hash-ordered
#: prefix, the mixture_token_budget rule). Sized so the fixture corpus
#: genuinely truncates some languages and not others.
CURATE_TOKENS_PER_LANG = 2000


def _curate_ctes() -> str:
    from .text_queries import (
        DUP_3GRAM_FRAC_T,
        FILTER_MIN_QUALITY,
        FILTER_MIN_TOKENS,
        _DUP3_SQL,
    )

    toks = X.tokens_sql("text")
    clf_sum = (
        "list_reduce(list_prepend(0::BIGINT, list_transform(t, tk -> "
        + _qclf_weight_sql("tk")
        + "::BIGINT)), (acc, x) -> acc + x)"
    )
    order_h = X.h32_sql("'curate:' || doc_id::VARCHAR")
    return f"""
tok AS (
  SELECT doc_id, lang, md5(text) AS th, text, {toks} AS t FROM documents
), sig AS (
  SELECT doc_id, lang, th,
         len(t)::BIGINT AS n_tokens,
         {X.quality_score_sql('text')} AS quality,
         {_DUP3_SQL} AS dup3,
         {clf_sum} AS score_q
  FROM tok
), flg AS (
  SELECT doc_id, lang, n_tokens,
         doc_id = min(doc_id) OVER (PARTITION BY th) AS dedup_keep,
         (n_tokens >= {FILTER_MIN_TOKENS} AND quality >= {FILTER_MIN_QUALITY}
          AND dup3 <= {DUP_3GRAM_FRAC_T}) AS filter_keep,
         score_q > 0 AS clf_keep
  FROM sig
), pre AS (
  SELECT *, (dedup_keep AND filter_keep AND clf_keep) AS survives
  FROM flg
), cum AS (
  SELECT *,
         sum(CASE WHEN survives THEN n_tokens ELSE 0 END) OVER (
           PARTITION BY lang ORDER BY {order_h}, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
  FROM pre
), verdicts AS (
  SELECT doc_id, lang, n_tokens, dedup_keep, filter_keep, clf_keep,
         (survives AND ct <= {CURATE_TOKENS_PER_LANG}) AS kept,
         CASE WHEN survives THEN ct END AS tokens_cum
  FROM cum
)"""


_CURATE_VERDICTS_ORACLE = f"""
WITH {_curate_ctes()}
SELECT * FROM verdicts ORDER BY doc_id
"""

_CURATE_REPORT_ORACLE = f"""
WITH {_curate_ctes()}
SELECT lang,
       count(*)::BIGINT AS docs_total,
       count(*) FILTER (dedup_keep)::BIGINT AS after_dedup,
       count(*) FILTER (dedup_keep AND filter_keep)::BIGINT AS after_filter,
       count(*) FILTER (dedup_keep AND filter_keep AND clf_keep)::BIGINT
         AS after_classifier,
       count(*) FILTER (kept)::BIGINT AS kept_docs,
       coalesce(sum(n_tokens) FILTER (kept), 0)::BIGINT AS kept_tokens
FROM verdicts GROUP BY lang ORDER BY lang
"""


def _curate_verdicts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared one-pass plan behind curation_verdicts/curation_report."""
    from pyspark.sql import Window

    from .text_queries import (
        DUP_3GRAM_FRAC_T,
        FILTER_MIN_QUALITY,
        FILTER_MIN_TOKENS,
        _dupf_expr,
        _tgs_expr,
    )

    d = load(spark, sf_dir, "documents")
    # bind toks / 3-grams into their own columns first: inlined higher-order
    # lambdas re-evaluate the split per element (same O(tokens²) trap
    # filter_pipeline documents); text is projected AWAY right after the
    # dedup hash is taken, so the two window shuffles carry slim rows
    tok = d.select(
        "doc_id", "lang",
        F.md5(F.col("text")).alias("th"),
        X.tokens_expr(F.col("text")).alias("toks"),
    )
    tg = tok.select("doc_id", "lang", "th", "toks",
                    _tgs_expr(F.col("toks")).alias("tgs"))

    def w_of(t):
        bucket = (X.h32(t) % QCLF_BUCKETS).cast("string")
        return (
            X.h32(F.concat(F.lit("qw:"), bucket)) % QCLF_WSPAN - 1000
        ).cast("long")

    sig = tg.select(
        "doc_id", "lang", "th",
        F.size("toks").cast("long").alias("n_tokens"),
        X.quality_score_from_tokens_expr(F.col("toks")).alias("quality"),
        _dupf_expr(F.col("tgs")).alias("dup3"),
        F.aggregate(
            F.transform(F.col("toks"), w_of),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score_q"),
    )
    w_d = Window.partitionBy("th")
    flg = sig.select(
        "doc_id", "lang", "n_tokens",
        (F.col("doc_id") == F.min("doc_id").over(w_d)).alias("dedup_keep"),
        (
            (F.col("n_tokens") >= FILTER_MIN_TOKENS)
            & (F.col("quality") >= FILTER_MIN_QUALITY)
            & (F.col("dup3") <= DUP_3GRAM_FRAC_T)
        ).alias("filter_keep"),
        (F.col("score_q") > 0).alias("clf_keep"),
    )
    pre = flg.withColumn(
        "survives",
        F.col("dedup_keep") & F.col("filter_keep") & F.col("clf_keep"),
    )
    order_h = X.h32(F.concat(F.lit("curate:"), F.col("doc_id").cast("string")))
    w_b = (
        Window.partitionBy("lang")
        .orderBy(order_h, F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pre.withColumn(
        "ct",
        F.sum(F.when(F.col("survives"), F.col("n_tokens")).otherwise(0)).over(w_b),
    )
    return cum.select(
        "doc_id", "lang", "n_tokens", "dedup_keep", "filter_keep", "clf_keep",
        (F.col("survives") & (F.col("ct") <= CURATE_TOKENS_PER_LANG)).alias("kept"),
        F.when(F.col("survives"), F.col("ct")).alias("tokens_cum"),
    )


@query(
    "curation_verdicts",
    _CURATE_VERDICTS_ORACLE,
    doc="the full curation pipeline as ONE pass with per-doc verdicts: "
        "exact dedup (keeper = min doc_id per md5), heuristic filters "
        "(min-tokens / quality floor / 3-gram repetition cap — the "
        "filter_pipeline gates sans the language gate, since curation keeps "
        "the multilingual corpus and the budget stage is per-language), "
        "quality-classifier keep (score_q > 0), then a per-language token "
        "budget (greedy hash-ordered prefix, the mixture_token_budget "
        "rule). Every stage verdict is a COLUMN, so stage composition costs "
        "nothing extra: one scan, one projection computing every signal "
        "(tokens bound once), then exactly two slim shuffles — the dedup "
        "window on md5(text) and the budget window on lang — with the text "
        "column projected away before either. The budget cumsum runs over "
        "ALL rows with non-survivors contributing 0, so survivor prefix "
        "sums equal the survivors-only ladder without a separate "
        "filter+join. At 10^12 docs the per-lang window is the bottleneck; "
        "the two-phase bucket plan in mixture_token_budget is the drop-in "
        "replacement (documented there) — this query favors the exactly-"
        "oracle-able single-window form",
)
def curation_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _curate_verdicts_df(spark, sf_dir)


@query(
    "curation_report",
    _CURATE_REPORT_ORACLE,
    doc="per-language funnel accounting over curation_verdicts: docs "
        "surviving each stage prefix (dedup → +filters → +classifier → "
        "+token budget) plus kept-token mass — the corpus-datasheet rollup "
        "a pipeline operator watches. Same one-pass plan as "
        "curation_verdicts with one extra tiny aggregation (one row per "
        "language)",
)
def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _curate_verdicts_df(spark, sf_dir)
    cnt = lambda c: F.count(F.when(c, True))  # noqa: E731
    return v.groupBy("lang").agg(
        F.count("*").cast("long").alias("docs_total"),
        cnt(F.col("dedup_keep")).cast("long").alias("after_dedup"),
        cnt(F.col("dedup_keep") & F.col("filter_keep")).cast("long")
        .alias("after_filter"),
        cnt(
            F.col("dedup_keep") & F.col("filter_keep") & F.col("clf_keep")
        ).cast("long").alias("after_classifier"),
        cnt(F.col("kept")).cast("long").alias("kept_docs"),
        F.coalesce(
            F.sum(F.when(F.col("kept"), F.col("n_tokens"))), F.lit(0)
        ).cast("long").alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# gopher_quality_rules — the published Gopher rule battery (adapted bounds)
# ---------------------------------------------------------------------------
#
# Rae et al. 2021 ("Scaling Language Models: ... Gopher") appendix A docu-
# ments the rule battery most production pipelines (MassiveText, RefinedWeb,
# FineWeb) start from: word-count bounds, mean-word-length bounds, a minimum
# stop-word presence, a minimum alphabetic-word fraction, and repetition
# caps. Bounds are adapted to this fixture corpus (docs are 20-80 words) and
# the line-based rules (bullet/ellipsis line fractions) are N/A on the
# single-line fixture — documented, not silently passed. Every verdict is
# an INTEGER cross-multiplication (5*top_cnt <= ntok, not top_cnt/ntok <=
# 0.2), so both engines compare exact ints and the booleans cannot drift.

GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 5000
GOPHER_MEAN_LEN_LO = 3     # mean word length in [3, 10]
GOPHER_MEAN_LEN_HI = 10
GOPHER_MIN_STOPWORDS = 2   # Gopher: at least 2 stop words present
GOPHER_ALPHA_NUM = 4       # alpha_cnt/ntok >= 4/5
GOPHER_ALPHA_DEN = 5
GOPHER_TOP_FRAC_DEN = 5    # top_cnt/ntok <= 1/5

_GQ_TOKS = X.tokens_sql("text")

_GQ_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, source, {_GQ_TOKS} AS tk FROM documents
), t AS (
  SELECT doc_id, lang, source,
         len(tk)::BIGINT AS ntok,
         list_sum(list_transform(tk, x -> length(x)))::BIGINT AS sum_wlen,
         len(list_filter(tk, x -> list_contains({X._stop_list_sql()}, x)))::BIGINT
           AS stop_cnt,
         len(list_filter(tk, x -> regexp_matches(x, '^[a-z]+$')))::BIGINT
           AS alpha_cnt
  FROM toks
), topw AS (
  SELECT doc_id, max(cnt)::BIGINT AS top_cnt
  FROM (
    SELECT doc_id, u.t, count(*) AS cnt
    FROM toks, unnest(tk) AS u(t) GROUP BY doc_id, u.t
  ) GROUP BY doc_id
), r AS (
  SELECT t.*, coalesce(w.top_cnt, 0) AS top_cnt,
    (t.ntok BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS r_words,
    (t.sum_wlen >= {GOPHER_MEAN_LEN_LO} * t.ntok
     AND t.sum_wlen <= {GOPHER_MEAN_LEN_HI} * t.ntok) AS r_mean_len,
    (t.stop_cnt >= {GOPHER_MIN_STOPWORDS}) AS r_stopwords,
    ({GOPHER_ALPHA_DEN} * t.alpha_cnt >= {GOPHER_ALPHA_NUM} * t.ntok) AS r_alpha,
    ({GOPHER_TOP_FRAC_DEN} * coalesce(w.top_cnt, 0) <= t.ntok) AS r_repetition
  FROM t LEFT JOIN topw w USING (doc_id)
)
SELECT doc_id, lang, source, ntok AS n_words,
       {X.r6_sql('sum_wlen / greatest(ntok, 1)')} AS mean_word_len,
       stop_cnt, top_cnt,
       r_words, r_mean_len, r_stopwords, r_alpha, r_repetition,
       (r_words AND r_mean_len AND r_stopwords AND r_alpha AND r_repetition)
         AS keep
FROM r ORDER BY doc_id
"""


@query(
    "gopher_quality_rules",
    _GQ_SQL,
    doc="the Gopher rule battery (Rae et al. 2021 appendix A — the filter "
        "set MassiveText/RefinedWeb/FineWeb derive from): word-count "
        "bounds, mean-word-length bounds, minimum stop-word presence, "
        "alphabetic-word fraction, top-word repetition cap; bounds adapted "
        "to the fixture corpus and line-based rules documented N/A; every "
        "verdict is an integer cross-multiplication so the booleans are "
        "bit-exact cross-engine; one token explode + per-doc mode is the "
        "only shuffle — pure map otherwise at any corpus size",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", "source", X.tokens_expr(F.col("text")).alias("tk")
    ).localCheckpoint(eager=False)
    t = toks.select(
        "doc_id", "lang", "source",
        F.size("tk").cast("long").alias("ntok"),
        F.aggregate(
            F.transform("tk", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_wlen"),
        F.size(
            F.filter("tk", lambda x: F.array_contains(F.lit(X.STOPWORDS), x))
        ).cast("long").alias("stop_cnt"),
        F.size(
            F.filter("tk", lambda x: x.rlike("^[a-z]+$"))
        ).cast("long").alias("alpha_cnt"),
    )
    topw = (
        toks.select("doc_id", F.explode("tk").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").cast("long").alias("top_cnt"))
    )
    r = t.join(topw, "doc_id", "left").withColumn(
        "top_cnt", F.coalesce("top_cnt", F.lit(0).cast("long"))
    )
    r_words = F.col("ntok").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_mean = (F.col("sum_wlen") >= GOPHER_MEAN_LEN_LO * F.col("ntok")) & (
        F.col("sum_wlen") <= GOPHER_MEAN_LEN_HI * F.col("ntok")
    )
    r_stop = F.col("stop_cnt") >= GOPHER_MIN_STOPWORDS
    r_alpha = (
        GOPHER_ALPHA_DEN * F.col("alpha_cnt") >= GOPHER_ALPHA_NUM * F.col("ntok")
    )
    r_rep = GOPHER_TOP_FRAC_DEN * F.col("top_cnt") <= F.col("ntok")
    return r.select(
        "doc_id", "lang", "source",
        F.col("ntok").alias("n_words"),
        X.r6(F.col("sum_wlen") / F.greatest(F.col("ntok"), F.lit(1))).alias(
            "mean_word_len"
        ),
        "stop_cnt", "top_cnt",
        r_words.alias("r_words"),
        r_mean.alias("r_mean_len"),
        r_stop.alias("r_stopwords"),
        r_alpha.alias("r_alpha"),
        r_rep.alias("r_repetition"),
        (r_words & r_mean & r_stop & r_alpha & r_rep).alias("keep"),
    ).orderBy("doc_id")

"""Data-selection operators from the published LLM-pipeline playbook:

- ``dsir_select`` — DSIR importance resampling (Xie et al. 2023, "Data
  Selection for Language Models via Importance Resampling"): hashed
  bag-of-words unigram features, a target-vs-raw importance weight per
  document (sum of per-bucket log probability ratios), and a per-language
  top-K selection of the highest-weight documents.
- ``pack_context_windows`` — GPT-style concat-and-chunk sequence packing:
  documents are deterministically shuffled into shards, concatenated in
  shard order, and chopped at a fixed context-window token budget; each
  document reports the window span it lands in and whether it straddles a
  window boundary (the quantity packing-efficiency studies track).
- ``bloom_novelty`` — approximate-membership novelty check: a Bloom filter
  built over the "seen" half of the corpus is probed by the other half,
  with exact-hash ground truth carried alongside so every probe's
  false-positive status is explicit (the streaming-dedup-against-history
  shape a 10^12-doc ingest pipeline runs before full MinHash dedup).

House parity rules apply throughout: the portable md5-based ``X.h32``
everywhere pseudo-randomness or feature hashing is needed, INTEGER
intermediate sums (order-independent, exact), log values floor-quantized to
2^-20 fixed-point before summing (same bound as ccnet_perplexity_buckets),
one final double division under ``X.r6`` — so the DuckDB oracles match
hash-for-hash.

Reference analog: Skyline has no selection/packing layer (every metric is
analyzed every sweep, `analyzer/analyzer.py`); these belong to the
LLM-data-pipeline surface this engine adds on top of the reference's scope,
alongside dedup, mixing, and decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import text as X
from ..operators.mixture import cap_per_key
from .registry import load, query
from .text_queries import _spread

# ---------------------------------------------------------------------------
# dsir_select — hashed n-gram importance resampling
# ---------------------------------------------------------------------------

#: hashing-trick feature buckets (DSIR's paper setup is 10k buckets over
#: uni+bigrams; scaled to the fixture corpus' vocabulary)
DSIR_BUCKETS = 512
#: deterministic stand-in for the given target dataset: docs with
#: h32('tgt:'||doc_id) % DSIR_TGT_MOD == 0 (~20% of the corpus). A real run
#: would point this at e.g. Wikipedia; the estimator is identical.
DSIR_TGT_MOD = 5
#: per-language selection size (top-K by importance weight)
DSIR_K = 30
#: fixed-point scale for per-bucket log-ratios (2^-20, the ccnet bound)
DSIR_Q = 1 << 20
#: salt fan-out of the exact two-phase per-language top-K
DSIR_SALTS = 8

_DSIR_TOKS = X.tokens_sql("text")


def _dsir_bucket_sql(tok: str) -> str:
    hashed = X.h32_sql(f"concat('dsir:', {tok})")
    return f"(({hashed}) % {DSIR_BUCKETS})"


_DSIR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, {_DSIR_TOKS} AS toks FROM documents
), t1 AS (
  SELECT doc_id, lang, toks,
         ({X.h32_sql("concat('tgt:', doc_id::VARCHAR)")} % {DSIR_TGT_MOD} = 0)
           AS is_tgt
  FROM t WHERE len(toks) >= 1
), e AS (
  SELECT doc_id, lang, is_tgt, {_dsir_bucket_sql('u.tok')} AS bucket
  FROM t1, unnest(toks) AS u(tok)
), raw AS (
  SELECT bucket, count(*) AS cr,
         count(*) FILTER (WHERE is_tgt) AS ct
  FROM e GROUP BY bucket
), tot AS (
  SELECT sum(cr) AS nr, sum(ct) AS nt FROM raw
), lr AS (
  SELECT raw.bucket,
         CAST(floor(ln(((raw.ct + 1.0) * (tot.nr + {DSIR_BUCKETS}))
                       / ((raw.cr + 1.0) * (tot.nt + {DSIR_BUCKETS})))
                    * {DSIR_Q}.0 + 0.5) AS BIGINT) AS lr_q
  FROM raw, tot
), s AS (
  SELECT e.doc_id, e.lang, count(*) AS n, sum(lr.lr_q) AS sl
  FROM e JOIN lr USING (bucket) GROUP BY e.doc_id, e.lang
), r AS (
  SELECT doc_id, lang, n, sl,
         row_number() OVER (
           PARTITION BY lang ORDER BY sl DESC, doc_id) AS dsir_rank
  FROM s
)
SELECT doc_id, lang, n::BIGINT AS n_tokens,
       {X.r6_sql(f'sl::DOUBLE / {DSIR_Q}.0')} AS log_weight,
       dsir_rank::BIGINT AS dsir_rank
FROM r WHERE dsir_rank <= {DSIR_K} ORDER BY doc_id
"""


@query(
    "dsir_select",
    _DSIR_ORACLE,
    doc="DSIR importance resampling (Xie et al. 2023): unigram tokens are "
        f"feature-hashed into {DSIR_BUCKETS} buckets, bucket unigram "
        "distributions are estimated for the target slice (deterministic "
        f"h32 {1}/{DSIR_TGT_MOD} stand-in for e.g. Wikipedia) and the raw "
        "corpus with add-one smoothing, and each document's importance "
        "weight is the sum of per-token log(p_target/p_raw) — then the "
        f"top-{DSIR_K} per language are selected. Scale shape: BOTH bucket "
        "distributions come from ONE conditional aggregation "
        f"(count + count_if) that partial-aggregates to ≤{DSIR_BUCKETS} "
        "rows per scan partition before a tiny shuffle — LM training costs "
        "exactly one corpus pass, scoring a second; the log-ratio table is "
        "BROADCAST back onto the exploded tokens (aggregate-then-broadcast, "
        "the north-star two-pass pattern), each doc's tokens stay in their "
        "scan partition so the per-doc sum partial-aggregates to one row "
        "per doc before its single shuffle; selection is the exact salted "
        "two-phase top-K (operators/mixture.py cap_per_key) so no sort "
        "partition ever holds more than a salt's share of a language. "
        "Per-bucket log-ratios are floor-quantized to 2^-20 integers "
        "(ccnet's bound) so document sums are exact in any fold order",
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(load(spark, sf_dir, "documents"))
    # codegen-twin tokenizer: trim+split stays inside whole-stage codegen
    # (the HOF filter form is CodegenFallback and would interpret the
    # per-token md5 below — measured ~2x slower); after the trim guard the
    # two forms produce identical token lists
    t1 = (
        d.where(X.nonempty_text_expr(F.col("text")))
        .select(
            "doc_id", "lang", X.tokens_codegen_expr(F.col("text")).alias("toks")
        )
        .withColumn(
            "is_tgt",
            X.h32(F.concat(F.lit("tgt:"), F.col("doc_id").cast("string")))
            % DSIR_TGT_MOD == 0,
        )
    )
    e = t1.select(
        "doc_id", "lang", "is_tgt", F.explode("toks").alias("tok")
    ).withColumn(
        "bucket", X.h32(F.concat(F.lit("dsir:"), F.col("tok"))) % DSIR_BUCKETS
    ).drop("tok")

    # ONE conditional aggregation estimates both distributions — the raw
    # count and the target count per bucket — so LM training costs exactly
    # one corpus pass, scoring a second (two scans total at any scale)
    raw = e.groupBy("bucket").agg(
        F.count("*").alias("cr"), F.count_if(F.col("is_tgt")).alias("ct")
    )
    # totals via an unpartitioned window over the ≤DSIR_BUCKETS-row bucket
    # table — post-aggregate tiny, never over corpus-sized data
    w_all = Window.partitionBy()
    lr = (
        raw.withColumn("nr", F.sum("cr").over(w_all))
        .withColumn("nt", F.sum("ct").over(w_all))
        .select(
            "bucket",
            F.floor(
                F.log(
                    ((F.col("ct") + F.lit(1.0))
                     * (F.col("nr") + F.lit(DSIR_BUCKETS)))
                    / ((F.col("cr") + F.lit(1.0))
                       * (F.col("nt") + F.lit(DSIR_BUCKETS)))
                )
                * F.lit(float(DSIR_Q)) + F.lit(0.5)
            ).cast("long").alias("lr_q"),
        )
        # lineage of this ≤512-row table re-scans the corpus; pin it to one
        # pass (same staged-materialization pattern as ccnet's LM table)
        .localCheckpoint()
    )

    s = (
        e.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n"), F.sum("lr_q").alias("sl"))
        .withColumn("_neg_sl", -F.col("sl"))
    )
    ranked = cap_per_key(
        s, key="lang", order_col="_neg_sl", tie_col="doc_id",
        k=DSIR_K, salts=DSIR_SALTS, out_col="dsir_rank",
    )
    return ranked.select(
        "doc_id", "lang",
        F.col("n").cast("long").alias("n_tokens"),
        X.r6(F.col("sl").cast("double") / F.lit(float(DSIR_Q))).alias(
            "log_weight"
        ),
        F.col("dsir_rank").cast("long").alias("dsir_rank"),
    )


# ---------------------------------------------------------------------------
# pack_context_windows — concat-and-chunk sequence packing
# ---------------------------------------------------------------------------

#: context-window token budget (a real run uses the model's context length;
#: scaled so fixture docs span multiple windows and some straddle)
PACK_CTX = 512
#: shard fan-out of the deterministic pre-pack shuffle
PACK_SHARDS = 8

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {X.token_count_sql('text')} AS ntok,
         {X.h32_sql("concat('pack:', doc_id::VARCHAR)")} AS pk
  FROM documents
), t1 AS (
  SELECT doc_id, ntok, pk, pk % {PACK_SHARDS} AS shard
  FROM t WHERE ntok > 0
), s AS (
  SELECT doc_id, shard, ntok,
         row_number() OVER w AS pack_pos,
         coalesce(sum(ntok) OVER (
           PARTITION BY shard ORDER BY pk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
  FROM t1
  WINDOW w AS (PARTITION BY shard ORDER BY pk, doc_id)
)
SELECT doc_id,
       shard::BIGINT AS shard,
       pack_pos::BIGINT AS pack_pos,
       ntok::BIGINT AS n_tokens,
       tok_start::BIGINT AS tok_start,
       (tok_start // {PACK_CTX})::BIGINT AS window_first,
       ((tok_start + ntok - 1) // {PACK_CTX})::BIGINT AS window_last,
       (tok_start // {PACK_CTX})
         <> ((tok_start + ntok - 1) // {PACK_CTX}) AS crosses_boundary
FROM s ORDER BY doc_id
"""


@query(
    "pack_context_windows",
    _PACK_ORACLE,
    doc="GPT-style concat-and-chunk sequence packing: documents are "
        f"deterministically shuffled into {PACK_SHARDS} shards by "
        "h32('pack:'||doc_id) (hash order, not rand() — reproducible "
        "across runs/engines/partitionings, same property as "
        "corpus_shuffle_shards), concatenated in shard order, and chopped "
        f"at a {PACK_CTX}-token context budget; each document reports its "
        "token offset, the window span it occupies, and whether it "
        "straddles a boundary (the packing-efficiency metric). Scale "
        "shape: ONE shuffle — repartition by shard + in-shard running sum; "
        "token counting is a codegen'd expression in the scan projection, "
        "so the shuffle carries only (doc_id, ntok, pk). At 10^12 docs the "
        "running sum is per-shard sequential by construction — shard "
        "fan-out is the parallelism knob, exactly how production packing "
        "jobs bound their sort partitions. Sizing note: row_number() is "
        "32-bit, so shard fan-out must keep every shard under 2^31 docs — "
        "at 10^12 docs that means >=500 shards, not the fixture's 8",
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t1 = (
        d.select(
            "doc_id",
            X.token_count_codegen_expr(F.col("text")).alias("ntok"),
            X.h32(
                F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))
            ).alias("pk"),
        )
        .where(F.col("ntok") > 0)
        .withColumn("shard", (F.col("pk") % PACK_SHARDS).cast("long"))
    )
    w = Window.partitionBy("shard").orderBy("pk", "doc_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, -1)
    s = t1.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pack_pos"),
        F.col("ntok").cast("long").alias("n_tokens"),
        F.coalesce(F.sum("ntok").over(w_cum), F.lit(0))
        .cast("long")
        .alias("tok_start"),
    )
    first_w = F.floor(F.col("tok_start") / PACK_CTX).cast("long")
    last_w = F.floor(
        (F.col("tok_start") + F.col("n_tokens") - 1) / PACK_CTX
    ).cast("long")
    return s.select(
        "doc_id", "shard", "pack_pos", "n_tokens", "tok_start",
        first_w.alias("window_first"),
        last_w.alias("window_last"),
        (first_w != last_w).alias("crosses_boundary"),
    )


# ---------------------------------------------------------------------------
# bloom_novelty — approximate-membership novelty vs a seen corpus
# ---------------------------------------------------------------------------

#: Bloom filter bits — sized so the fixture's ~250 seen keys fill ~0.4 of
#: the array and the false-positive leg is non-vacuous (fill^k ≈ 2.6%); a
#: real run sizes m ≈ -n·ln(fpr)/ln(2)² per the standard formula
BLOOM_M = 2048
#: hash functions per key (independent salted h32 probes)
BLOOM_K = 4


def _bloom_pos_sql(i: int) -> str:
    hashed = X.h32_sql(f"concat('bloom{i}:', key)")
    return f"(({hashed}) % {BLOOM_M})"


_BLOOM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, md5(text) AS key,
         ({X.h32_sql("concat('seen:', doc_id::VARCHAR)")} % 2 = 0) AS is_seen
  FROM documents
), p AS (
  SELECT doc_id, key, is_seen,
         [{', '.join(_bloom_pos_sql(i) for i in range(BLOOM_K))}] AS ps
  FROM d
), filt AS (
  SELECT list_sort(list_distinct(flatten(list(ps)))) AS seen_ps
  FROM p WHERE is_seen
)
SELECT doc_id,
       list_has_all(filt.seen_ps, p.ps) AS bloom_hit,
       (key IN (SELECT key FROM d WHERE is_seen)) AS exact_dup,
       (list_has_all(filt.seen_ps, p.ps)
         AND key NOT IN (SELECT key FROM d WHERE is_seen)) AS false_positive
FROM p, filt
WHERE NOT is_seen
ORDER BY doc_id
"""


@query(
    "bloom_novelty",
    _BLOOM_ORACLE,
    doc="Bloom-filter novelty check — the dedup-against-history gate a "
        "streaming ingest runs before full MinHash: the seen half of the "
        "corpus (deterministic h32 split standing in for yesterday's "
        f"corpus) populates an m={BLOOM_M}, k={BLOOM_K} Bloom filter "
        "(salted h32 probes over the md5 content key — the same 128-bit "
        "key dedup_exact uses, so hash collisions can't brand distinct "
        "docs as dups); each incoming doc reports bloom_hit (all k "
        "positions set), exact_dup (ground truth), and false_positive. "
        "Scale shape: the filter itself is the set of DISTINCT set "
        f"positions — at most {BLOOM_M} values regardless of corpus size — "
        "aggregated in one pass and BROADCAST as a single sorted-array row "
        "(the series_gates 1-row cross-join pattern); membership is then "
        "a zero-shuffle array_except in the scan projection. The exact "
        "ground-truth leg is a key equi-join against the seen half — at "
        "10^12 docs that leg is the expensive verification oracle you run "
        "sampled, while the Bloom leg costs one broadcast; the filter "
        "never needs rebuilding, and unioning two filters is elementwise "
        "OR (mergeable, like the GK/log-histogram digests)",
)
def bloom_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.md5(F.col("text")).alias("key"),
        (
            X.h32(F.concat(F.lit("seen:"), F.col("doc_id").cast("string")))
            % 2 == 0
        ).alias("is_seen"),
    )
    ps = F.array(
        *[
            X.h32(F.concat(F.lit(f"bloom{i}:"), F.col("key"))) % BLOOM_M
            for i in range(BLOOM_K)
        ]
    )
    p = d.withColumn("ps", ps)
    seen = p.where("is_seen")
    seen_filter = (
        seen.select(F.explode("ps").alias("pos"))
        .agg(F.array_sort(F.collect_set("pos")).alias("seen_ps"))
    )
    seen_keys = seen.select("key").distinct().withColumn(
        "_dup", F.lit(True)
    )
    incoming = p.where(~F.col("is_seen"))
    joined = (
        incoming.crossJoin(F.broadcast(seen_filter))
        .join(seen_keys, "key", "left")
    )
    bloom_hit = F.size(F.array_except("ps", "seen_ps")) == 0
    exact_dup = F.coalesce(F.col("_dup"), F.lit(False))
    return joined.select(
        "doc_id",
        bloom_hit.alias("bloom_hit"),
        exact_dup.alias("exact_dup"),
        (bloom_hit & ~exact_dup).alias("false_positive"),
    )


# ---------------------------------------------------------------------------
# Rendezvous (HRW) sharding — minimal-movement shard assignment
# ---------------------------------------------------------------------------
#
# corpus_shuffle_shards deals shards by modular hash: adding ONE shard
# remaps ~(N-1)/N of all documents — at 10^12 docs a full reshuffle.
# Highest-random-weight (rendezvous) hashing (Thaler & Ravishankar 1998)
# assigns doc -> argmax_s h(doc, s): growing N -> N+1 moves only the docs
# whose new shard's weight beats their old maximum — exactly 1/(N+1) in
# expectation — so shard-local artifacts (signature indexes, token counts,
# Bloom filters) survive a topology change almost entirely. The query
# computes both assignments and the per-(old, new) movement matrix; the
# planted property (moved fraction ~= 1/(N+1), and every move targets the
# NEW shard) is what the oracle pins. Portable h32 keyed on (doc_id, shard)
# keeps both engines bit-identical; one scan, no joins (the argmax is a
# greatest() over N compile-time columns).

HRW_N = 8           # current topology
HRW_N_NEW = 9       # topology after adding one shard


def _hrw_weight_sql(shard: int) -> str:
    return X.h32_sql(f"doc_id::VARCHAR || ':shard' || {shard}")


def _hrw_argmax_sql(n: int) -> str:
    # argmax via greatest() + a CASE chain over compile-time shards; h32
    # collisions across (doc, shard) pairs are 2^-32-improbable and the
    # CASE picks the LOWEST shard id on a tie in both engines (first WHEN
    # wins). The greatest() is inlined per branch — no correlated subquery.
    weights = ", ".join(_hrw_weight_sql(s) for s in range(n))
    cases = " ".join(
        f"WHEN {_hrw_weight_sql(s)} = greatest({weights}) THEN {s}"
        for s in range(n)
    )
    return f"(CASE {cases} END)"


_HRW_SQL = f"""
WITH a AS (
  SELECT doc_id,
         {_hrw_argmax_sql(HRW_N)} AS shard_old,
         {_hrw_argmax_sql(HRW_N_NEW)} AS shard_new
  FROM documents
)
SELECT shard_old::BIGINT AS shard_old, shard_new::BIGINT AS shard_new,
       count(*)::BIGINT AS n_docs,
       (shard_old <> shard_new) AS moved
FROM a GROUP BY shard_old, shard_new ORDER BY shard_old, shard_new
"""


@query(
    "shard_rendezvous_stability",
    _HRW_SQL,
    doc="rendezvous (HRW) sharding with the minimal-movement reshard "
        f"property: doc -> argmax over shards of h32(doc, shard); growing "
        f"{HRW_N} -> {HRW_N_NEW} shards must move only ~1/{HRW_N_NEW} of "
        "docs and EVERY move must target the new shard (pinned by "
        "tests) — the property that lets shard-local artifacts survive "
        "topology changes at 10^12 docs, vs the ~(N-1)/N full reshuffle "
        "of modular dealing (corpus_shuffle_shards); one scan, no "
        "shuffle before the rollup, compile-time argmax columns",
)
def shard_rendezvous_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")

    def weight(s: int):
        return X.h32(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":shard{s}"))
        )

    def argmax(n: int):
        m = F.greatest(*[weight(s) for s in range(n)])
        expr = F.lit(None).cast("int")
        for s in reversed(range(n)):
            expr = F.when(weight(s) == m, F.lit(s)).otherwise(expr)
        return expr

    a = d.select(
        "doc_id",
        argmax(HRW_N).alias("shard_old"),
        argmax(HRW_N_NEW).alias("shard_new"),
    )
    return (
        a.groupBy(
            F.col("shard_old").cast("long").alias("shard_old"),
            F.col("shard_new").cast("long").alias("shard_new"),
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn("moved", F.col("shard_old") != F.col("shard_new"))
        .orderBy("shard_old", "shard_new")
    )

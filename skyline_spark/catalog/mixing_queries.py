"""Training-mixture assembly: per-domain caps and token-budget quota fill.

The two selection steps every large-scale pretraining pipeline runs after
filtering/dedup and before sharding:

- ``domain_cap_sample`` — cap how many documents any one domain may
  contribute (RefinedWeb/C4-style host-level cap), so megasites cannot
  dominate the mixture;
- ``mixture_token_budget`` — fill each mixture component's TOKEN quota
  (Pile/Dolma-style mixing weights are token budgets, not doc counts) with
  a deterministic, resumable document prefix.

Both select by the portable hash (functions/text.py h32), not ``rand()``:
the chosen set is identical across runs, engines, executor counts, and
repartitionings — the property that makes a 10^12-doc mixture reproducible
and lets a resumed run extend, not reshuffle, a previous selection.

Reference analog: Skyline has no sampling layer at all (every metric is
analyzed every sweep, `analyzer/analyzer.py`); these operators belong to
the LLM-data-pipeline surface the engine adds on top of the reference's
scope, like dedup and decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as X
from ..operators.mixture import cap_per_key, token_budget_fill
from .registry import load, query

#: max docs any single source/domain may contribute to the mixture
DOMAIN_CAP = 15

#: salt fan-out of the first top-K pass (bounds any one sort partition)
CAP_SALTS = 8

#: token quota per language mixture component (whitespace tokens)
MIXTURE_QUOTAS = {"en": 6000}
MIXTURE_QUOTA_DEFAULT = 2000

#: hash-bucket fan-out of the quota-fill two-phase plan
MIX_BUCKETS = 64


def _cap_hash_sql() -> str:
    return X.h32_sql("concat('cap:', doc_id::VARCHAR)")


def _mix_hash_sql() -> str:
    return X.h32_sql("concat('mix:', doc_id::VARCHAR)")


def _quota_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(MIXTURE_QUOTAS.items())
    )
    return f"CASE {cases} ELSE {MIXTURE_QUOTA_DEFAULT} END"


@query(
    "domain_cap_sample",
    f"""
    SELECT doc_id, source, cap_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_cap_hash_sql()}, doc_id)::BIGINT AS cap_rank
      FROM documents)
    WHERE cap_rank <= {DOMAIN_CAP}
    ORDER BY source, cap_rank
    """,
    doc="per-domain contribution cap (RefinedWeb-style): keep at most "
        f"{DOMAIN_CAP} docs per source, the ones with the smallest "
        "h32('cap:'||doc_id) — deterministic across runs/engines/"
        "partitionings, unlike rand(). Scale shape: hot hosts are the "
        "skew risk of a per-host rank, so the engine runs the classic "
        "exact two-phase top-K — rank within (source, salt=h%S) buckets "
        "and keep the local top-K (the global top-K is always a subset of "
        "the per-salt top-Ks), then exact-rank the ≤S·K survivors — no "
        "single sort partition ever sees more than a salt's share of a "
        "host. Only (doc_id, source, h) triples shuffle; the oracle is "
        "the direct single-window restatement",
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = X.h32(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    narrow = d.select("doc_id", "source", h.alias("h"))
    return cap_per_key(
        narrow, key="source", order_col="h", tie_col="doc_id",
        k=DOMAIN_CAP, salts=CAP_SALTS,
    ).select("doc_id", "source", "cap_rank")


@query(
    "mixture_token_budget",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             {X.token_count_sql("text")} AS ntok,
             {_mix_hash_sql()} AS h
      FROM documents),
    q AS (
      SELECT doc_id, lang, ntok,
             {_quota_sql()} AS quota,
             sum(ntok) OVER (
               PARTITION BY lang
               ORDER BY h % {MIX_BUCKETS}, h, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks)
    SELECT doc_id, lang, ntok FROM q WHERE cum <= quota
    ORDER BY doc_id
    """,
    doc="token-budget mixture fill (Pile/Dolma-style): each lang component "
        "keeps the greedy hash-ordered document prefix whose cumulative "
        "whitespace-token count fits its quota — deterministic, and "
        "resumable because the kept set only ever EXTENDS when the quota "
        "grows. The naive form is a running sum over every doc in the "
        "component (a full per-component sort); the engine runs the exact "
        f"two-phase plan instead: docs hash into {MIX_BUCKETS} buckets, "
        "per-(lang, bucket) token sums (tiny) get a running prior, buckets "
        "whose prior+sum fit are kept WHOLE with no sort, buckets whose "
        "prior exceeds the quota are dropped whole, and only the single "
        "boundary bucket — 1/64th of the component — pays a doc-level "
        "window. The oracle is the naive single-window restatement over "
        "the same (bucket, h, doc_id) order; both sides use ROWS frames "
        "so ties cannot share a cumulative value",
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = X.h32(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    quota = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(MIXTURE_QUOTAS.items())
        ],
        F.lit(MIXTURE_QUOTA_DEFAULT),
    ).cast("long")

    # narrow derived frame (~30 B/row), referenced by the bucket-sum
    # aggregate and both keep branches. NOT checkpointed here: a
    # localCheckpoint would truncate the explained plan to an RDD scan and
    # blind the plan-shape tests (pruning / codegen / no-Python pins); at
    # 10^12 rows you stage this projection once (validate()'s slim pattern)
    # so the wide table is scanned once instead of per branch
    toks = d.select(
        "doc_id",
        "lang",
        X.token_count_codegen_expr(F.col("text")).alias("ntok"),
        h.alias("h"),
    )
    return token_budget_fill(
        toks, stratum="lang", weight_col="ntok", order_col="h",
        tie_col="doc_id", quota=quota, buckets=MIX_BUCKETS,
    ).select("doc_id", "lang", "ntok")


# ---------------------------------------------------------------------------
# temperature-scaled mixture sampling
# ---------------------------------------------------------------------------

#: integer quantizer for the per-source sqrt weight (exact/associative sums)
TEMP_Q = 1024
#: fraction of the corpus the tempered sample targets
TEMP_FRAC = 0.4


def _temp_hash_sql() -> str:
    return X.h32_sql("concat('temp:', doc_id::VARCHAR)")


_TEMP_ORACLE = f"""
WITH counts AS (
  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs,
         floor(sqrt(n_docs) * {TEMP_Q} + 0.5)::BIGINT AS weight
  FROM counts
), tot AS (
  SELECT source, n_docs, weight,
         sum(weight) OVER () AS wsum,
         floor(sum(n_docs) OVER () * {TEMP_FRAC})::BIGINT AS target
  FROM w
), quota AS (
  SELECT source, n_docs, weight,
         least(n_docs,
               floor(target::DOUBLE * weight / wsum)::BIGINT) AS quota
  FROM tot
), ranked AS (
  SELECT doc_id, source, h,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rnk
  FROM (SELECT doc_id, source, {_temp_hash_sql()} AS h FROM documents)
), picked AS (
  SELECT r.source, count(*)::BIGINT AS picked, sum(r.h)::BIGINT AS sel_hash_sum
  FROM ranked r JOIN quota q USING (source)
  WHERE r.rnk <= q.quota
  GROUP BY r.source
)
SELECT q.source, q.n_docs, q.weight, q.quota,
       coalesce(p.picked, 0)::BIGINT AS picked,
       coalesce(p.sel_hash_sum, 0)::BIGINT AS sel_hash_sum
FROM quota q LEFT JOIN picked p USING (source)
ORDER BY q.source
"""


@query(
    "mixture_temperature_sample",
    _TEMP_ORACLE,
    doc="temperature-scaled mixture sampling (the multilingual/data-mixing "
        "p_i^alpha upsampling rule, alpha=0.5): each source's share of the "
        "tempered sample is proportional to sqrt(n_i), flattening "
        "head-domain dominance while keeping tail domains represented. "
        "Cross-engine float discipline: sqrt is IEEE-correctly-rounded in "
        f"both engines, quantized to an integer weight (floor(sqrt*{TEMP_Q}"
        "+0.5)) so the weight SUM is exact/associative regardless of "
        "partition fold order; the quota is then ONE double multiply + "
        "divide + floor — deterministic everywhere. Selection is the "
        "h32('temp:'||doc_id) rank within source (reproducible across "
        "runs/engines/partitionings; a resumed run re-picks the identical "
        "set), checksummed per source so the oracle pins WHICH docs were "
        "picked, not just how many. Scale: the per-source rank is the same "
        "skew surface as domain_cap_sample — at 10^12 docs it runs the "
        "salted two-phase top-K there (operators/mixture.cap_per_key) "
        "with k=quota_i; the summary side is a broadcast of O(|sources|) "
        "rows",
)
def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    h = X.h32(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    narrow = d.select("doc_id", "source", h.alias("h"))

    counts = narrow.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    w = counts.withColumn(
        "weight", F.floor(F.sqrt("n_docs") * TEMP_Q + F.lit(0.5)).cast("long")
    )
    tot = Window.partitionBy()
    quota = (
        w.withColumn("wsum", F.sum("weight").over(tot))
        .withColumn(
            "target", F.floor(F.sum("n_docs").over(tot) * TEMP_FRAC).cast("long")
        )
        .withColumn(
            "quota",
            F.least(
                F.col("n_docs"),
                F.floor(
                    F.col("target").cast("double") * F.col("weight") / F.col("wsum")
                ).cast("long"),
            ),
        )
        .select("source", "n_docs", "weight", "quota")
    )

    rnk = F.row_number().over(
        Window.partitionBy("source").orderBy("h", "doc_id")
    )
    ranked = narrow.withColumn("rnk", rnk)
    picked = (
        ranked.join(F.broadcast(quota.select("source", "quota")), "source")
        .where(F.col("rnk") <= F.col("quota"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("picked"),
            F.sum("h").cast("long").alias("sel_hash_sum"),
        )
    )
    return (
        quota.join(picked, "source", "left")
        .select(
            "source", "n_docs", "weight", "quota",
            F.coalesce("picked", F.lit(0)).cast("long").alias("picked"),
            F.coalesce("sel_hash_sum", F.lit(0)).cast("long").alias("sel_hash_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------

#: total plan budget as a multiple of the corpus token mass (> 1 forces
#: genuine upsampling: every source repeats, most with a fractional epoch)
EPOCH_BUDGET_X = 2.5


def _epoch_hash_sql() -> str:
    return X.h32_sql("concat('ep:', doc_id::VARCHAR)")


_EPOCH_ORACLE = f"""
WITH ntok AS (
  SELECT doc_id, source,
         {X.token_count_sql('text')}::BIGINT AS n_tokens,
         {_epoch_hash_sql()} AS h
  FROM documents
), counts AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(n_tokens)::BIGINT AS avail_tokens
  FROM ntok GROUP BY source
), w AS (
  SELECT source, n_docs, avail_tokens,
         floor(sqrt(avail_tokens) * {TEMP_Q} + 0.5)::BIGINT AS weight
  FROM counts
), tot AS (
  SELECT source, n_docs, avail_tokens, weight,
         sum(weight) OVER () AS wsum,
         floor(sum(avail_tokens) OVER () * {EPOCH_BUDGET_X})::BIGINT AS budget
  FROM w
), plan AS (
  SELECT source, n_docs, avail_tokens, weight,
         floor(budget::DOUBLE * weight / wsum)::BIGINT AS target_tokens
  FROM tot
), plan2 AS (
  SELECT *, (target_tokens // avail_tokens)::BIGINT AS epochs_full,
         (target_tokens - (target_tokens // avail_tokens) * avail_tokens)::BIGINT AS rem_tokens
  FROM plan
), ranked AS (
  SELECT source, doc_id, n_tokens, h,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)::BIGINT AS cum
  FROM ntok
), frac AS (
  SELECT r.source, count(*)::BIGINT AS frac_docs,
         sum(r.n_tokens)::BIGINT AS frac_tokens,
         sum(r.h)::BIGINT AS frac_sel_hash_sum
  FROM ranked r JOIN plan2 p USING (source)
  WHERE r.cum <= p.rem_tokens
  GROUP BY r.source
)
SELECT p.source, p.n_docs, p.avail_tokens, p.weight, p.target_tokens,
       p.epochs_full,
       coalesce(f.frac_docs, 0)::BIGINT AS frac_docs,
       coalesce(f.frac_tokens, 0)::BIGINT AS frac_tokens,
       coalesce(f.frac_sel_hash_sum, 0)::BIGINT AS frac_sel_hash_sum,
       (p.epochs_full * p.avail_tokens + coalesce(f.frac_tokens, 0))::BIGINT AS planned_tokens
FROM plan2 p LEFT JOIN frac f USING (source)
ORDER BY p.source
"""


@query(
    "mixture_epoch_plan",
    _EPOCH_ORACLE,
    doc="upsampling-epoch planner (the data-constrained-recipe step, "
        "Muennighoff et al. 2023: a token budget LARGER than the corpus is "
        "met by REPEATING sources): each source's tempered target "
        "(sqrt-weight share of budget = 2.5x corpus tokens) splits into "
        "target div avail full epochs plus a fractional epoch filled by the "
        "deterministic h32-ranked greedy token prefix — the set a resumed "
        "or re-run plan re-picks identically, checksummed so the oracle "
        "pins WHICH docs land in the partial epoch. Same float discipline "
        "as mixture_temperature_sample (integer-quantized sqrt weight, ONE "
        "double multiply/divide/floor); everything after is exact integer "
        "arithmetic. Scale: token counting is a pure codegen map; the "
        "per-source cumulative window is token_budget_fill's skew surface "
        "and at 10^12 docs runs its bucketed boundary-only form "
        "(operators/mixture.py); the plan itself is O(|sources|) rows "
        "broadcast back",
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    ntok = d.select(
        "doc_id",
        "source",
        X.token_count_codegen_expr(F.col("text")).cast("long").alias("n_tokens"),
        X.h32(F.concat(F.lit("ep:"), F.col("doc_id").cast("string"))).alias("h"),
    )

    counts = ntok.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("avail_tokens"),
    )
    w = counts.withColumn(
        "weight", F.floor(F.sqrt("avail_tokens") * TEMP_Q + F.lit(0.5)).cast("long")
    )
    tot = Window.partitionBy()
    plan = (
        w.withColumn("wsum", F.sum("weight").over(tot))
        .withColumn(
            "budget",
            F.floor(F.sum("avail_tokens").over(tot) * EPOCH_BUDGET_X).cast("long"),
        )
        .withColumn(
            "target_tokens",
            F.floor(
                F.col("budget").cast("double") * F.col("weight") / F.col("wsum")
            ).cast("long"),
        )
        .withColumn("epochs_full", F.expr("target_tokens div avail_tokens"))
        .withColumn(
            "rem_tokens",
            F.col("target_tokens") - F.col("epochs_full") * F.col("avail_tokens"),
        )
        .select(
            "source", "n_docs", "avail_tokens", "weight",
            "target_tokens", "epochs_full", "rem_tokens",
        )
    )

    cum = F.sum("n_tokens").over(
        Window.partitionBy("source").orderBy("h", "doc_id")
    )
    ranked = ntok.withColumn("cum", cum.cast("long"))
    frac = (
        ranked.join(F.broadcast(plan.select("source", "rem_tokens")), "source")
        .where(F.col("cum") <= F.col("rem_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("frac_docs"),
            F.sum("n_tokens").cast("long").alias("frac_tokens"),
            F.sum("h").cast("long").alias("frac_sel_hash_sum"),
        )
    )
    return (
        plan.join(frac, "source", "left")
        .select(
            "source", "n_docs", "avail_tokens", "weight", "target_tokens",
            "epochs_full",
            F.coalesce("frac_docs", F.lit(0)).cast("long").alias("frac_docs"),
            F.coalesce("frac_tokens", F.lit(0)).cast("long").alias("frac_tokens"),
            F.coalesce("frac_sel_hash_sum", F.lit(0)).cast("long")
            .alias("frac_sel_hash_sum"),
            (
                F.col("epochs_full") * F.col("avail_tokens")
                + F.coalesce("frac_tokens", F.lit(0))
            ).cast("long").alias("planned_tokens"),
        )
        .orderBy("source")
    )

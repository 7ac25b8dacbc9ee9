"""Training-data pipeline queries over ``documents`` / ``embeddings``.

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), and text
analysis (token counts, language-ID, quality, fingerprints).

Every query is built twice from the same constants: a Spark DataFrame plan
and a DuckDB oracle SQL string. All hashing is the portable
``h32(s) = int(md5(s)[:8], 16)`` from :mod:`skyline_spark.functions.text`,
so both engines agree bit-for-bit; all floating results fold left in array
order in both engines, so doubles (and their 6-dp roundings) are identical.

Scale design (10^12 docs):
- every dedup variant generates candidates through an equi-join on a small
  derived key (hash / band / bucket), never an O(n²) cross join;
  the O(n²) forms exist only as oracles at sf=0.01;
- signatures are Catalyst expression chains (whole-stage codegen), so the
  map side is one scan with column pruning down to (id, text);
- pair joins shuffle on the band key; AQE skew-join splits hot buckets
  (empty-text or boilerplate-heavy buckets are the classic hot keys).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as X
from .registry import load, query


def _spread(df):
    """Small dimension tables arrive as one parquet file → one partition →
    expression-heavy stages (shingles, signatures, vector folds) run on a
    single task. Spread rows across the cluster first; at real scale the
    input is already many files and this is a no-op cost-wise."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

MINHASH_BANDS = 4          # 16 hashes → 4 bands × 4 rows
MINHASH_JACCARD_T = 0.05   # verify threshold on exact shingle Jaccard
SIMHASH_MAX_HAMMING = 3    # ≤3 differing bits over 4 bands of 15 → pigeonhole
NGRAM_JACCARD_T = 0.05

# --- duplicate-flood guards (VERDICT r4 item 1) ----------------------------
# Two-layer guard applied to every banded near-dup path (minhash, simhash,
# embedding LSH) against the real-crawl skew-killer that near-unique
# synthetic fixtures never exercise: k copies of one boilerplate page share
# ALL band keys, so one band bucket yields ~k²/2 candidate pairs.
#  (1) exact-dup PRE-COLLAPSE — byte-identical content (text / embedding
#      vector) is grouped to ONE representative (min id) before signatures,
#      so identical floods contribute one band row each, not k. Exact-dup
#      membership itself is dedup_exact's output; near-dup pairs are
#      reported between representatives (dedup_clusters expands component
#      labels back to every member).
#  (2) per-(band_id, band_key) FREQUENCY CAP — near-identical-but-not-
#      identical floods (boilerplate with a counter, mirrored pages with a
#      timestamp) survive the collapse and still share all band keys.
#      Buckets larger than the cap are dropped from candidate generation —
#      the same trade dedup_winnowing already makes (WINNOW_FREQ_CAP) —
#      and the dropped mass is observable through dedup_band_guard.
# Cap math: a kept bucket of nb reps yields nb·(nb-1)/2 candidates, so the
# guard bounds total candidates at ~2·cap·k for a flood of k variants —
# LINEAR in k with constant 2·cap, vs k²/2 unguarded. Caps are set against
# the measured benign bucket maxima at sf0.1 (minhash 4, simhash 269,
# emb-lsh 28):
#  - minhash/embedding caps sit ~10-20x above their benign maxima — zero
#    recall cost on clean data;
#  - simhash's random 15-bit collisions grow linearly with corpus size, so
#    its cap necessarily intersects the benign tail: at sf0.1 cap 256 drops
#    the single 269-deep hash-attractor bucket, costing 14 of 498 true
#    pairs (2.8%, measured; 0% at the sf0.01 driver gate). That is the
#    honest price of bounding a boilerplate flood — a 1,500-variant
#    planted flood at cap 1024 still emitted 1.2M candidates through
#    just-under-cap buckets (measured), at cap 256 it emits 72k.
MINHASH_BAND_CAP = 64
SIMHASH_BAND_CAP = 256
EMB_BAND_CAP = 512
# near-dup threshold FOR THESE QUERIES: the synthetic embeddings are
# near-orthogonal (max pairwise cosine ≈ 0.5/0.6 at sf 0.01/0.1), so the
# production-style 0.9 threshold makes every dedup row vacuously empty;
# 0.45 yields a real, checkable pair set. A production embedding-dedup run
# would raise this back toward 0.9.
EMB_COS_DUP_T = 0.45
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_TOPK = 10
# Hyperplane-LSH band geometry. Bits per band set the RANDOM-pair collision
# rate (2^-bits per band — with 4-bit bands ~25% of ALL pairs collided in
# some band, i.e. the "bucketing" was near-all-pairs at any scale); band
# count buys recall back at the production threshold. 8 bands × 8 bits:
# random collisions ≤ 8/256 ≈ 3% of pairs, recall ≈ 94% at cosine 0.9
# (p_bit = 1 − θ/π = 0.857 → band 0.857^8 = 0.29 → 1−(1−0.29)^8). At the
# synthetic test threshold 0.45 recall is intentionally lower (~22%) — the
# dial targets production near-dup cosine, and the oracle recomputes the
# same bands so cross-engine parity is exact either way. Classic rule at
# 10^12 vectors: grow bits per band with log2(n).
LSH_PLANES = 64            # hyperplane LSH: 64-bit signature
LSH_BANDS = 8              # 8 bands × 8 bits
LSH_BAND_BITS = 8
LSH_TOPK = 5
EMB_DIM = 64


def _w(i: int, j: int) -> float:
    """Deterministic hyperplane weights from md5 — both engines re-derive
    the identical value (``w_sql``), so no 1024-literal tables are shipped."""
    h = int(hashlib.md5(f"{i}-{j}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def _w_sql(i_expr: str, j_expr: str) -> str:
    key = f"concat({i_expr}, '-', {j_expr})"
    return f"(({X.h32_sql(key)} % 2001 - 1000) / 1000.0)"


# documents CTE scaffold shared by the oracle SQL strings
_DOC_CTE = f"""
WITH tok AS (
  SELECT doc_id, lang, text, {X.tokens_sql('text')} AS toks FROM documents
), sh AS (
  SELECT doc_id, lang, toks, {X.shingles_sql('toks')} AS sh FROM tok
), shh AS (
  SELECT doc_id, lang, sh, list_transform(sh, s -> {X.h32_sql('s')}) AS shh FROM sh
)
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@query(
    "text_token_count",
    """
    SELECT doc_id,
           {tok} AS n_tokens,
           {rtok} AS n_regex_tokens
    FROM documents ORDER BY doc_id
    """.format(tok=X.token_count_sql("text"), rtok=X.regex_token_count_sql("text")),
    doc="whitespace + BPE-ish regex token counts (JVM-side regexp, no UDF)",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        X.token_count_codegen_expr(F.col("text")).alias("n_tokens"),
        X.regex_token_count_expr("text").alias("n_regex_tokens"),
    )


@query(
    "text_lang_id",
    f"""
    SELECT doc_id,
           {X.stopword_ratio_sql('text')} AS stopword_ratio,
           {X.lang_id_sql('text')} AS lang_guess
    FROM documents ORDER BY doc_id
    """,
    doc="stopword-ratio language heuristic (reference analog: dotted-namespace "
        "matching, skyline_functions.py:1103-1129)",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", X.tokens_expr(F.col("text")).alias("toks")
    )
    ratio = tok.select(
        "doc_id",
        X.stopword_ratio_from_tokens_expr(F.col("toks")).alias("stopword_ratio"),
    )
    return ratio.select(
        "doc_id",
        "stopword_ratio",
        F.when(F.col("stopword_ratio") > X.LANG_EN_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_guess"),
    )


@query(
    "text_quality",
    f"""
    SELECT doc_id, {X.quality_score_sql('text')} AS quality
    FROM documents ORDER BY doc_id
    """,
    doc="length/diversity quality score, pure Catalyst expressions",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        X.quality_score_codegen_expr(F.col("text")).alias("quality"),
    )


@query(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           {X.fingerprint_sql('text')} AS fingerprint,
           {X.simhash_sql('text')} AS simhash
    FROM documents ORDER BY doc_id
    """,
    doc="rolling polynomial fingerprint + 60-bit SimHash",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-batched twin of fingerprint_expr/simhash_expr — exact integer
    # parity, one token pass instead of 33 interpreted folds. Bound ONCE:
    # two pandas_udf instances are distinct expressions Spark cannot
    # deduplicate, so two calls would run the md5 kernel twice per row
    hashes = X.text_hashes_udf()(F.col("text"))
    return _spread(load(spark, sf_dir, "documents")).select(
        "doc_id",
        hashes.getField("fingerprint").alias("fingerprint"),
        hashes.getField("simhash").alias("simhash"),
    )


@query(
    "docs_nchars_check",
    """
    SELECT doc_id, length(text) AS actual_chars, n_chars AS declared_chars
    FROM documents WHERE length(text) <> n_chars ORDER BY doc_id
    """,
    doc="referential check: declared n_chars must equal length(text)",
)
def docs_nchars_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.where(F.length("text") != F.col("n_chars")).select(
        "doc_id",
        F.length("text").cast("long").alias("actual_chars"),
        F.col("n_chars").alias("declared_chars"),
    )


# ---------------------------------------------------------------------------
# character diversity
# ---------------------------------------------------------------------------

_CHAR_DIVERSITY_ORACLE = f"""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
), cnt AS (
  SELECT doc_id, ch, count(*)::BIGINT AS c FROM chars WHERE ch <> '' GROUP BY doc_id, ch
), agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_chars, sum(c * c)::BIGINT AS char_sumsq
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_chars, 0) AS n_chars,
       coalesce(a.char_sumsq, 0) AS char_sumsq,
       CASE WHEN coalesce(a.n_chars, 0) = 0 THEN NULL
            ELSE {X.r6_sql('1.0 - a.char_sumsq / (a.n_chars * a.n_chars)::DOUBLE')}
       END AS char_simpson
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


@query(
    "text_char_diversity",
    _CHAR_DIVERSITY_ORACLE,
    doc="character-level Simpson diversity 1 − Σc²/n² — a cheap "
        "gibberish/keyboard-mash/spam gauge (low diversity ⇔ a few "
        "characters dominate), complementing the token-level TTR in "
        "text_quality. The Arrow kernel emits INTEGER moments (n, Σc²) so "
        "engine/oracle agreement is exact by construction: the single float "
        "division happens relationally on the same two integers in both "
        "engines — no transcendentals, no float-fold order. One Arrow pass "
        "per doc, no shuffle; the explode-a-row-per-character restatement "
        "exists only as the DuckDB oracle (never run that at 10^12 docs)",
)
def text_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = X.char_counts_udf()(F.col("text"))
    return (
        _spread(load(spark, sf_dir, "documents"))
        .select("doc_id", m.getField("n").alias("n_chars"), m.getField("sumsq").alias("char_sumsq"))
        .select(
            "doc_id",
            "n_chars",
            "char_sumsq",
            F.when(F.col("n_chars") == 0, F.lit(None).cast("double"))
            .otherwise(
                X.r6(
                    1.0
                    - F.col("char_sumsq")
                    / (F.col("n_chars") * F.col("n_chars")).cast("double")
                )
            )
            .alias("char_simpson"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Java regex and DuckDB's RE2 both accept these verbatim (no lookarounds,
# which RE2 lacks). Redaction order is email → phone → IPv4, identical in
# both engines, so nested matches (an IP-shaped host inside an email) cannot
# diverge.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_RE = r"\(\d\d\d\) \d\d\d-\d\d\d\d"
PII_IPV4_RE = r"\b\d+\.\d+\.\d+\.\d+\b"

_PII_PLANT_SQL = """
    CASE doc_id % 3
      WHEN 0 THEN ' Contact user' || doc_id || '@example.com now.'
      WHEN 1 THEN ' Call (555) 010-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || '.'
      ELSE ' Host 10.' || (doc_id % 256) || '.' || (doc_id % 100) || '.7 up.'
    END
"""

_PII_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, text || {_PII_PLANT_SQL} AS t FROM documents
), scrubbed AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
         len(regexp_extract_all(t, '{PII_PHONE_RE}'))::BIGINT AS n_phones,
         len(regexp_extract_all(t, '{PII_IPV4_RE}'))::BIGINT AS n_ips,
         regexp_replace(regexp_replace(regexp_replace(t,
             '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
             '{PII_PHONE_RE}', '[PHONE]', 'g'),
             '{PII_IPV4_RE}', '[IP]', 'g') AS clean
  FROM planted
)
SELECT doc_id, n_emails, n_phones, n_ips,
       length(clean)::BIGINT AS clean_len,
       {X.h32_sql('clean')} AS clean_hash
FROM scrubbed ORDER BY doc_id
"""


@query(
    "text_pii_scrub",
    _PII_ORACLE,
    doc="PII redaction (email / US-phone / IPv4 → typed placeholders) with "
        "per-doc match counts — the standard pre-training privacy scrub "
        "(C4/Dolma-style). The synthetic corpus carries no PII, so each doc "
        "first gets one deterministic planted PII token derived from doc_id "
        "(same expression in both engines) to exercise every pattern for "
        "real; production drops the planting and keeps the scrub. Pure "
        "regexp codegen expressions — one scan, no shuffle, no Python; the "
        "clean text is emitted as (length, h32) so the driver canonicalizer "
        "compares it without hauling full bodies",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    plant = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" Contact user"), F.col("doc_id"), F.lit("@example.com now.")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit(" Call (555) 010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit("."),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" Host 10."),
                F.col("doc_id") % 256,
                F.lit("."),
                F.col("doc_id") % 100,
                F.lit(".7 up."),
            )
        )
    )
    t = F.concat(F.col("text"), plant)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE,
            "[PHONE]",
        ),
        PII_IPV4_RE,
        "[IP]",
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.length(clean).cast("long").alias("clean_len"),
        X.h32(clean).alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    f"""
    SELECT doc_id,
           {X.h32_sql('text')} AS text_hash,
           (cnt > 1) AS is_dup,
           keeper
    FROM (
      SELECT doc_id, text,
             count(*) OVER (PARTITION BY md5(text)) AS cnt,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM documents
    ) ORDER BY doc_id
    """,
    doc="exact dedup: hash-groupBy, keeper = min doc_id per hash group. The "
        "dedup KEY is the full 128-bit md5 (collision odds ~1e-15 even at "
        "10^12 docs); the 32-bit h32 would see ~233 colliding docs per "
        "value at that scale and brand distinct documents as dups. h32 "
        "remains in the output as the cheap display/join hash only",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").withColumn("text_hash", X.h32(F.col("text")))
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("text")))
    return d.select(
        "doc_id",
        "text_hash",
        (F.count("*").over(w) > 1).alias("is_dup"),
        F.min("doc_id").over(w).alias("keeper"),
    )


def _band_key_sql(sig: str, b: int, rows: int) -> str:
    parts = ", ".join(f"{sig}[{b * rows + r + 1}]" for r in range(rows))
    return f"concat_ws('-', {parts})"


_MINHASH_ROWS = len(X.MINHASH_PERMS) // MINHASH_BANDS

# exact-dup-collapsed representatives + minhash banding + bucket frequencies
# (WITH-less fragment: composed by _MINHASH_ORACLE and _BAND_GUARD_ORACLE)
_MINHASH_BAND_CTES = f"""rep AS (
  SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
), tok AS (
  SELECT doc_id, {X.tokens_sql('text')} AS toks FROM rep
), sh AS (
  SELECT doc_id, {X.shingles_sql('toks')} AS sh FROM tok
), shh AS (
  SELECT doc_id, sh, list_transform(sh, s -> {X.h32_sql('s')}) AS shh FROM sh
), sig AS (
  SELECT doc_id, sh, {X.minhash_sig_sql('shh')} AS sig FROM shh WHERE len(sh) > 0
), mbands AS (
  SELECT doc_id, sh, b.b AS band_id,
         CASE b.b {' '.join(f"WHEN {b} THEN {_band_key_sql('sig', b, _MINHASH_ROWS)}" for b in range(MINHASH_BANDS))} END AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS b) b
), mfreq AS (
  SELECT band_id, band_key, count(*) AS nb FROM mbands GROUP BY 1, 2
)"""

_MINHASH_ORACLE = f"""
WITH {_MINHASH_BAND_CTES}, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b, a.sh AS sh_a, c.sh AS sh_b
  FROM mbands a
  JOIN mfreq f ON f.band_id = a.band_id AND f.band_key = a.band_key
              AND f.nb <= {MINHASH_BAND_CAP}
  JOIN mbands c
    ON a.band_id = c.band_id AND a.band_key = c.band_key AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b,
       floor(len(list_intersect(sh_a, sh_b))::DOUBLE
             / len(list_distinct(list_concat(sh_a, sh_b))) * 1000000 + 0.5) / 1000000 AS jaccard
FROM cand
WHERE len(list_intersect(sh_a, sh_b))::DOUBLE
      / len(list_distinct(list_concat(sh_a, sh_b))) >= {MINHASH_JACCARD_T}
ORDER BY doc_a, doc_b
"""


def _exact_group_key():
    """The exact-dup text-group key — the ONE definition shared by
    ``_collapse_exact_docs`` (pair generation runs on its reps) and
    ``dedup_clusters``'s member-expansion join. The two sides must agree
    bit-for-bit: if they ever derived different keys, expansion would join
    members to rep ids that don't exist and silently drop whole clusters.
    Full 128-bit md5 (same collision posture as dedup_exact), with a
    sentinel for NULL text (md5(NULL) is NULL, and a NULL groupBy key
    would silently drop members at the expansion join)."""
    return F.coalesce(F.md5(F.col("text")), F.lit("<null-text>"))


def _collapse_exact_docs(d: DataFrame) -> DataFrame:
    """Exact-dup pre-collapse: one representative row (min doc_id) per
    distinct text, feeding every banded near-dup path. Keyed on
    ``_exact_group_key()`` so the shuffle key is 16 bytes; the text itself
    rides in the min_by buffer — one value per key per map task thanks to
    partial aggregation, never k copies."""
    key = _exact_group_key()
    # re-_spread the aggregate output: AQE coalesces the tiny post-groupBy
    # shuffle to ~1 partition, which would run the downstream shingle /
    # signature kernels single-task (measured 2x on the whole minhash
    # stanza at sf0.1; at real scale the aggregate output is large enough
    # that AQE keeps it wide and this is a no-op cost)
    return _spread(
        d.groupBy(key.alias("_k"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .drop("_k")
    )


def _cap_band_buckets(bands: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Drop (band) buckets holding more than ``cap`` members — the
    duplicate-flood guard (see MINHASH_BAND_CAP block comment).

    Shape: the OVER-cap key list is tiny on every corpus probed
    (pathological boilerplate buckets only — zero rows on clean corpora),
    so AQE resolves the anti-join to a runtime broadcast: no extra shuffle
    of the band table, just one narrow-key count aggregation (map-side
    partial) to find the hot keys. The join hint is deliberately left to
    AQE rather than a static ``F.broadcast``: the hot-list size is
    data-dependent and unbounded (a crawl with millions of distinct
    over-cap template families), and a forced broadcast would collect that
    list to the driver at exactly the flood scale the guard exists for —
    AQE keeps the broadcast when the list is small and degrades to a
    shuffled anti-join instead of a driver OOM when it is not. The first
    cut semi-joined against the KEPT key list — that re-shuffled the whole
    band table unconditionally and cost 1.5-2.7x on the three dedup
    stanzas (measured, BENCH r5 notes). Dropped mass is surfaced by
    dedup_band_guard."""
    freq = bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("nb"))
    hot = freq.where(F.col("nb") > cap).select(*keys)
    return bands.join(hot, keys, "left_anti")


@query(
    "dedup_minhash_lsh",
    _MINHASH_ORACLE,
    doc="MinHash(16)+LSH(4 bands): band-key equi-join candidates, verified by "
        "exact shingle Jaccard — the O(n²) pair scan never happens. "
        "Flood-guarded (VERDICT r4): exact dups collapse to one "
        "representative before signatures, and band buckets larger than "
        f"{MINHASH_BAND_CAP} reps are dropped from candidate generation "
        "(dropped mass observable via dedup_band_guard)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stage-wise: shingles are computed ONCE and persisted; the band join
    # shuffles only (doc_id, band_id, band_key) — never the shingle arrays —
    # and verified pairs fetch their shingle sets back by id. This mirrors
    # the at-scale design (a materialized signature table feeding a narrow
    # band join) and keeps the Catalyst tree small: inlining the signature
    # expression into all four band keys on both join sides blows codegen up.
    # localCheckpoint (not persist): same compute-once semantics for the
    # twice-referenced frames, but the materialized blocks are released by
    # the ContextCleaner when the DataFrame goes out of scope — repeated
    # build() calls (bench loops, parity sweeps) don't accumulate cache
    d = _collapse_exact_docs(_spread(load(spark, sf_dir, "documents")))
    # Arrow-batched shingle kernel — identical output to shingles_expr (the
    # oracle's value-hash match enforces it); the expression form's HOF
    # chain was 16 s of this query's 14–16 s at sf0.1
    sh = (
        d.select("doc_id", X.shingles_udf()(F.col("text")).alias("sh"))
        .where(F.size("sh") > 0)
        .localCheckpoint(eager=False)
    )
    sig = sh.select("doc_id", _minhash_from_shingles(F.col("sh")).alias("sig"))
    # barrier sits AFTER the cap: the capped frame feeds BOTH self-join
    # sides, so a pre-cap barrier recomputes the freq-agg + anti-join per
    # side (measured 3x on this stanza); the shingle kernel itself is
    # already materialized at sh
    bands = _cap_band_buckets(
        _minhash_bands_from_sig(sig), ["band_id", "band_key"], MINHASH_BAND_CAP
    ).localCheckpoint(eager=False)

    a = bands.alias("a")
    c = bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band_id") == F.col("c.band_id"))
            & (F.col("a.band_key") == F.col("c.band_key"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return pairs.select(
        "doc_a", "doc_b", X.r6(jac).alias("jaccard"), jac.alias("_j")
    ).where(F.col("_j") >= MINHASH_JACCARD_T).drop("_j")


def _minhash_bands_from_sig(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) rows from a (doc_id, sig) signature frame
    — shared by dedup_minhash_lsh and dedup_band_guard."""
    rows = _MINHASH_ROWS
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "-",
                            *[
                                F.element_at(F.col("sig"), b * rows + r + 1).cast("string")
                                for r in range(rows)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")


def _minhash_from_shingles(sh):
    hashes = F.transform(sh, lambda s: X.h32(s))
    return F.array(
        *[
            F.array_min(
                F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % X.MERSENNE_P)
            )
            for (a, b) in X.MINHASH_PERMS
        ]
    )


# pair-list fragment shared by dedup_simhash and dedup_clusters.
# Flood-guarded like the Spark builder: exact dups collapse to one
# representative before hashing, pairs come from the SAME banded equi-join
# the engine runs (not the old brute-force restatement — the frequency cap
# is a property of the banded plan and has no all-pairs equivalent), and
# band buckets above SIMHASH_BAND_CAP are excluded from candidates.
_SIMHASH_BAND_CTES = f"""srep AS (
  SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
), s AS (
  SELECT doc_id, {X.simhash_sql('text')} AS sh FROM srep
), sbands AS (
  SELECT doc_id, sh, b.b AS band_id, (sh >> (15 * b.b)) & 32767 AS band_val
  FROM s, (SELECT unnest(generate_series(0, 3)) AS b) b
), sfreq AS (
  SELECT band_id, band_val, count(*) AS nb FROM sbands GROUP BY 1, 2
)"""

def _simhash_bands(d: DataFrame) -> DataFrame:
    """(doc_id, sh, band_id, band_val) rows from a (doc_id, sh) frame —
    shared by dedup_simhash and dedup_band_guard.

    4 bands of 15 bits: band b value = (sh >> 15b) & 0x7FFF. Integer shift/
    mask, NOT the old %-then-/ form — float division of values near 2^60
    loses mantissa bits and would corrupt band keys. Round 4 widened the
    bands 8 -> 15 bits with the 60-bit hash: random band collisions scale
    ~n²/2^(bits+1), and the sf1 scale probe showed 8-bit bands going
    quadratic (heap OOM) at 50k docs while the hamming≤3 pigeonhole
    guarantee is band-width-independent."""
    return d.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("sh", 15 * b)
                        .bitwiseAND(F.lit(0x7FFF))
                        .cast("long")
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sh", "band.band_id", "band.band_val")


_SIMHASH_PAIRS_SQL = f"""{_SIMHASH_BAND_CTES}, sim_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         bit_count(xor(a.sh, c.sh))::BIGINT AS hamming
  FROM sbands a
  JOIN sfreq f ON f.band_id = a.band_id AND f.band_val = a.band_val
              AND f.nb <= {SIMHASH_BAND_CAP}
  JOIN sbands c
    ON a.band_id = c.band_id AND a.band_val = c.band_val AND a.doc_id < c.doc_id
  WHERE bit_count(xor(a.sh, c.sh)) <= {SIMHASH_MAX_HAMMING}
)"""

_SIMHASH_ORACLE = f"""
WITH {_SIMHASH_PAIRS_SQL}
SELECT doc_a, doc_b, hamming FROM sim_pairs
ORDER BY doc_a, doc_b
"""


@query(
    "dedup_simhash",
    _SIMHASH_ORACLE,
    doc="SimHash near-dup: 4 15-bit bands of the 60-bit hash as LSH keys; "
        "hamming ≤ 3 ⇒ pigeonhole guarantees a shared band, so the banded "
        "equi-join finds exactly the brute-force pair set. Width chosen by "
        "the sf1 scale probe: random band collisions are ~n²/2^(bits+1), "
        "so 8-bit bands went quadratic (OOM) at 50k docs while 15-bit "
        "bands keep the candidate set linear-ish far past it. "
        "Flood-guarded (VERDICT r4): exact dups collapse to one "
        "representative before hashing, and band buckets larger than "
        f"{SIMHASH_BAND_CAP} reps are dropped from candidate generation",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hash kernel materialized once (the collapse shuffle + UDF would
    # otherwise run per consumer below); capped bands materialized once
    # more since they feed BOTH self-join sides
    d = _collapse_exact_docs(_spread(load(spark, sf_dir, "documents"))).select(
        "doc_id",
        X.text_hashes_udf()(F.col("text")).getField("simhash").alias("sh"),
    ).localCheckpoint(eager=False)
    bands = _cap_band_buckets(
        _simhash_bands(d), ["band_id", "band_val"], SIMHASH_BAND_CAP
    ).localCheckpoint(eager=False)
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band_id") == F.col("c.band_id"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("c.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).where(
        F.col("hamming") <= SIMHASH_MAX_HAMMING
    )


# edges must be MATERIALIZED: DuckDB otherwise inlines the CTE chain into
# every recursive step, re-running the O(n²) simhash pair scan per round
# (19 s → 0.4 s at sf0.01)
_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_SIMHASH_PAIRS_SQL},
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM sim_pairs
  UNION
  SELECT doc_b, doc_a FROM sim_pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, w.lbl FROM walk w JOIN edges e ON e.dst = w.id
),
replab AS (SELECT id AS rep_id, min(lbl) AS cluster_id FROM walk GROUP BY id),
grp AS (
  SELECT min(doc_id) AS rep_id, count(*) AS n_copies, text
  FROM documents GROUP BY text
),
-- expansion: every member of a text-group inherits its representative's
-- component label (min doc_id over the full membership, since each rep is
-- the min of its own group); exact-dup groups (n_copies >= 2) whose rep
-- has no near-dup edge still form their own cluster (label = rep_id)
memb AS (
  SELECT d.doc_id, coalesce(r.cluster_id, g.rep_id) AS cluster_id
  FROM documents d
  JOIN grp g ON g.text IS NOT DISTINCT FROM d.text
  LEFT JOIN replab r ON r.rep_id = g.rep_id
  WHERE r.rep_id IS NOT NULL OR g.n_copies >= 2
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size,
       (doc_id = cluster_id) AS is_keeper
FROM memb ORDER BY doc_id
"""


@query(
    "dedup_clusters",
    _CLUSTERS_ORACLE,
    doc="near-dup clustering: SimHash pairs (flood-guarded, over exact-dup "
        "representatives) → connected components (min-label propagation + "
        "pointer jumping, operators/components.py) → labels EXPANDED back "
        "to every member of each exact-dup text group, so cluster "
        "membership still covers all docs while pair generation runs on "
        "representatives only. Fixes the chain-dup over-delete that "
        "pairwise dedup alone causes (a~b, b~c ⇒ keep only min(a,b,c)); "
        "the oracle is a recursive-CTE transitive closure over the same "
        "pair set plus the same expansion",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from skyline_spark.operators.components import connected_components

    pairs = dedup_simhash(spark, sf_dir)
    lab = connected_components(pairs, src="doc_a", dst="doc_b")
    # expansion: rep labels → every member of the rep's exact-dup text
    # group (cluster_id stays the min doc_id over the full membership —
    # each rep is the min of its own group). Unpaired groups of >= 2
    # byte-identical docs cluster on their rep id.
    # NOTE: this re-scans documents and re-aggregates the exact-dup groups
    # that _collapse_exact_docs (inside the dedup_simhash call above) also
    # computed — the collapse there is fused into the simhash plan behind a
    # localCheckpoint barrier and only exposes (doc_id, text), so the
    # (rep_id, n_copies) rollup cannot be read back across the function
    # boundary. One extra md5+groupBy pass over the corpus; both sides key
    # on _exact_group_key() so they can never disagree.
    d = _spread(load(spark, sf_dir, "documents"))
    key = _exact_group_key()
    grp = d.groupBy(key.alias("_k")).agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )
    memb = (
        d.select("doc_id", key.alias("_k"))
        .join(grp, "_k")
        .join(
            lab.select(F.col("id").alias("rep_id"), "cluster_id"),
            "rep_id",
            "left",
        )
        .where(F.col("cluster_id").isNotNull() | (F.col("n_copies") >= 2))
        .select(
            "doc_id", F.coalesce("cluster_id", "rep_id").alias("cluster_id")
        )
    )
    w = Window.partitionBy("cluster_id")
    return memb.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


_NGRAM_ORACLE = (
    _DOC_CTE
    + f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       floor(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))) * 1000000 + 0.5) / 1000000 AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(a.sh) > 0 AND len(b.sh) > 0
  AND len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(list_concat(a.sh, b.sh))) >= {NGRAM_JACCARD_T}
ORDER BY doc_a, doc_b
"""
)


@query(
    "dedup_ngram_jaccard",
    _NGRAM_ORACLE,
    doc="3-gram shingle Jaccard within language groups (exact pairwise form; "
        "the scale path is dedup_minhash_lsh — this is its verification oracle)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(load(spark, sf_dir, "documents"))
    sh = (
        d.select("doc_id", "lang", X.tokens_expr(F.col("text")).alias("toks"))
        .select(
            "doc_id", "lang", X.shingles_from_tokens_expr(F.col("toks")).alias("sh")
        )
        .where(F.size("sh") > 0)
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(
        b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    jac = F.size(F.array_intersect("a.sh", "b.sh")).cast("double") / F.size(
        F.array_union("a.sh", "b.sh")
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        X.r6(jac).alias("jaccard"),
        jac.alias("_j"),
    ).where(F.col("_j") >= NGRAM_JACCARD_T).drop("_j")


# ---------------------------------------------------------------------------
# LSH quality measurement: candidate recall vs the exact pair set
# ---------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH reps AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
), exact AS (
  SELECT doc_a, doc_b FROM ({_NGRAM_ORACLE.replace("ORDER BY doc_a, doc_b", "")})
  WHERE doc_a IN (SELECT doc_id FROM reps)
    AND doc_b IN (SELECT doc_id FROM reps)
), lsh AS (
  SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE.replace("ORDER BY doc_a, doc_b", "")})
)
SELECT count(*)::BIGINT AS n_exact,
       (SELECT count(*) FROM lsh)::BIGINT AS n_lsh,
       count(l.doc_a)::BIGINT AS n_matched,
       {X.r6_sql('count(l.doc_a)::DOUBLE / greatest(count(*), 1)')} AS recall
FROM exact e LEFT JOIN lsh l USING (doc_a, doc_b)
"""


@query(
    "dedup_lsh_recall",
    _RECALL_ORACLE,
    doc="measures MinHash-LSH candidate recall against the exact pairwise "
        "Jaccard pair set — the number that justifies shipping the LSH plan "
        "at scale. Both sides are restricted to the same collapsed corpus: "
        "the LSH path runs on exact-dup representatives (the r5 flood "
        "guard), so the exact pair set keeps only rep–rep pairs too — "
        "otherwise pairs to collapsed-away copies would deflate recall for "
        "reasons unrelated to banding quality (exact-dup pairs are the "
        "collapse stage's catch, not LSH's). The exact side is O(n²) "
        "within lang blocks, so this is a sampled-scale QUALITY GAUGE (run "
        "at test sf, or on a corpus sample), not a production operator; "
        "the LSH side is the production path",
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    reps = _collapse_exact_docs(
        _spread(load(spark, sf_dir, "documents"))
    ).select("doc_id")
    exact = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .join(reps.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi")
        .join(reps.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
    )
    lsh = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    joined = exact.join(
        lsh.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left"
    )
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        # outer coalesce: SUM over ZERO rows is NULL (count is 0) — an
        # empty exact pair set must report n_matched 0 like the oracle's
        # count(l.doc_a), not NULL
        F.coalesce(F.sum(F.coalesce("hit", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_matched"),
    )
    n_lsh = lsh.agg(F.count(F.lit(1)).cast("long").alias("n_lsh"))
    return agg.crossJoin(n_lsh).select(
        "n_exact",
        "n_lsh",
        "n_matched",
        X.r6(
            F.col("n_matched").cast("double")
            / F.greatest(F.col("n_exact"), F.lit(1))
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# embeddings: cosine dedup + ANN
# ---------------------------------------------------------------------------

def _dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(a):
    return F.sqrt(_dot_expr(a, a))


def _cos_expr(a, b):
    """Cosine with a nullif-guarded denominator: an all-zero vector yields
    NULL (both engines) instead of an ANSI DIVIDE_BY_ZERO crash on the Spark
    side and IEEE inf/nan on the DuckDB side — mirrors ``_cos_sql``."""
    return _dot_expr(a, b) / F.nullif(_norm_expr(a) * _norm_expr(b), F.lit(0.0))


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {EMB_DIM}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)} / "
        f"nullif(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}), 0))"
    )


_EMB_DUP_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {EMB_COS_DUP_T}
ORDER BY vec_a, vec_b
"""


@query(
    "dedup_embedding_cosine",
    _EMB_DUP_ORACLE,
    doc="embedding near-dup, exact pairwise within label blocks — this is "
        "the VERIFICATION ORACLE for dedup_embedding_lsh (O(n²) within "
        "blocks by design; the engine/scale path is the banded LSH "
        "equi-join below)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _spread(load(spark, sf_dir, "embeddings"))
    a, b = e.alias("a"), e.alias("b")
    cos = _cos_expr(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cos, 6).alias("cosine"),
            cos.alias("_c"),
        )
        .where(F.col("_c") >= EMB_COS_DUP_T)
        .drop("_c")
    )


_ANN_IDS = ", ".join(str(i) for i in ANN_QUERY_IDS)

_ANN_ORACLE = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN ({_ANN_IDS})),
ranked AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql('q.embedding', 'c.embedding')} AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_cos_sql('q.embedding', 'c.embedding')} DESC, c.vec_id
         ) AS rank
  FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""


@query(
    "ann_cosine_topk",
    _ANN_ORACLE,
    doc="brute-force cosine top-k: broadcast the (tiny) query set against the "
        "corpus — one scan, no shuffle of the corpus side",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _spread(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cos = _cos_expr(F.col("q_emb"), F.col("c_emb"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= ANN_TOPK)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


# --- LSH-bucketed ANN (the scale path) -------------------------------------

def _plane_dot_sql(emb: str, i: int) -> str:
    w = _w_sql(str(i), "i")
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {EMB_DIM}), "
        f"i -> {emb}[i]::DOUBLE * {w})), (acc, x) -> acc + x)"
    )


def _lsh_band_sql(emb: str, b: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_plane_dot_sql(emb, b * LSH_BAND_BITS + r)} > 0 THEN {1 << r} ELSE 0 END)"
        for r in range(LSH_BAND_BITS)
    )
    return f"({bits})"


_LSH_ORACLE = f"""
WITH sigs AS (
  SELECT vec_id, embedding,
         {', '.join(f"{_lsh_band_sql('embedding', b)} AS band{b}" for b in range(LSH_BANDS))}
  FROM embeddings
), q AS (SELECT * FROM sigs WHERE vec_id IN ({_ANN_IDS})),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS q_emb, c.embedding AS c_emb
  FROM q JOIN sigs c
    ON c.vec_id <> q.vec_id
   AND ({' OR '.join(f'q.band{b} = c.band{b}' for b in range(LSH_BANDS))})
), ranked AS (
  SELECT query_id, neighbor_id, {_cos_sql('q_emb', 'c_emb')} AS cos,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY {_cos_sql('q_emb', 'c_emb')} DESC, neighbor_id
         ) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {LSH_TOPK} ORDER BY query_id, rank
"""


_W_MATRIX = None


def _w_matrix():
    global _W_MATRIX
    if _W_MATRIX is None:
        _W_MATRIX = np.array(
            [[_w(i, j) for j in range(1, EMB_DIM + 1)] for i in range(LSH_PLANES)],
            dtype=np.float64,
        )
    return _W_MATRIX


def _lsh_bands_pudf():
    """Arrow-batched signature kernel: all LSH_PLANES hyperplane dots per vector in
    one numpy pass. The per-plane dot uses ``np.add.accumulate`` — the exact
    LEFT-FOLD summation order of the DuckDB oracle's ``list_reduce`` (and of
    the previous Catalyst ``aggregate`` expression), so signatures stay
    bit-identical across engines while running ~10× faster than the
    interpreted higher-order-function fold (HOFs don't codegen)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def bands(emb: pd.Series) -> pd.Series:
        W = _w_matrix()  # (planes, dim)
        V = np.vstack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        # one plane at a time: the broadcast (n, planes, dim) form costs
        # batch_rows × 64 × 64 × 8 B ≈ 2 GB per 65k-row Arrow batch — a
        # per-plane (n, dim) temporary is ~32 MB and keeps the identical
        # per-plane left-fold order
        dots = np.empty((V.shape[0], LSH_PLANES), dtype=np.float64)
        for p in range(LSH_PLANES):
            dots[:, p] = np.add.accumulate(V * W[p], axis=1)[:, -1]
        bits = (dots > 0).astype(np.int32)  # (n, planes)
        out = np.zeros((V.shape[0], LSH_BANDS), dtype=np.int32)
        for b in range(LSH_BANDS):
            for r in range(LSH_BAND_BITS):
                out[:, b] += bits[:, b * LSH_BAND_BITS + r] << r
        return pd.Series(list(out))

    return bands


def _lsh_sigs(e) -> DataFrame:
    """(vec_id, band0..bandN) signature frame shared by the ANN and dedup
    LSH paths."""
    bands = _lsh_bands_pudf()
    sig = e.select("vec_id", bands(F.col("embedding")).alias("_bands"))
    return sig.select(
        "vec_id",
        *[F.col("_bands")[b].alias(f"band{b}") for b in range(LSH_BANDS)],
    )


@query(
    "ann_lsh_topk",
    _LSH_ORACLE,
    doc=f"random-hyperplane LSH ANN: {LSH_PLANES}-bit signature "
        f"({LSH_BANDS} bands × {LSH_BAND_BITS} bits) exploded to "
        "(vec_id, band_id, band_val) rows on BOTH sides, candidates from a "
        "hash EQUI-join on (band_id, band_val) — the shape that "
        "hash-partitions at any query-set size (an OR-of-band-equalities "
        "predicate would force a nested-loop join) — then exact cosine "
        "re-rank of candidates fetched back by id",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _spread(load(spark, sf_dir, "embeddings"))
    sigs = _lsh_sigs(e)

    def _bands_of(df, id_alias: str):
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.col(f"band{b}").alias("band_val"),
                        )
                        for b in range(LSH_BANDS)
                    ]
                )
            ).alias("b"),
        ).select(id_alias, F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val"))

    corpus_bands = _bands_of(sigs, "neighbor_id")
    query_bands = _bands_of(
        sigs.where(F.col("vec_id").isin(ANN_QUERY_IDS)), "query_id"
    )
    # equi-join on the band keys: hash-partitionable, so it stays a hash/SMJ
    # join at ANY query-set size (broadcast here only because this query set
    # is tiny); distinct collapses multi-band collisions to one pair
    cand = (
        corpus_bands.join(F.broadcast(query_bands), ["band_id", "band_val"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_emb = e.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c_emb = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cand = cand.join(F.broadcast(q_emb), "query_id").join(c_emb, "neighbor_id")
    cos = _cos_expr(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= LSH_TOPK)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


# --- IVF-style ANN (inverted-file cells, the other scale path) -------------

IVF_K = 16        # centroid / cell count
IVF_NPROBE = 4    # cells searched per query

_IVF_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < {IVF_K}
), ac AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_cos_sql('e.embedding', 'c.cemb')} AS cc
  FROM embeddings e, cent c
), cell AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn
    FROM ac
  ) WHERE rn = 1
), qprobe AS (
  SELECT vec_id AS query_id, embedding AS qemb, cid FROM (
    SELECT a.*, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn
    FROM ac a WHERE vec_id IN ({_ANN_IDS})
  ) WHERE rn <= {IVF_NPROBE}
), ranked AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {_cos_sql('q.qemb', 'v.embedding')} AS cos,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY {_cos_sql('q.qemb', 'v.embedding')} DESC, v.vec_id
         ) AS rank
  FROM qprobe q JOIN cell v ON v.cid = q.cid
  WHERE v.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""


@query(
    "ann_ivf_topk",
    _IVF_ORACLE,
    doc=f"IVF-style ANN: every vector is assigned to its nearest of {IVF_K} "
        f"seed centroids (broadcast cross join, K tiny rows per vector, then "
        f"a per-vector argmax; in production the K centroids inline as plan "
        f"literals and assignment is a pure map stage), and a query searches "
        f"only its {IVF_NPROBE} nearest cells — the classic "
        "inverted-file recall/cost dial. Seed centroids (first K corpus "
        "vectors) stand in for k-means training; each Lloyd iteration at "
        "scale is the SAME broadcast-join + groupBy-average plan shape. At "
        "10^12 rows cells become bucketed table partitions so a probe is a "
        "partition-pruned scan. Cosines fold left in array order in both "
        "engines, so cell argmax and ranks are bit-deterministic",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _spread(load(spark, sf_dir, "embeddings"))
    cent = e.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    cc = _cos_expr(F.col("embedding"), F.col("cemb"))
    ac = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "cid", cc.alias("cc")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cc").desc(), F.col("cid")
    )
    ranked_cells = ac.withColumn("rn", F.row_number().over(w_assign))
    cell = ranked_cells.where(F.col("rn") == 1).select(
        "vec_id", "embedding", "cid"
    )
    qprobe = (
        ranked_cells.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        .where(F.col("rn") <= IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qemb"),
            "cid",
        )
    )
    cos = _cos_expr(F.col("qemb"), F.col("embedding"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        cell.join(F.broadcast(qprobe), "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= ANN_TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("cosine"),
        )
    )


# --- LSH-bucketed embedding dedup (the scale path) -------------------------

def _emb_bands(sigs: DataFrame) -> DataFrame:
    """(vec_id, band_id, band_val) rows from a wide (vec_id, band0..bandN)
    signature frame — shared by dedup_embedding_lsh and dedup_band_guard."""
    return sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_val")
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select(
        "vec_id",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_val").alias("band_val"),
    )


# WITH-less fragment: composed by _EMB_LSH_DUP_ORACLE and _BAND_GUARD_ORACLE
_EMB_BAND_CTES = f"""erep AS (
  SELECT min(vec_id) AS vec_id, embedding FROM embeddings GROUP BY embedding
), esigs AS (
  SELECT vec_id, embedding,
         {', '.join(f"{_lsh_band_sql('embedding', b)} AS band{b}" for b in range(LSH_BANDS))}
  FROM erep
), eb AS (
  SELECT vec_id, b.b AS band_id,
         CASE b.b {' '.join(f'WHEN {b} THEN band{b}' for b in range(LSH_BANDS))} END AS band_val
  FROM esigs, (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS b) b
), efreq AS (
  SELECT band_id, band_val, count(*) AS nb FROM eb GROUP BY 1, 2
)"""

_EMB_LSH_DUP_ORACLE = f"""
WITH {_EMB_BAND_CTES}, cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM eb a
  JOIN efreq f ON f.band_id = a.band_id AND f.band_val = a.band_val
              AND f.nb <= {EMB_BAND_CAP}
  JOIN eb c ON c.band_id = a.band_id AND c.band_val = a.band_val
           AND c.vec_id > a.vec_id
), withemb AS (
  SELECT cand.vec_a, cand.vec_b, ra.embedding AS a_emb, rb.embedding AS b_emb
  FROM cand
  JOIN erep ra ON ra.vec_id = cand.vec_a
  JOIN erep rb ON rb.vec_id = cand.vec_b
)
SELECT vec_a, vec_b, round({_cos_sql('a_emb', 'b_emb')}, 6) AS cosine
FROM withemb WHERE {_cos_sql('a_emb', 'b_emb')} >= {EMB_COS_DUP_T}
ORDER BY vec_a, vec_b
"""


@query(
    "dedup_embedding_lsh",
    _EMB_LSH_DUP_ORACLE,
    doc="embedding near-dup at scale: random-hyperplane signatures exploded "
        "to (vec_id, band_id, band_val) and self-equi-joined on the band "
        "keys — candidate volume is per-bucket, never all-pairs — then "
        "exact cosine ≥ 0.9 verification of candidates only. The oracle "
        "restates the same exploded (vec_id, band_id, band_val) shape that "
        "hash-partitions at 10^12 rows. Flood-guarded (VERDICT r4): "
        "byte-identical vectors collapse to one representative before "
        f"signatures, and band buckets larger than {EMB_BAND_CAP} reps are "
        "dropped from candidate generation. dedup_embedding_cosine is the "
        "exact pairwise verification oracle for recall spot-checks",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-dup pre-collapse: identical vectors (a re-crawled page embeds
    # identically) group to min vec_id — group key is the raw float array,
    # exact equality in both engines on the same parquet values.
    # Re-_spread after the groupBy: AQE coalesces the tiny aggregate
    # output to ~1 partition, which would single-task the signature kernel
    e = _spread(
        _spread(load(spark, sf_dir, "embeddings"))
        .groupBy("embedding")
        .agg(F.min("vec_id").alias("vec_id"))
    )
    # signatures materialized ONCE (localCheckpoint, like dedup_minhash_lsh):
    # the self-join would otherwise recompute the signature kernel on BOTH
    # sides — doubling the most expensive stage at any scale
    sigs = _lsh_sigs(e).localCheckpoint()
    # capped bands feed both join sides below — barrier after the cap
    bands = _cap_band_buckets(
        _emb_bands(sigs), ["band_id", "band_val"], EMB_BAND_CAP
    ).localCheckpoint(eager=False)
    lo = bands.select(
        F.col("vec_id").alias("vec_a"), "band_id", "band_val"
    )
    hi = bands.select(
        F.col("vec_id").alias("vec_b"), "band_id", "band_val"
    )
    # multi-band duplicate candidates are NOT deduped before verification:
    # band overlap here is ~10%, so a pre-verify dropDuplicates costs a full
    # candidate-width shuffle to save 10% of a cheap vectorized fold — the
    # dedup runs after the cosine filter, on the few surviving pairs
    cand = (
        lo.join(hi, ["band_id", "band_val"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    # per-VECTOR norms computed once (the naive per-pair form folds each
    # norm again for every candidate the vector appears in); the per-PAIR
    # dot runs in the Arrow-batched left-fold kernel — candidate volume is
    # O(pairs·dim), the stage that dominates verification
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _fold_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        return pd.Series(np.add.accumulate(A * B, axis=1)[:, -1])

    e_n = e.select(
        "vec_id", "embedding", _norm_expr(F.col("embedding")).alias("norm")
    ).localCheckpoint()
    a_emb = e_n.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
    )
    b_emb = e_n.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        F.col("norm").alias("b_norm"),
    )
    # broadcast the embedding fetch: the vector table is the SMALL side of
    # the candidate join by construction (candidates are O(pairs), vectors
    # O(n)); at corpus scales past broadcast range this becomes a shuffled
    # hash join on vec_id — the plan shape AQE already picks
    cand = cand.join(F.broadcast(a_emb), "vec_a").join(
        F.broadcast(b_emb), "vec_b"
    )
    cos = _fold_dot(F.col("a_emb"), F.col("b_emb")) / F.nullif(
        F.col("a_norm") * F.col("b_norm"), F.lit(0.0)
    )
    return (
        cand.select("vec_a", "vec_b", cos.alias("_c"))
        .where(F.col("_c") >= EMB_COS_DUP_T)
        .dropDuplicates(["vec_a", "vec_b"])
        .select("vec_a", "vec_b", F.round("_c", 6).alias("cosine"))
    )


# --- flood-guard observability ---------------------------------------------

def _guard_stanza(family: str, freq_cte: str, cap: int, items_tbl: str, reps_cte: str) -> str:
    return f"""
  SELECT '{family}' AS family,
         (SELECT count(*) FROM {items_tbl})::BIGINT AS n_items,
         (SELECT count(*) FROM {reps_cte})::BIGINT AS n_reps,
         count(*)::BIGINT AS n_buckets,
         coalesce(max(nb), 0)::BIGINT AS max_bucket,
         coalesce(sum(CASE WHEN nb > {cap} THEN 1 ELSE 0 END), 0)::BIGINT AS capped_buckets,
         coalesce(sum(CASE WHEN nb > {cap} THEN nb ELSE 0 END), 0)::BIGINT AS capped_items
  FROM {freq_cte}"""


_BAND_GUARD_ORACLE = f"""
WITH {_MINHASH_BAND_CTES},
{_SIMHASH_BAND_CTES},
{_EMB_BAND_CTES}
SELECT * FROM ({_guard_stanza('minhash', 'mfreq', MINHASH_BAND_CAP, 'documents', 'rep')}
) UNION ALL SELECT * FROM ({_guard_stanza('simhash', 'sfreq', SIMHASH_BAND_CAP, 'documents', 'srep')}
) UNION ALL SELECT * FROM ({_guard_stanza('embedding', 'efreq', EMB_BAND_CAP, 'embeddings', 'erep')}
) ORDER BY family
"""


@query(
    "dedup_band_guard",
    _BAND_GUARD_ORACLE,
    doc="flood-guard observability for the three banded near-dup paths: per "
        "family the exact-dup collapse ratio (n_items vs n_reps) and the "
        "band-bucket size distribution — bucket count, max bucket, and the "
        "DROPPED MASS (buckets over the cap and the reps inside them) that "
        "the frequency cap excluded from candidate generation. This is the "
        "run report a 100-TB dedup job logs alongside its pair output; a "
        "nonzero capped_items row is the signal that a boilerplate flood "
        "was contained (and what its recall cost was)",
)
def dedup_band_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(load(spark, sf_dir, "documents"))
    reps = _collapse_exact_docs(d)
    msh = reps.select(
        "doc_id", X.shingles_udf()(F.col("text")).alias("sh")
    ).where(F.size("sh") > 0)
    mb = _minhash_bands_from_sig(
        msh.select("doc_id", _minhash_from_shingles(F.col("sh")).alias("sig"))
    )
    sb = _simhash_bands(
        reps.select(
            "doc_id",
            X.text_hashes_udf()(F.col("text")).getField("simhash").alias("sh"),
        )
    )
    emb = _spread(load(spark, sf_dir, "embeddings"))
    erep = _spread(
        emb.groupBy("embedding").agg(F.min("vec_id").alias("vec_id"))
    )
    ebands = _emb_bands(_lsh_sigs(erep))

    def stanza(family, bands, keys, cap, items, rep_frame):
        freq = bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("nb"))
        agg = freq.agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.coalesce(F.max("nb"), F.lit(0)).cast("long").alias("max_bucket"),
            F.coalesce(
                F.sum(F.when(F.col("nb") > cap, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("capped_buckets"),
            F.coalesce(
                F.sum(F.when(F.col("nb") > cap, F.col("nb")).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("capped_items"),
        )
        # 1-row broadcast totals (house crossJoin pattern) — no driver collect
        n_items = items.agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        n_reps = rep_frame.agg(F.count(F.lit(1)).cast("long").alias("n_reps"))
        return (
            agg.crossJoin(F.broadcast(n_items))
            .crossJoin(F.broadcast(n_reps))
            .select(
                F.lit(family).alias("family"),
                "n_items", "n_reps", "n_buckets", "max_bucket",
                "capped_buckets", "capped_items",
            )
        )

    return (
        stanza("minhash", mb, ["band_id", "band_key"], MINHASH_BAND_CAP, d, reps)
        .unionByName(
            stanza("simhash", sb, ["band_id", "band_val"], SIMHASH_BAND_CAP, d, reps)
        )
        .unionByName(
            stanza("embedding", ebands, ["band_id", "band_val"], EMB_BAND_CAP, emb, erep)
        )
        .orderBy("family")
    )


# ---------------------------------------------------------------------------
# repetition-based quality (Gopher-style) + stratified sampling
# ---------------------------------------------------------------------------

# Gopher repetition rules (Rae et al. 2021, "Scaling Language Models",
# table A1) restated over the documents table: a doc is repetition-flagged
# when its most frequent word dominates or its 3-grams are mostly repeats.
TOP_WORD_FRAC_T = 0.20
DUP_3GRAM_FRAC_T = 0.50

_REPETITION_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({X.tokens_sql('text')}) AS w FROM documents
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
), wagg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, max(c)::BIGINT AS top_c
  FROM wc GROUP BY doc_id
), tg AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              ELSE [] END AS tgs
  FROM (SELECT doc_id, {X.tokens_sql('text')} AS t FROM documents)
), tagg AS (
  SELECT doc_id,
         CASE WHEN len(tgs) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(tgs))::DOUBLE / len(tgs) END AS dupf
  FROM tg
)
SELECT w.doc_id,
       w.n_tokens,
       {X.r6_sql('w.top_c::DOUBLE / w.n_tokens')} AS top_word_frac,
       {X.r6_sql('t.dupf')} AS dup_3gram_frac,
       (w.top_c::DOUBLE / w.n_tokens > {TOP_WORD_FRAC_T}
        OR t.dupf > {DUP_3GRAM_FRAC_T}) AS repetition_flagged
FROM wagg w JOIN tagg t USING (doc_id)
ORDER BY doc_id
"""


@query(
    "text_repetition",
    _REPETITION_ORACLE,
    doc="Gopher-style repetition quality: top-word fraction (explode → "
        "count, map-side partial agg) + duplicate-3-gram fraction "
        "(array_distinct/size expressions, no explode); both codegen/"
        "shuffle-on-doc_id plans that hold at 10^12 docs",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(load(spark, sf_dir, "documents"))
    toks = d.select("doc_id", X.tokens_expr(F.col("text")).alias("t"))
    wc = (
        toks.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .count()
    )
    wagg = wc.groupBy("doc_id").agg(
        F.sum("count").cast("long").alias("n_tokens"),
        F.max("count").cast("long").alias("top_c"),
    )
    tg = toks.select("doc_id", _tgs_expr(F.col("t")).alias("tgs"))
    tagg = tg.select("doc_id", _dupf_expr(F.col("tgs")).alias("dupf"))
    top_frac = F.col("top_c").cast("double") / F.col("n_tokens")
    return wagg.join(tagg, "doc_id").select(
        "doc_id",
        "n_tokens",
        X.r6(top_frac).alias("top_word_frac"),
        X.r6(F.col("dupf")).alias("dup_3gram_frac"),
        (
            (top_frac > TOP_WORD_FRAC_T) | (F.col("dupf") > DUP_3GRAM_FRAC_T)
        ).alias("repetition_flagged"),
    )


#: per-mille keep rates per lang for the deterministic stratified sample
SAMPLE_RATES = {"en": 300, "zh": 150}
SAMPLE_RATE_DEFAULT = 100


def _sample_rate_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items())
    )
    return f"CASE lang {cases} ELSE {SAMPLE_RATE_DEFAULT} END"


@query(
    "sample_stratified",
    f"""
    SELECT doc_id, lang,
           ({_sample_rate_sql()})::BIGINT AS rate_per_mille
    FROM documents
    WHERE {X.h32_sql("concat('sample:', doc_id::VARCHAR)")} % 1000
          < ({_sample_rate_sql()})
    ORDER BY doc_id
    """,
    doc="deterministic per-lang stratified Bernoulli sample: keep iff "
        "h32('sample:'||doc_id) % 1000 < rate(lang). Hash-based (not rand()) "
        "so the sample is reproducible across runs/executors/engines and "
        "stable under repartitioning — the property TABLESAMPLE/rand() "
        "cannot give a distributed pipeline",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(SAMPLE_RATES.items())
        ],
        F.lit(SAMPLE_RATE_DEFAULT),
    )
    keep = (
        X.h32(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 1000
        < rate
    )
    return d.where(keep).select(
        "doc_id", "lang", rate.cast("long").alias("rate_per_mille")
    )


# ---------------------------------------------------------------------------
# passage-level exact dedup (CCNet/RefinedWeb line-dedup analog)
# ---------------------------------------------------------------------------

PASSAGE_TOKENS = 8          # non-overlapping chunk size
DUP_PASSAGE_FRAC_T = 0.30   # flag docs whose dup-passage share exceeds this

_PASSAGE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {X.tokens_sql('text')} AS t FROM documents
), pas AS (
  SELECT doc_id,
         list_transform(
           case when len(t) >= {PASSAGE_TOKENS}
                then generate_series(0, len(t) // {PASSAGE_TOKENS} - 1)
                else []::BIGINT[] end,
           i -> {X.h32_sql(f"array_to_string(t[i * {PASSAGE_TOKENS} + 1 : (i + 1) * {PASSAGE_TOKENS}], ' ')")}
         ) AS ph
  FROM tok
), ex AS (
  SELECT doc_id, unnest(ph) AS h FROM pas
), freq AS (
  SELECT h, count(*) AS c FROM ex GROUP BY h
), perdoc AS (
  SELECT e.doc_id,
         count(*) AS n_passages,
         sum(CASE WHEN f.c >= 2 THEN 1 ELSE 0 END) AS n_dup_passages
  FROM ex e JOIN freq f USING (h)
  GROUP BY e.doc_id
)
SELECT doc_id,
       n_passages::BIGINT AS n_passages,
       n_dup_passages::BIGINT AS n_dup_passages,
       {X.r6_sql('n_dup_passages / n_passages')} AS dup_passage_frac,
       (n_dup_passages / n_passages) > {DUP_PASSAGE_FRAC_T} AS passage_flagged
FROM perdoc ORDER BY doc_id
"""


@query(
    "dedup_passages",
    _PASSAGE_ORACLE,
    doc="passage-level exact dedup (CCNet/RefinedWeb line-dedup analog; the "
        "reference's closest op is Roomba timestamp dedup, horizon/roomba.py"
        ":86-181): docs split into non-overlapping 8-token passages, each "
        "h32-hashed; a passage occurring >=2 times corpus-wide is duplicated, "
        "and docs whose duplicated share exceeds 30% are flagged. Plan: one "
        "scan -> explode -> count on the passage hash (map-side partial agg) "
        "-> equi-join back on the hash -> per-doc agg. Both shuffles move "
        "only (doc_id, hash8) pairs; boilerplate passages are the classic "
        "hot keys and split under AQE skew-join at 10^12 docs",
)
def dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", X.tokens_expr(F.col("text")).alias("t"))
    n_chunks = (F.size("t") / PASSAGE_TOKENS).cast("long")
    chunk = F.when(
        F.size("t") >= PASSAGE_TOKENS,
        F.transform(
            F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
            lambda i: X.h32(
                F.concat_ws(
                    " ",
                    F.slice(F.col("t"), i * PASSAGE_TOKENS + 1, PASSAGE_TOKENS),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # exploded (doc_id, hash8) pairs materialized ONCE (localCheckpoint, like
    # dedup_minhash_lsh staging): the freq branch and the join-back branch
    # would otherwise each rescan + retokenize the full text column
    ex = toks.select("doc_id", F.explode(chunk).alias("h")).localCheckpoint()
    freq = ex.groupBy("h").agg(F.count("*").alias("c"))
    perdoc = (
        ex.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_passages"),
            F.sum((F.col("c") >= 2).cast("long")).alias("n_dup_passages"),
        )
    )
    frac = F.col("n_dup_passages").cast("double") / F.col("n_passages")
    return perdoc.select(
        "doc_id",
        "n_passages",
        "n_dup_passages",
        X.r6(frac).alias("dup_passage_frac"),
        (frac > DUP_PASSAGE_FRAC_T).alias("passage_flagged"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top-k salient terms per doc
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3

_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({X.tokens_sql('text')}) AS w FROM documents
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w
), df AS (
  SELECT w, count(*) AS df FROM (SELECT DISTINCT doc_id, w FROM tf) GROUP BY w
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM tf
), scored AS (
  SELECT t.doc_id, t.w,
         t.tf * (n.n_docs + 1.0) / (d.df + 1.0) AS tfidf
  FROM tf t JOIN df d USING (w) CROSS JOIN n
), ranked AS (
  SELECT doc_id, w, tfidf,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, w
         ) AS rank
  FROM scored
)
SELECT doc_id, rank::BIGINT AS rank, w AS term, {X.r6_sql('tfidf')} AS tfidf
FROM ranked WHERE rank <= {TFIDF_TOPK} ORDER BY doc_id, rank
"""


@query(
    "text_tfidf_topk",
    _TFIDF_ORACLE,
    doc=f"top-{TFIDF_TOPK} TF-IDF terms per doc — the classic two-pass "
        "aggregate-then-broadcast shape the reference uses for Mirage "
        "(SURVEY 2.5): term frequencies shuffle once on (doc_id, w), the "
        "small document-frequency table broadcasts back, and a per-doc "
        "window picks the top terms. IDF is the rational (N+1)/(df+1) "
        "rather than its logarithm: pure IEEE-754 arithmetic is "
        "bit-identical across engines while libm log implementations are "
        "not, and rank order is unchanged (x -> ln x monotone)",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(X.tokens_expr(F.col("text"))).alias("w"))
    # term frequencies materialized ONCE: the df and n_docs branches reuse
    # them instead of rescanning + retokenizing the text column per branch
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf")).localCheckpoint()
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            (
                F.col("tf") * (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
            ).alias("tfidf"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("w")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= TFIDF_TOPK)
        .select(
            "doc_id",
            "rank",
            F.col("w").alias("term"),
            X.r6(F.col("tfidf")).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic corpus shuffle + training-shard assignment
# ---------------------------------------------------------------------------

N_SHARDS = 8

_SHARD_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         {X.h32_sql("concat('shuf:', doc_id::VARCHAR)")} AS shuffle_key
  FROM documents
)
SELECT doc_id,
       (shuffle_key % {N_SHARDS})::BIGINT AS shard,
       row_number() OVER (
         PARTITION BY shuffle_key % {N_SHARDS}
         ORDER BY shuffle_key, doc_id
       )::BIGINT AS pos
FROM keyed ORDER BY shard, pos
"""


@query(
    "corpus_shuffle_shards",
    _SHARD_ORACLE,
    doc=f"deterministic corpus shuffle into {N_SHARDS} training shards: "
        "shard = h32('shuf:'||doc_id) % n, position = rank of the hash "
        "within the shard. Reproducible across runs/engines/partitionings "
        "(hash order, not rand()), which is what lets a 10^12-doc training "
        "run resume mid-epoch. At scale this is repartition(shard) + "
        "sortWithinPartitions(shuffle_key) + partitioned parquet write — "
        "one shuffle, no global sort; the window here computes the same "
        "in-shard rank relationally so the oracle can check it",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        X.h32(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    ).withColumn("shard", (F.col("shuffle_key") % N_SHARDS).cast("long"))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# composite keep/drop filter pipeline with per-doc reasons
# ---------------------------------------------------------------------------

FILTER_MIN_TOKENS = 20
FILTER_MIN_QUALITY = 0.45

def word_grams_sql(toks: str, k: int = 3) -> str:
    """Occurrence-counted (NON-distinct) word k-gram list over a bound
    token-list expression — the single SQL definition of the word-gram
    rule, shared by the repetition gates (via ``_DUP3_SQL``) and the
    Wimbd-style duplication analysis (``ngram_dup_rate``); the distinct
    form for dedup lives in :func:`functions.text.shingles_sql`, the Spark
    twin is :func:`_tgs_expr`."""
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"case when len({toks}) >= {k} "
        f"then list_transform(range(1, len({toks}) - {k - 2}), i -> {parts}) "
        f"else []::VARCHAR[] end"
    )


#: duplicate-3-gram fraction as a scalar SQL expression over a bound token
#: list ``t`` (the same formula text_repetition's oracle computes in its CTE)
_DUP3_SQL = (
    "CASE WHEN len(t) < 3 THEN 0.0 ELSE "
    f"1.0 - len(list_distinct({word_grams_sql('t')}))::DOUBLE / (len(t) - 2) END"
)


def _tgs_expr(toks):
    """Word-3-gram array from a bound token-array column.

    Callers MUST alias this into its own column before referencing it more
    than once — inlined copies re-run the transform per reference."""
    return F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dupf_expr(tgs):
    """Duplicate-3-gram fraction from a bound 3-gram-array column (Spark
    twin of ``_DUP3_SQL``)."""
    return F.when(F.size(tgs) == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(tgs)).cast("double") / F.size(tgs)
    )


_FILTER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, text, {X.tokens_sql('text')} AS t FROM documents
), sig AS (
  SELECT doc_id,
         len(t)::BIGINT AS n_tokens,
         {X.quality_score_sql('text')} AS quality,
         {X.lang_id_sql('text')} AS lang_guess,
         {_DUP3_SQL} AS dup3
  FROM tok
)
SELECT doc_id, n_tokens, quality,
       coalesce(array_to_string(list_filter([
         CASE WHEN n_tokens < {FILTER_MIN_TOKENS} THEN 'short' END,
         CASE WHEN quality < {FILTER_MIN_QUALITY} THEN 'low_quality' END,
         CASE WHEN dup3 > {DUP_3GRAM_FRAC_T} THEN 'repetitive' END,
         CASE WHEN lang_guess <> 'en' THEN 'lang' END
       ], r -> r IS NOT NULL), ','), '') AS reasons,
       (n_tokens >= {FILTER_MIN_TOKENS} AND quality >= {FILTER_MIN_QUALITY}
        AND dup3 <= {DUP_3GRAM_FRAC_T} AND lang_guess = 'en') AS keep
FROM sig ORDER BY doc_id
"""


@query(
    "filter_pipeline",
    _FILTER_ORACLE,
    doc="FineWeb/Dolma-style composite keep/drop filter with per-doc drop "
        "reasons (comma-joined, canon-safe): min token count, quality-score "
        "floor, duplicate-3-gram repetition cap, and target-language gate, "
        "all from one tokenize. Deliberately a PURE MAP STAGE — every signal "
        "is a Catalyst expression over the row's own text, no shuffle, no "
        "join — because at 10^12 docs this is the first pass that shrinks "
        "the corpus before any shuffling op (dedup, TF-IDF) runs. The "
        "reference's analog is the per-metric gate chain in "
        "analyzer/algorithms.py:560-607 (TooShort/Stale/Boring before the "
        "expensive ensemble)",
)
def filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenize ONCE into a bound array column, then derive every signal from
    # that attribute. Inlining tokens_expr into each signal looks equivalent
    # but is catastrophically slower: higher-order lambdas (the 3-gram
    # element_at calls, the stopword filter) re-evaluate an inlined split per
    # element — O(tokens²) per doc, measured 34s vs <1s at sf0.1.
    tok = _spread(load(spark, sf_dir, "documents")).select(
        "doc_id", X.tokens_expr(F.col("text")).alias("toks")
    )
    tg = tok.select("doc_id", "toks", _tgs_expr(F.col("toks")).alias("tgs"))
    sig = tg.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        X.quality_score_from_tokens_expr(F.col("toks")).alias("quality"),
        X.lang_id_from_tokens_expr(F.col("toks")).alias("lang_guess"),
        _dupf_expr(F.col("tgs")).alias("dup3"),
    )
    reasons = F.array_join(
        F.filter(
            F.array(
                F.when(F.col("n_tokens") < FILTER_MIN_TOKENS, F.lit("short")),
                F.when(F.col("quality") < FILTER_MIN_QUALITY, F.lit("low_quality")),
                F.when(F.col("dup3") > DUP_3GRAM_FRAC_T, F.lit("repetitive")),
                F.when(F.col("lang_guess") != "en", F.lit("lang")),
            ),
            lambda r: r.isNotNull(),
        ),
        ",",
    )
    keep = (
        (F.col("n_tokens") >= FILTER_MIN_TOKENS)
        & (F.col("quality") >= FILTER_MIN_QUALITY)
        & (F.col("dup3") <= DUP_3GRAM_FRAC_T)
        & (F.col("lang_guess") == "en")
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "quality",
        reasons.alias("reasons"),
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination: n-gram overlap against a held-out eval set
# ---------------------------------------------------------------------------

#: shingle width for contamination matching. Real pipelines use 8-13-gram
#: collision (the GPT-3 appendix-C / Dolma decontamination rule); the
#: synthetic corpus is ~60 tokens over a ~40-word vocabulary, where 8-grams
#: never collide, so the TEST BED runs the same plan at k=3 — the parameter,
#: not the plan, changes at production scale.
DECON_K = 3
#: flag a training doc when this fraction of its distinct k-grams appears in
#: the eval set
DECON_OVERLAP_T = 0.05
#: deterministic stand-in eval split: every 97th doc acts as the benchmark
DECON_EVAL_MOD = 97

_DECON_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {X.tokens_sql('text')} AS t FROM documents
), sh AS (
  SELECT doc_id, {X.shingles_sql('t', DECON_K)} AS sh FROM tok
), ev AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % {DECON_EVAL_MOD} = 0
), corp AS (
  SELECT doc_id, sh FROM sh WHERE doc_id % {DECON_EVAL_MOD} <> 0
), grams AS (
  SELECT doc_id, unnest(sh) AS g FROM corp
), hits AS (
  SELECT grams.doc_id, count(ev.g)::BIGINT AS n_matched
  FROM grams LEFT JOIN ev USING (g) GROUP BY grams.doc_id
)
SELECT c.doc_id,
       len(c.sh)::BIGINT AS n_ngrams,
       coalesce(h.n_matched, 0)::BIGINT AS n_matched,
       {X.r6_sql('coalesce(h.n_matched, 0)::DOUBLE / greatest(len(c.sh), 1)')} AS overlap_frac,
       coalesce(h.n_matched, 0)::DOUBLE / greatest(len(c.sh), 1)
         >= {DECON_OVERLAP_T} AS contaminated
FROM corp c LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


@query(
    "decontaminate_ngrams",
    _DECON_ORACLE,
    doc="benchmark decontamination: flag training docs whose distinct "
        f"{DECON_K}-gram shingles overlap a held-out eval set beyond "
        f"{DECON_OVERLAP_T:.0%} (GPT-3-appendix-C / Dolma style). Scale "
        "shape: the eval-gram side is a benchmark suite — megabytes even "
        "when the corpus is 100 TB — so it broadcasts and the corpus makes "
        "exactly one pass: shingle → explode → broadcast-hash probe → "
        "per-doc agg; no corpus-side shuffle beyond the doc_id agg. "
        "Reference analog: the skip-list gate before analysis "
        "(analyzer/analyzer.py skip_list), restated for training-data "
        "hygiene",
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(load(spark, sf_dir, "documents"))
    # Arrow-batched shingle kernel, NOT the expression form: with the token
    # array referenced only once Catalyst collapses the projects and
    # re-inlines the tokenizer into the shingle lambda (O(tokens²)/row —
    # measured 10s vs 1.5s for this query at sf0.1)
    sh = d.select("doc_id", X.shingles_udf(DECON_K)(F.col("text")).alias("sh"))
    ev = (
        sh.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select(F.explode("sh").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corp = sh.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    grams = corp.select("doc_id", F.explode("sh").alias("g"))
    hits = (
        grams.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_matched"))
    )
    overlap = F.coalesce("n_matched", F.lit(0)).cast("double") / F.greatest(
        F.col("n_ngrams"), F.lit(1)
    )
    return (
        corp.select("doc_id", F.size("sh").cast("long").alias("n_ngrams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            X.r6(overlap).alias("overlap_frac"),
            (overlap >= DECON_OVERLAP_T).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# k-means Lloyd iterations (the IVF centroid-training step, made real)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_Q = 1 << 20   # fixed-point quantization scale


def _quant_sql(col: str) -> str:
    return f"list_transform({col}, x -> floor(x * {KMEANS_Q}.0 + 0.5))"


_KMEANS_COS0 = _cos_sql("e.q", "c.cq")
_KMEANS_COS1 = _cos_sql("e.q", "c.cq")

#: shared CTE chain ending at a2 = the second Lloyd assignment (with the
#: quantized vectors kept) — reused verbatim by the kmeans_lloyd oracle here
#: and the semdedup_prune oracle (curation_queries.py), so both engines' and
#: both queries' cluster assignments are definitionally identical
KMEANS_A2_CTES = f"""
e AS (
  SELECT vec_id, {_quant_sql('embedding')} AS q FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < {KMEANS_K}
), a1 AS (
  SELECT vec_id, q, cid AS cluster FROM (
    SELECT e.vec_id, e.q, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {_KMEANS_COS0} DESC, c.cid
           ) AS rn
    FROM e, c0 c
  ) WHERE rn = 1
), x1 AS (
  SELECT cluster, pos,
         sum(q[pos]::BIGINT)::DOUBLE / count(*) AS cv
  FROM a1, generate_series(1, {EMB_DIM}) t(pos)
  GROUP BY cluster, pos
), c1 AS (
  SELECT cluster AS cid, list(cv ORDER BY pos) AS cq FROM x1 GROUP BY cluster
), a2 AS (
  SELECT vec_id, q, cid AS cluster, cos FROM (
    SELECT e.vec_id, e.q, c.cid, {_KMEANS_COS1} AS cos,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {_KMEANS_COS1} DESC, c.cid
           ) AS rn
    FROM e, c1 c
  ) WHERE rn = 1
)"""

_KMEANS_ORACLE = f"""
WITH {KMEANS_A2_CTES}
SELECT vec_id, cluster::BIGINT AS cluster, {X.r6_sql('cos')} AS cosine
FROM a2 ORDER BY vec_id
"""


def _kmeans_assign(e, cents, keep_q: bool):
    """One Lloyd assignment step: nearest centroid by cosine, ties to the
    lower cluster id."""
    from pyspark.sql import Window

    cos = _cos_expr(F.col("q"), F.col("cq"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cid"))
    cols = ["vec_id", "q"] if keep_q else ["vec_id"]
    return (
        e.crossJoin(F.broadcast(cents))
        .select(*cols, "cid", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(*cols, F.col("cid").alias("cluster"), "cos")
    )


def kmeans_a2(spark: SparkSession, sf_dir: str, keep_q: bool) -> DataFrame:
    """The Spark twin of ``KMEANS_A2_CTES``: two unrolled Lloyd iterations,
    returning the second assignment (vec_id, [q,] cluster, cos). Shared by
    kmeans_lloyd and semdedup_prune so their cluster assignments agree."""
    e = _spread(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x * float(KMEANS_Q) + 0.5).cast("double"),
        ).alias("q"),
    )
    c0 = e.where(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    a1 = _kmeans_assign(e, c0, keep_q=True)
    c1 = _kmeans_recenter(a1)
    return _kmeans_assign(e, c1, keep_q=keep_q)


def _kmeans_recenter(assigned):
    """New centroids: exact elementwise integer mean of member vectors."""
    expl = assigned.select("cluster", F.posexplode("q").alias("pos", "qv"))
    comp = expl.groupBy("cluster", "pos").agg(
        (F.sum(F.col("qv").cast("long")).cast("double") / F.count("*")).alias("cv")
    )
    return comp.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s.getField("cv"),
        ).alias("cq")
    ).select(F.col("cluster").alias("cid"), "cq")


@query(
    "kmeans_lloyd",
    _KMEANS_ORACLE,
    doc=f"two unrolled Lloyd iterations of k-means (K={KMEANS_K}, cosine, "
        "seed centroids = first K vectors) — the actual training step the "
        "IVF index (ann_ivf_topk) stands on. Distributed float means are "
        "order-dependent, so components quantize to integers first "
        f"(floor(x*2^20+0.5)): integer sums are exact and associative, the "
        "mean is one deterministic double division, and both engines' "
        "assignments agree bit-for-bit — no tolerance windows. Each "
        "iteration is broadcast(K centroids) + per-vector argmax + one "
        "(cluster, pos) shuffle of scalar components; at 10^12 rows that "
        "shuffle carries K*dim partial sums per map task (map-side "
        "combine), not vectors",
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    a2 = kmeans_a2(spark, sf_dir, keep_q=False)
    return a2.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        X.r6(F.col("cos")).alias("cosine"),
    )


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2022 "Deduplicating Training Data Makes
# Language Models Better", content-defined-window Spark restatement)
# ---------------------------------------------------------------------------

#: duplicated-substring window width, in characters
SUBSTR_W = 40
#: expected anchor spacing: a position is an anchor iff
#: h32(anchor-gram) % SUBSTR_STRIDE == 0 (content-defined, winnowing/CDC
#: style — selection depends on the text, never the doc-start offset, so a
#: verbatim run shared at ARBITRARY offsets selects the SAME run-relative
#: window positions in every doc that carries it)
SUBSTR_STRIDE = 10
#: anchor-gram width fed to the selection hash
SUBSTR_ANCHOR = 8
#: a doc carrying a merged duplicated span at least this long is flagged
SUBSTR_MIN_SPAN = 60

_SUBSTR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lower(text) AS s, length(text) AS n
  FROM documents WHERE length(text) >= {SUBSTR_W}
), anchored AS (
  SELECT doc_id, n, p, md5(substr(s, p, {SUBSTR_W})) AS h
  FROM t, unnest(generate_series(1, n - {SUBSTR_W - 1}, 1)) AS u(p)
  WHERE {X.h32_sql(f"substr(s, p, {SUBSTR_ANCHOR})")} % {SUBSTR_STRIDE} = 0
), freq AS (
  SELECT h FROM anchored GROUP BY h HAVING count(*) >= 2
), dup AS (
  SELECT w.doc_id, w.n, w.p FROM anchored w JOIN freq USING (h)
), brk AS (
  SELECT doc_id, n, p,
         CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {SUBSTR_W}
              THEN 1 ELSE 0 END AS new_span
  FROM dup
), isl AS (
  SELECT doc_id, n, p,
         sum(new_span) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM brk
), spans AS (
  SELECT doc_id, max(n) AS n, span_id,
         max(p) - min(p) + {SUBSTR_W} AS span_len
  FROM isl GROUP BY doc_id, span_id
)
SELECT doc_id,
       count(*)::BIGINT AS n_dup_spans,
       sum(span_len)::BIGINT AS dup_chars,
       max(span_len)::BIGINT AS longest_span,
       {X.r6_sql('sum(span_len)::DOUBLE / max(n)')} AS dup_char_frac,
       max(span_len) >= {SUBSTR_MIN_SPAN} AS substr_flagged
FROM spans GROUP BY doc_id ORDER BY doc_id
"""


@query(
    "dedup_exact_substrings",
    _SUBSTR_ORACLE,
    doc="exact-substring dedup (Lee et al. 2022 suffix-array dedup, "
        "restated Spark-shaped with content-defined windows): a position "
        f"is an anchor iff h32 of its {SUBSTR_ANCHOR}-char gram is 0 mod "
        f"{SUBSTR_STRIDE} (winnowing/CDC-style selection — depends only on "
        "the text, so a verbatim run shared at arbitrary, differently-"
        "aligned offsets anchors the SAME run-relative positions in every "
        f"doc); each anchor's {SUBSTR_W}-char window is md5-keyed, window "
        "contents occurring >=2 times corpus-wide are duplicated, and per "
        "doc the duplicated windows merge into maximal spans (gaps-and-"
        "islands over positions), yielding span count / duplicated chars / "
        f"longest span / flagged at {SUBSTR_MIN_SPAN}+ chars. Doc-anchored "
        "striding would miss every cross-doc repeat whose offsets disagree "
        "mod stride — the failure tests/test_corpus_ops.py pins. Recall is "
        "probabilistic like MinHash: a run of R chars misses only if its "
        "R-W interior positions all miss the 1/S anchor draw "
        "(~e^-(R-W)/S: 13% at R=60, ~0 at R=200). The dedup key is the "
        "full 128-bit md5 (h32 would brand distinct windows duplicated at "
        "10^12-doc scale). Plan: one scan -> explode all positions (map-"
        "side only; the anchor filter runs IN the same projection, so the "
        "shuffle carries ~n/S rows) -> window-hash count (partial agg, one "
        "shuffle on h) -> equi-join back -> per-doc islands window (one "
        "shuffle on doc_id). Boilerplate windows are the hot keys; AQE "
        "skew-join splits them. A full suffix array (the paper's single-"
        "node structure) does not shard; the W/S dial trades shuffle "
        "volume for minimum catchable repeat length",
)
def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _spread(load(spark, sf_dir, "documents"))
    t = d.where(F.length("text") >= SUBSTR_W).select(
        "doc_id", F.lower(F.col("text")).alias("s"), F.length("text").alias("n")
    )
    ex = t.select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.col("n") - F.lit(SUBSTR_W - 1), F.lit(1))
        ).alias("p"),
        "s",
    )
    anchor = X.h32(F.col("s").substr(F.col("p"), F.lit(SUBSTR_ANCHOR)))
    # (doc_id, n, p, h) materialized ONCE: the freq branch and the
    # join-back branch would otherwise each rescan + re-hash the text
    win = (
        ex.where(F.pmod(anchor, F.lit(SUBSTR_STRIDE)) == 0)
        .select(
            "doc_id", "n", "p",
            F.md5(F.col("s").substr(F.col("p"), F.lit(SUBSTR_W))).alias("h"),
        )
        .localCheckpoint()
    )
    freq = win.groupBy("h").agg(F.count("*").alias("c")).where(F.col("c") >= 2)
    dup = win.join(freq.select("h"), "h").select("doc_id", "n", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    brk = dup.withColumn(
        "new_span",
        F.when(
            F.lag("p").over(w).isNull()
            | ((F.col("p") - F.lag("p").over(w)) > SUBSTR_W),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    isl = brk.withColumn(
        "span_id",
        F.sum("new_span").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = isl.groupBy("doc_id", "span_id").agg(
        F.max("n").alias("n"),
        (F.max("p") - F.min("p") + SUBSTR_W).alias("span_len"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_dup_spans"),
            F.sum("span_len").cast("long").alias("dup_chars"),
            F.max("span_len").cast("long").alias("longest_span"),
            X.r6(
                F.sum("span_len").cast("double") / F.max("n")
            ).alias("dup_char_frac"),
            (F.max("span_len") >= SUBSTR_MIN_SPAN).alias("substr_flagged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# URL canonicalization + canonical dedup (Common-Crawl url hygiene)
# ---------------------------------------------------------------------------

#: tracking query params stripped by canonicalization (plus any utm_* name)
URL_TRACKING_PARAMS = ("gclid", "fbclid")

# Deterministic messy-URL fixture derived from events: five raw variants of
# the same logical resource (host = user_id mod 10, path = event_id mod 200)
# differing in scheme/host case, explicit default port, tracking params and
# fragment. Both engines synthesize identical strings, so the oracle is
# exact. variant -> canonical classes: m0/m1 -> https+?id=1, m2/m3 -> http,
# m4 -> https bare.
_URL_RAW_SQL = """
  CASE event_id % 5
    WHEN 0 THEN 'https://H' || (user_id % 10)::VARCHAR || '.EXAMPLE.org:443/p/'
                || (event_id % 200)::VARCHAR || '?utm_source=feed&id=1#top'
    WHEN 1 THEN 'https://h' || (user_id % 10)::VARCHAR || '.example.org/p/'
                || (event_id % 200)::VARCHAR || '?id=1'
    WHEN 2 THEN 'http://h' || (user_id % 10)::VARCHAR || '.example.org:80/p/'
                || (event_id % 200)::VARCHAR
    WHEN 3 THEN 'http://h' || (user_id % 10)::VARCHAR || '.example.org/p/'
                || (event_id % 200)::VARCHAR || '#frag'
    ELSE 'https://h' || (user_id % 10)::VARCHAR || '.example.org/p/'
                || (event_id % 200)::VARCHAR || '?utm_campaign=x&gclid=abc'
  END
"""

_URL_ORACLE = f"""
WITH raw AS (
  SELECT {_URL_RAW_SQL} AS u FROM events
), defrag AS (
  SELECT u, regexp_replace(u, '#.*$', '') AS d FROM raw
), parts AS (
  SELECT u,
         lower(regexp_extract(d, '^[a-zA-Z]+://[^/?#]*', 0)) AS sa,
         substr(d, length(regexp_extract(d, '^[a-zA-Z]+://[^/?#]*', 0)) + 1)
           AS rest
  FROM defrag
), ports AS (
  SELECT u,
         CASE WHEN starts_with(sa, 'https://') THEN replace(sa, ':443', '')
              WHEN starts_with(sa, 'http://') THEN replace(sa, ':80', '')
              ELSE sa END AS sa,
         split_part(rest, '?', 1) AS path,
         split_part(rest, '?', 2) AS q
  FROM parts
), canon AS (
  SELECT u,
         sa || path ||
         CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS c
  FROM (
    SELECT u, sa, path,
           -- duckdb array_to_string([]) is NULL, Spark concat_ws is ''
           coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
             x -> NOT (starts_with(split_part(x, '=', 1), 'utm_')
                       OR split_part(x, '=', 1) IN {URL_TRACKING_PARAMS})
           )), '&'), '') AS q2
    FROM ports)
)
SELECT c AS canonical_url,
       count(*)::BIGINT AS n_raw,
       count(DISTINCT u)::BIGINT AS n_raw_distinct,
       min(u) AS keeper_raw
FROM canon GROUP BY c HAVING count(*) >= 2 ORDER BY canonical_url
"""


def _url_raw_expr() -> F.Column:
    host = F.pmod("user_id", F.lit(10)).cast("string")
    path = F.pmod("event_id", F.lit(200)).cast("string")
    m = F.pmod("event_id", F.lit(5))
    return (
        F.when(m == 0, F.concat(
            F.lit("https://H"), host, F.lit(".EXAMPLE.org:443/p/"), path,
            F.lit("?utm_source=feed&id=1#top")))
        .when(m == 1, F.concat(
            F.lit("https://h"), host, F.lit(".example.org/p/"), path,
            F.lit("?id=1")))
        .when(m == 2, F.concat(
            F.lit("http://h"), host, F.lit(".example.org:80/p/"), path))
        .when(m == 3, F.concat(
            F.lit("http://h"), host, F.lit(".example.org/p/"), path,
            F.lit("#frag")))
        .otherwise(F.concat(
            F.lit("https://h"), host, F.lit(".example.org/p/"), path,
            F.lit("?utm_campaign=x&gclid=abc")))
    )


def url_canonical_expr(u: F.Column) -> F.Column:
    """Canonical form of a URL, entirely in Catalyst expressions (one map
    stage, whole-stage codegen): strip the fragment, lowercase
    scheme+authority, drop explicit default ports, drop utm_*/gclid/fbclid
    tracking params, sort the surviving query params. The same five steps in
    the same order as the oracle SQL. replace(':443'/':80') is safe because
    the authority grammar allows ':' only before the port."""
    d = F.regexp_replace(u, "#.*$", "")
    sa_raw = F.regexp_extract(d, "^[a-zA-Z]+://[^/?#]*", 0)
    sa = F.lower(sa_raw)
    rest = d.substr(F.length(sa_raw) + 1, F.length(d))
    sa = (
        F.when(sa.startswith("https://"), F.replace(sa, F.lit(":443"), F.lit("")))
        .when(sa.startswith("http://"), F.replace(sa, F.lit(":80"), F.lit("")))
        .otherwise(sa)
    )
    path = F.split_part(rest, F.lit("?"), F.lit(1))
    q = F.split_part(rest, F.lit("?"), F.lit(2))
    keep = lambda p: ~(
        F.split_part(p, F.lit("="), F.lit(1)).startswith("utm_")
        | F.split_part(p, F.lit("="), F.lit(1)).isin(*URL_TRACKING_PARAMS)
    )
    q2 = F.concat_ws("&", F.array_sort(F.filter(F.split(q, "&"), keep)))
    return F.concat(
        sa, path, F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2))
    )


@query(
    "url_canonical_dedup",
    _URL_ORACLE,
    doc="URL canonicalization + canonical-key dedup (the Common-Crawl "
        "hygiene pass behind the north-star url-uniqueness rule — "
        "uniqueness_violations in plans/constraints.py checks RAW url "
        "uniqueness per partition; this collapses cosmetic variants "
        "first): strip fragment, lowercase scheme+host, drop explicit "
        "default ports, drop utm_*/gclid/fbclid tracking params, sort "
        "surviving query params — all Catalyst string/array expressions, "
        "ZERO UDFs, JVM-side throughout (the param-filter lambda is a "
        "CodegenFallback higher-order function, still JVM, never Python); "
        "canonicalization is a pure map stage and the "
        "only shuffle is the final hash agg on the canonical key (hot "
        "boilerplate URLs split under AQE). Input is a deterministic "
        "5-variant messy-URL fixture derived from events, identical in "
        "both engines, so the oracle is exact",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    raw = ev.select(_url_raw_expr().alias("u"))
    c = raw.select("u", url_canonical_expr(F.col("u")).alias("c"))
    # two-level hash agg instead of count(DISTINCT u): a distinct aggregate
    # plans sort-based (3 Sorts, no codegen); grouping by (c, u) first keeps
    # every stage a codegen'd HashAggregate with map-side partials
    per_raw = c.groupBy("c", "u").agg(F.count("*").alias("cnt"))
    return (
        per_raw.groupBy("c")
        .agg(
            F.sum("cnt").cast("long").alias("n_raw"),
            F.count("*").cast("long").alias("n_raw_distinct"),
            F.min("u").alias("keeper_raw"),
        )
        .where(F.col("n_raw") >= 2)
        .select(
            F.col("c").alias("canonical_url"),
            "n_raw", "n_raw_distinct", "keeper_raw",
        )
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003)
# ---------------------------------------------------------------------------
#
# The published fingerprint-selection standard behind MOSS: hash every
# positional k-token gram, slide a window of W consecutive gram hashes, and
# keep each window's MINIMUM hash — ties to the RIGHTMOST occurrence — then
# dedup picks shared by overlapping windows. Guarantees any match of
# length >= W+k-1 tokens shares at least one fingerprint, with density
# ~2/(W+1) of the gram count.
#
# The whole selection is ONE window pass, no self-join: rightmost-min is an
# integer packing trick — min over the frame of ``h·2^20 + (2^20−1−i)``
# picks the smallest hash and, on ties, the LARGEST position (its packed
# tail is smallest); h < 2^32 keeps the packed value < 2^52 (exact in both
# engines' int64 and in float64), and gram positions are ENFORCED < 2^20
# per document by the gram generator in both engines (a doc longer than
# ~1M grams fingerprints its first 2^20 grams — an explicit, identical
# truncation, never a silent pack underflow). Fingerprint sharing is
# then a hash equi-join over per-(doc, fp) distinct rows with a
# frequency cap (fps in > WINNOW_FREQ_CAP docs are boilerplate, excluded —
# the standard MOSS treatment), so the pair stage never explodes on a hot
# phrase. All arithmetic is exact int64 on the portable h32.

WINNOW_K = 3        # tokens per gram (matches the shingle family)
WINNOW_W = 4        # grams per winnowing window
WINNOW_FREQ_CAP = 16
WINNOW_MIN_SHARED = 1
_PACK = 1 << 20


def _winnow_gram_sql() -> str:
    gram = " || ' ' || ".join(f"q.t[r.i + {j}]" for j in range(WINNOW_K))
    return X.h32_sql(gram)


_WINNOW_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {X.tokens_sql("text")} AS t FROM documents
),
g AS (
  -- position cap i < 2^20: grams beyond ~1M per doc are EXCLUDED in both
  -- engines identically (a doc that long fingerprints its first 2^20
  -- grams) — without the cap the packed tail underflows into hash h-1's
  -- range and the window min silently selects a wrong fingerprint
  SELECT q.doc_id, r.i AS i, {_winnow_gram_sql()} AS h
  FROM (SELECT doc_id, t FROM tk WHERE len(t) >= {WINNOW_K}) q,
       unnest(range(1, least(len(q.t) - {WINNOW_K - 2}, {_PACK}))) AS r(i)
),
w AS (
  SELECT doc_id,
         min(h * {_PACK} + ({_PACK - 1} - i)) OVER
           (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS cmb,
         count(*) OVER
           (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wn
  FROM g
),
dfp AS (
  SELECT DISTINCT doc_id, cmb // {_PACK} AS fp
  FROM w WHERE wn = {WINNOW_W}
),
freq AS (SELECT fp, count(*)::BIGINT AS nd FROM dfp GROUP BY fp),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared_fps
  FROM dfp a
  JOIN dfp b ON b.fp = a.fp AND b.doc_id > a.doc_id
  JOIN freq f ON f.fp = a.fp AND f.nd <= {WINNOW_FREQ_CAP}
  GROUP BY 1, 2
  HAVING count(*) >= {WINNOW_MIN_SHARED}
)
SELECT doc_a, doc_b, shared_fps
FROM pairs ORDER BY shared_fps DESC, doc_a, doc_b
"""


@query(
    "dedup_winnowing",
    _WINNOW_ORACLE,
    doc="winnowing fingerprint overlap (Schleimer et al. 2003, the MOSS "
        f"standard): positional {WINNOW_K}-token gram hashes, window of "
        f"{WINNOW_W} with rightmost-min selection done as ONE integer-"
        "packed window pass (min of h·2^20+(2^20−1−i) — no self-join), "
        "per-(doc, fp) dedup, then frequency-capped "
        f"(≤{WINNOW_FREQ_CAP} docs) fingerprint equi-join for pair "
        f"overlap ≥ {WINNOW_MIN_SHARED}; guarantees any shared run of "
        f"≥ {WINNOW_W + WINNOW_K - 1} tokens is caught; exact int64 "
        "arithmetic throughout",
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    tk = d.select("doc_id", X.tokens_expr(F.col("text")).alias("t")).where(
        F.size("t") >= WINNOW_K
    )
    grams = tk.select(
        "doc_id", "t",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.size("t") - (WINNOW_K - 1), F.lit(_PACK - 1)),
            )
        ).alias("i"),
    ).select(
        "doc_id", "i",
        X.h32(
            F.concat_ws(
                " ",
                *[
                    F.element_at(F.col("t"), F.col("i") + F.lit(j))
                    for j in range(WINNOW_K)
                ],
            )
        ).alias("h"),
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, WINNOW_W - 1)
    )
    packed = (
        F.col("h") * F.lit(_PACK) + (F.lit(_PACK - 1) - F.col("i"))
    ).alias("p")
    w = grams.select(
        "doc_id",
        F.min(packed).over(frame).alias("cmb"),
        F.count(F.lit(1)).over(frame).alias("wn"),
    ).where(F.col("wn") == WINNOW_W)
    # one distinct over (doc_id, fp); cut once — dfp feeds freq AND both
    # sides of the pair self-join (the sibling dedup queries' house
    # pattern), so without the checkpoint the tokenize→gram→window
    # pipeline would run three times
    dfp = (
        w.select("doc_id", F.expr(f"cmb div {_PACK}").alias("fp"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    freq = dfp.groupBy("fp").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    a = dfp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = dfp.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_b") > F.col("doc_a"))
        .join(freq.where(F.col("nd") <= WINNOW_FREQ_CAP), "fp")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= WINNOW_MIN_SHARED)
        .orderBy(F.col("shared_fps").desc(), "doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# incremental near-dup: new crawl batch vs the persisted signature index
# ---------------------------------------------------------------------------
#
# Production dedup is INCREMENTAL: yesterday's corpus already has a
# materialized MinHash signature table; today's batch is checked AGAINST it
# (and its signatures appended afterward) — the near-dup twin of
# bloom_novelty's exact-hash gate, and the cross-corpus form of
# dedup_minhash_lsh's self-join. Index = even doc_id (the deterministic
# stand-in for yesterday's corpus, the bloom_novelty split), incoming = odd.
#
# Same scale shape as the self-join: the band equi-join shuffles only
# (doc_id, band_id, band_key), candidate volume is per-bucket, shingle sets
# fetched back by id for exact-Jaccard verification — but the index side
# never recomputes signatures at scale (it IS the persisted table), and the
# incoming side's signatures are exactly what gets appended for tomorrow.
# Per incoming doc: is_dup, the best index match (max jaccard, tie -> min
# index id), and its jaccard — 0/-1 for clean docs, so the driver-facing
# frame is NULL-free.

_INCR_ORACLE = (
    _DOC_CTE
    + f""", sig AS (
  SELECT doc_id, sh, {X.minhash_sig_sql('shh')} AS sig,
         doc_id % 2 = 0 AS in_index
  FROM shh WHERE len(sh) > 0
), bands AS (
  SELECT doc_id, sh, in_index, b.b AS band_id,
         CASE b.b {' '.join(f"WHEN {b} THEN {_band_key_sql('sig', b, _MINHASH_ROWS)}" for b in range(MINHASH_BANDS))} END AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS b) b
), bfreq AS (
  SELECT band_id, band_key, count(*) AS nb FROM bands GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT i.doc_id AS idx_id, q.doc_id AS new_id,
         i.sh AS sh_i, q.sh AS sh_q
  FROM bands i
  JOIN bfreq f ON f.band_id = i.band_id AND f.band_key = i.band_key
              AND f.nb <= {MINHASH_BAND_CAP}
  JOIN bands q
    ON i.band_id = q.band_id AND i.band_key = q.band_key
   AND i.in_index AND NOT q.in_index
), verified AS (
  SELECT new_id, idx_id,
         len(list_intersect(sh_i, sh_q))::DOUBLE
           / len(list_distinct(list_concat(sh_i, sh_q))) AS jac
  FROM cand
  WHERE len(list_intersect(sh_i, sh_q))::DOUBLE
        / len(list_distinct(list_concat(sh_i, sh_q))) >= {MINHASH_JACCARD_T}
), best AS (
  SELECT new_id, idx_id, jac,
         row_number() OVER (PARTITION BY new_id ORDER BY jac DESC, idx_id) AS rk
  FROM verified
)
SELECT d.doc_id,
       (b.idx_id IS NOT NULL) AS is_dup,
       coalesce(b.idx_id, -1) AS match_id,
       coalesce(floor(b.jac * 1000000 + 0.5) / 1000000, 0.0) AS jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN best b ON b.new_id = d.doc_id AND b.rk = 1
ORDER BY d.doc_id
"""
)


@query(
    "dedup_incremental_minhash",
    _INCR_ORACLE,
    doc="incremental near-dup: today's batch (odd doc_id) checked against "
        "the persisted MinHash signature index (even doc_id — the "
        "bloom_novelty split), the cross-corpus form of dedup_minhash_lsh "
        "and the near-dup twin of the exact Bloom gate; band equi-join "
        "shuffles only (doc_id, band_id, band_key), exact-Jaccard "
        "verification by id fetch, per incoming doc the best index match "
        "(max jaccard, tie -> min index id); at scale the index side IS "
        "the materialized signature table and the incoming side's "
        "signatures are what gets appended for tomorrow. Band buckets "
        f"larger than {MINHASH_BAND_CAP} rows (both sides counted) are "
        "dropped — the flood guard, sans exact pre-collapse: a batch doc "
        "byte-identical to an index doc must still surface as its dup",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _spread(load(spark, sf_dir, "documents"))
    sh = (
        d.select("doc_id", X.shingles_udf()(F.col("text")).alias("sh"))
        .where(F.size("sh") > 0)
        .localCheckpoint(eager=False)
    )
    sig = sh.select(
        "doc_id",
        _minhash_from_shingles(F.col("sh")).alias("sig"),
        (F.col("doc_id") % 2 == 0).alias("in_index"),
    )
    rows = _MINHASH_ROWS
    bands = (
        sig.select(
            "doc_id",
            "in_index",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.concat_ws(
                                "-",
                                *[
                                    F.element_at(F.col("sig"), b * rows + r + 1).cast(
                                        "string"
                                    )
                                    for r in range(rows)
                                ],
                            ).alias("band_key"),
                        )
                        for b in range(MINHASH_BANDS)
                    ]
                )
            ).alias("band"),
        )
        .select("doc_id", "in_index", "band.band_id", "band.band_key")
    )
    # flood guard: cap counts BOTH sides of a bucket — a boilerplate flood
    # split across index and batch still floods the same band keys (exact
    # pre-collapse is NOT applied here: a batch doc byte-identical to an
    # index doc must still surface as its dup, and cross-side collapse
    # would hide exactly that pair). Barrier AFTER the cap, like the other
    # banded paths: the capped frame feeds both join sides, and a pre-cap
    # barrier would recompute the freq-agg + anti-join per side (measured
    # 3x on dedup_minhash_lsh)
    bands = _cap_band_buckets(
        bands, ["band_id", "band_key"], MINHASH_BAND_CAP
    ).localCheckpoint(eager=False)
    i = bands.where(F.col("in_index")).alias("i")
    q = bands.where(~F.col("in_index")).alias("q")
    cand = (
        i.join(
            q,
            (F.col("i.band_id") == F.col("q.band_id"))
            & (F.col("i.band_key") == F.col("q.band_key")),
        )
        .select(F.col("i.doc_id").alias("idx_id"), F.col("q.doc_id").alias("new_id"))
        .dropDuplicates(["idx_id", "new_id"])
    )
    sh_i = sh.select(F.col("doc_id").alias("idx_id"), F.col("sh").alias("sh_i"))
    sh_q = sh.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sh_q"))
    jac = F.size(F.array_intersect("sh_i", "sh_q")).cast("double") / F.size(
        F.array_union("sh_i", "sh_q")
    )
    verified = (
        cand.join(sh_i, "idx_id")
        .join(sh_q, "new_id")
        .select("new_id", "idx_id", jac.alias("jac"))
        .where(F.col("jac") >= MINHASH_JACCARD_T)
    )
    w = Window.partitionBy("new_id").orderBy(F.desc("jac"), F.asc("idx_id"))
    best = verified.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    incoming = d.select("doc_id").where(F.col("doc_id") % 2 == 1)
    return (
        incoming.join(best, incoming["doc_id"] == best["new_id"], "left")
        .select(
            incoming["doc_id"],
            F.col("idx_id").isNotNull().alias("is_dup"),
            F.coalesce("idx_id", F.lit(-1)).cast("long").alias("match_id"),
            F.coalesce(X.r6(F.col("jac")), F.lit(0.0)).alias("jaccard"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# IVF recall gauge vs exact top-k
# ---------------------------------------------------------------------------
#
# The quality dial every IVF deployment tunes: what fraction of the TRUE
# top-k does searching only nprobe cells return? The LSH path already has
# its gauge (dedup_lsh_recall); this is the inverted-file twin, composed
# from the two existing paths — exact brute-force (ann_cosine_topk) as
# ground truth, ann_ivf_topk as the candidate — so a change to either
# automatically re-scores the gauge. Per query: hits, k, recall; the -1 row
# is the mean over queries (the number a tuning sweep plots against
# nprobe). Explicitly a sampled-scale gauge, like dedup_lsh_recall: at
# 10^12 vectors you run it on a query sample, never the corpus.

_IVF_RECALL_ORACLE = f"""
WITH exact AS ({_ANN_ORACLE}),
ivf AS ({_IVF_ORACLE}),
per_q AS (
  SELECT e.query_id,
         count(i.neighbor_id)::BIGINT AS hits,
         count(*)::BIGINT AS k
  FROM exact e LEFT JOIN ivf i
    ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
)
SELECT query_id, hits, k,
       {X.r6_sql("hits::DOUBLE / k::DOUBLE")} AS recall
FROM per_q
UNION ALL
SELECT -1, sum(hits)::BIGINT, sum(k)::BIGINT,
       {X.r6_sql("sum(hits)::DOUBLE / sum(k)::DOUBLE")}
FROM per_q
ORDER BY query_id
"""


@query(
    "ann_ivf_recall",
    _IVF_RECALL_ORACLE,
    doc="IVF recall gauge vs exact top-k (the inverted-file twin of "
        "dedup_lsh_recall): per query, the fraction of the TRUE "
        f"top-{ANN_TOPK} that probing {IVF_NPROBE} of {IVF_K} cells "
        "returns, plus the micro-averaged mean row (query_id -1) a tuning "
        "sweep plots against nprobe; composed from ann_cosine_topk "
        "(ground truth) and ann_ivf_topk (candidate) so a change to "
        "either re-scores the gauge — explicitly a sampled-scale quality "
        "gauge, run on a query sample at 10^12 vectors",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = (
        ann_ivf_topk(spark, sf_dir)
        .select(
            F.col("query_id").alias("i_query_id"),
            F.col("neighbor_id").alias("i_neighbor_id"),
        )
    )
    per_q = (
        exact.join(
            ivf,
            (F.col("query_id") == F.col("i_query_id"))
            & (F.col("neighbor_id") == F.col("i_neighbor_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("i_neighbor_id").cast("long").alias("hits"),
            F.count("*").cast("long").alias("k"),
        )
        .localCheckpoint(eager=False)  # reused by the mean row
    )
    mean = per_q.agg(
        F.lit(-1).cast("long").alias("query_id"),
        F.sum("hits").cast("long").alias("hits"),
        F.sum("k").cast("long").alias("k"),
    )
    rec = X.r6(F.col("hits").cast("double") / F.col("k").cast("double"))
    return (
        per_q.unionAll(mean)
        .select("query_id", "hits", "k", rec.alias("recall"))
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Unicode NFC normalization — the canonicalization pass every multilingual
# corpus needs before dedup/hashing (decomposed "e"+U+0301 and composed "é"
# must hash identically)
# ---------------------------------------------------------------------------
#
# Spark has no NFC builtin, so the normalization runs in an Arrow-batched
# pandas UDF (stdlib unicodedata — the same tables ICU ships); DuckDB HAS
# nfc_normalize, so the oracle is a genuinely independent second
# implementation of the Unicode composition tables. The cleaning contract
# is pinned identically on both sides: strip C0 controls (except \t\n\r),
# collapse [ \t\n\r]+ runs to one space (an EXPLICIT class — python re's
# \s and RE2's \s disagree on unicode spaces), trim spaces, then NFC.
# Planted content: combining acute/diaeresis sequences, doubled whitespace,
# a BEL control — all built from chr() so both engines derive byte-equal
# raw strings.

_NORM_RAW_SQL = (
    "'cafe' || chr(769) || '  resume' || chr(769) || chr(9) || "
    "(CASE WHEN user_id % 3 = 0 THEN 'nai' || chr(776) || 've' ELSE 'plain' END) "
    "|| chr(7) || ' id ' || event_id"
)

_NORM_SQL = f"""
WITH raw AS (
  SELECT event_type, {_NORM_RAW_SQL} AS s FROM events
), cleaned AS (
  SELECT event_type, s,
         nfc_normalize(trim(regexp_replace(regexp_replace(
           s, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g'),
           '[ \\t\\n\\r]+', ' ', 'g'), ' ')) AS c
  FROM raw
)
SELECT event_type,
       count(*)::BIGINT AS n_rows,
       count(*) FILTER (WHERE c <> s)::BIGINT AS n_changed,
       sum(length(s))::BIGINT AS chars_before,
       sum(length(c))::BIGINT AS chars_after,
       sum({X.h32_sql('c')})::BIGINT AS h32_sum
FROM cleaned GROUP BY event_type ORDER BY event_type
"""


@query(
    "text_normalize_nfc",
    _NORM_SQL,
    doc="Unicode NFC canonicalization + control-strip + whitespace-collapse "
        "— the pass that makes decomposed e+U+0301 and composed é hash "
        "identically before dedup. Spark side: Arrow-batched stdlib "
        "unicodedata (no NFC builtin exists); oracle: DuckDB's independent "
        "nfc_normalize — two implementations of the Unicode composition "
        "tables cross-checked via code-point counts and h32 sums. "
        "Whitespace class is explicit [ \\\\t\\\\n\\\\r] (python re and RE2 "
        "disagree on unicode \\\\s). Pure map at any scale — no shuffle "
        "before the rollup",
)
def text_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc_clean(s: pd.Series) -> pd.Series:
        import re
        import unicodedata

        ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
        ws = re.compile(r"[ \t\n\r]+")

        def one(t):
            if t is None:
                return None
            return unicodedata.normalize(
                "NFC", ws.sub(" ", ctrl.sub("", t)).strip(" ")
            )

        return s.map(one)

    ev = load(spark, sf_dir, "events")
    raw = F.concat(
        # EXPLICIT decomposed escapes (e + U+0301), matching the oracle's
        # chr(769) construction byte-for-byte: a literal typed as composed
        # (or a file normalized to NFC by an editor) would silently change
        # the raw strings this query measures
        F.lit("cafe\u0301  resume\u0301\t"),
        F.when(
            F.pmod("user_id", F.lit(3)) == 0, F.lit("nai\u0308ve")
        ).otherwise(F.lit("plain")),
        F.lit("\x07 id "),
        F.col("event_id").cast("string"),
    )
    cleaned = ev.select(
        "event_type", raw.alias("s")
    ).withColumn("c", _nfc_clean(F.col("s")))
    return (
        cleaned.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count(F.when(F.col("c") != F.col("s"), 1)).cast("long").alias(
                "n_changed"
            ),
            F.sum(F.length("s")).cast("long").alias("chars_before"),
            F.sum(F.length("c")).cast("long").alias("chars_after"),
            F.sum(X.h32(F.col("c"))).cast("long").alias("h32_sum"),
        )
        .orderBy("event_type")
    )

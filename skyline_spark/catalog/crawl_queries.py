"""Crawl-management operators: tokenizer-training pair counts, incremental
snapshot deltas, and denylist curation.

Three stages every large-scale web-corpus pipeline runs that the catalog
didn't yet cover:

``bpe_merge_candidates`` — one round of byte-pair-encoding merge selection
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") as a distributed job. The scalability trick is the one real
BPE trainers use: collapse the corpus to its *distinct-word frequency table*
first (Heaps' law makes the vocabulary sublinear in corpus size), then
count adjacent symbol pairs over distinct words weighted by word frequency.
At 10^12 documents the corpus→vocab agg is the only corpus-sized shuffle;
the pair-explode stage runs over the (tiny) vocabulary.

``crawl_snapshot_delta`` — CDX-style incremental-crawl classification: for
each canonical URL, compare the latest content fingerprint in two
consecutive snapshots and label it added / removed / changed / unchanged.
This is the stage that lets a 100-TB pipeline re-process only changed pages
each crawl. Single hash-shuffle design: one ``groupBy(url)`` with
conditional per-snapshot latest-capture aggregates — no self-join, no
second shuffle, map-side partials throughout.

``url_host_blocklist`` — UT1-/RefinedWeb-style denylist curation: aggregate
per-host URL/event counts, then verdict each host against a blocklist via a
broadcast join. At production scale the denylist is a small curated table
(UT1 is ~4M hosts ≈ tens of MB) — exactly the broadcast-join shape built
here; the synthetic denylist is hash-derived so both engines construct the
identical list with no external data.

Reference analog: none — Skyline manages metrics, not crawls; these belong
to the LLM-data-pipeline surface layered on top of the reference's scope,
alongside dedup (text_queries), mixing (mixing_queries), curation
(curation_queries), selection (selection_queries) and ranking
(graph_queries).

House parity rules: the portable hash is ``functions/text.h32``; counts are
exact int64; the only ordering ties are broken by a unique column in both
engines; every expression is Catalyst-side (zero Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as X
from .registry import load, query
from .text_queries import _spread, _url_raw_expr, url_canonical_expr

#: merge candidates reported per BPE round (freq desc, pair asc — total
#: order, so the LIMIT is deterministic in both engines)
BPE_TOP_PAIRS = 32

#: end-of-word marker appended before pair counting — single char so every
#: adjacent pair is a 2-char substring. U+2581 LOWER ONE EIGHTH BLOCK (the
#: sentencepiece marker) sits outside any realistic token alphabet; an
#: ASCII '_' would collide with underscores inside whitespace tokens
#: (snake_case, URLs) and let impossible pairs win the top-K. Both engines'
#: length/substr are codepoint-based, so the 2-char pair math is identical.
BPE_EOW = "▁"

#: a host is denylisted when h32(host ‖ DENY_SALT) % DENY_MOD == 0 —
#: deterministic stand-in for the curated UT1-style blocklist table
DENY_MOD = 3
DENY_SALT = ":denylist"


# ---------------------------------------------------------------------------
# BPE merge-candidate counting (tokenizer training round 0)
# ---------------------------------------------------------------------------

_BPE_ORACLE = f"""
WITH vocab AS (
  SELECT t || '{BPE_EOW}' AS w, count(*)::BIGINT AS wf
  FROM documents, unnest({X.tokens_sql("text")}) AS u(t)
  GROUP BY w
),
pairs AS (
  SELECT substr(w, i::INTEGER, 2) AS pair, sum(wf)::BIGINT AS freq
  FROM vocab, unnest(range(1, length(w))) AS r(i)
  GROUP BY pair
)
SELECT pair, freq FROM pairs
ORDER BY freq DESC, pair
LIMIT {BPE_TOP_PAIRS}
"""


@query(
    "bpe_merge_candidates",
    _BPE_ORACLE,
    doc="one distributed BPE merge-selection round (Sennrich et al. 2016): "
        "corpus → distinct-word frequency table (the ONLY corpus-sized "
        "shuffle; Heaps' law keeps the vocab sublinear), then adjacent "
        "char-pair counts over distinct words weighted by word frequency, "
        "end-of-word marker included, top-K by (freq desc, pair) — a total "
        "order, so the limit is deterministic; TakeOrderedAndProject on the "
        "Spark side, all stages codegen'd HashAggregates, zero UDFs",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load(spark, sf_dir, "documents")).select("text")
    words = docs.select(
        F.explode(X.tokens_expr(F.col("text"))).alias("t")
    ).select(F.concat(F.col("t"), F.lit(BPE_EOW)).alias("w"))
    vocab = words.groupBy("w").agg(F.count("*").cast("long").alias("wf"))
    pairs = vocab.select(
        "w", "wf",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    ).select(F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"), "wf")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(BPE_TOP_PAIRS)
    )


# ---------------------------------------------------------------------------
# Incremental-crawl snapshot delta
# ---------------------------------------------------------------------------

def _canon_url_sql() -> str:
    """The canonical URL of the deterministic messy-URL fixture, as DuckDB
    SQL. The canonicalizer lowercases but never rewrites the scheme, so the
    fixture's variants 2/3 (raw ``http://``) stay ``http://`` and variants
    0/1/4 stay ``https://``; only 0/1 keep a ``?id=1`` query after tracking-
    param stripping. Rendering that closed form directly keeps the oracle
    readable; ``url_canonical_dedup``'s full 5-step canonicalizer is parity-
    pinned against the same fixture separately."""
    return (
        "(CASE WHEN event_id % 5 IN (2, 3) THEN 'http://h' "
        " ELSE 'https://h' END) || "
        "(user_id % 10)::VARCHAR || '.example.org/p/' || "
        "(event_id % 200)::VARCHAR || "
        "(CASE WHEN event_id % 5 IN (0, 1) THEN '?id=1' ELSE '' END)"
    )


_DELTA_ORACLE = f"""
WITH caps AS (
  SELECT {_canon_url_sql()} AS url,
         -- snapshot = crawl-wave parity (event_id // 200). The obvious axes
         -- are both degenerate against the fixture: the path is
         -- event_id % 200 (2 | 200 pins every URL's captures to one
         -- event_id parity) and the host is user_id % 10 (2 | 10 pins
         -- user_id parity per host). The wave number is independent of both.
         CASE WHEN (event_id // 200) % 2 = 0 THEN 'A' ELSE 'B' END AS snap,
         event_id,
         {X.h32_sql("coalesce(event_type, '') || ':' || coalesce(props, '')")} AS h
  FROM events
),
latest AS (
  SELECT url,
         arg_max(h, event_id) FILTER (WHERE snap = 'A') AS sig_a,
         arg_max(h, event_id) FILTER (WHERE snap = 'B') AS sig_b
  FROM caps GROUP BY url
)
SELECT url,
       CASE WHEN sig_a IS NULL THEN 'added'
            WHEN sig_b IS NULL THEN 'removed'
            WHEN sig_a = sig_b THEN 'unchanged'
            ELSE 'changed' END AS status,
       -- h32 >= 0, so -1 is an unambiguous "absent in this snapshot"
       -- (keeps the driver-facing output NULL-free)
       coalesce(sig_a, -1) AS sig_a,
       coalesce(sig_b, -1) AS sig_b
FROM latest ORDER BY url
"""


@query(
    "crawl_snapshot_delta",
    _DELTA_ORACLE,
    doc="CDX-style incremental-crawl delta: per canonical URL, compare the "
        "latest content fingerprint (h32 of the payload, latest = max "
        "capture id — unique, so argmax is deterministic) across two "
        "snapshots and label added/removed/changed/unchanged — the stage "
        "that lets a 100-TB pipeline touch only changed pages per crawl. "
        "ONE hash shuffle: groupBy(url) with conditional per-snapshot "
        "max_by aggregates (NULL ordering on other-snapshot rows is "
        "ignored; max_by hash-aggregates where max(struct) would fall back "
        "to SortAggregate); no self-join, map-side partials, whole-stage "
        "codegen",
)
def crawl_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    caps = ev.select(
        url_canonical_expr(_url_raw_expr()).alias("url"),
        F.when(F.pmod(F.floor(F.col("event_id") / 200), F.lit(2)) == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("snap"),
        F.col("event_id"),
        X.h32(
            F.concat(
                F.coalesce("event_type", F.lit("")),
                F.lit(":"),
                F.coalesce("props", F.lit("")),
            )
        ).alias("h"),
    )

    def _latest(snap: str) -> F.Column:
        # max_by with a NULL ordering on other-snapshot rows (ignored, NULL
        # when a snapshot never saw the url) — unlike max(struct(e, h)),
        # max_by keeps the aggregate on codegen'd HashAggregates instead of
        # falling back to a per-partition SortAggregate
        cond = F.col("snap") == snap
        return F.max_by(F.when(cond, F.col("h")), F.when(cond, F.col("event_id")))

    latest = caps.groupBy("url").agg(
        _latest("A").alias("sig_a"), _latest("B").alias("sig_b")
    )
    status = (
        F.when(F.col("sig_a").isNull(), F.lit("added"))
        .when(F.col("sig_b").isNull(), F.lit("removed"))
        .when(F.col("sig_a") == F.col("sig_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return latest.select(
        "url",
        status.alias("status"),
        F.coalesce("sig_a", F.lit(-1)).alias("sig_a"),
        F.coalesce("sig_b", F.lit(-1)).alias("sig_b"),
    ).orderBy("url")


# ---------------------------------------------------------------------------
# Host denylist curation
# ---------------------------------------------------------------------------

_BLOCKLIST_ORACLE = f"""
WITH urls AS (
  SELECT {_canon_url_sql()} AS url FROM events
),
hosted AS (
  SELECT regexp_extract(url, '^https?://([^/:]+)', 1) AS host, url FROM urls
),
per_host AS (
  SELECT host, count(*)::BIGINT AS n_events,
         count(DISTINCT url)::BIGINT AS n_urls
  FROM hosted GROUP BY host
)
SELECT host, n_events, n_urls,
       CASE WHEN {X.h32_sql(f"host || '{DENY_SALT}'")} % {DENY_MOD} = 0
            THEN 'blocked' ELSE 'kept' END AS verdict
FROM per_host ORDER BY host
"""


@query(
    "url_host_blocklist",
    _BLOCKLIST_ORACLE,
    doc="UT1-/RefinedWeb-style host-denylist curation: canonical host "
        "extraction (regexp on the scan, codegen), per-host event/URL "
        "counts (two-level hash agg — no sort-based distinct), then a "
        "BROADCAST left join against the denylist table for the verdict. "
        "The synthetic denylist is hash-derived (h32(host‖salt) % "
        f"{DENY_MOD} == 0) so both engines build the identical list with "
        "no external data; a production UT1 list (~4M hosts, tens of MB) "
        "slots into the same broadcast shape unchanged. Deriving the "
        "synthetic list from the corpus itself costs a second (pruned) "
        "scan in THIS fixture; the production external-table list replaces "
        "that branch with a tiny file read and one corpus scan remains",
)
def url_host_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # n_urls: distinct canonical urls per host — two-level agg keeps every
    # stage a codegen'd HashAggregate (count(DISTINCT) plans sort-based)
    hosted = ev.select(
        url_canonical_expr(_url_raw_expr()).alias("url")
    ).select(
        F.regexp_extract("url", "^https?://([^/:]+)", 1).alias("host"), "url"
    )
    per_url = hosted.groupBy("host", "url").agg(F.count("*").alias("cnt"))
    per_host = per_url.groupBy("host").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_urls"),
    )
    denylist = (
        per_host.select("host")
        .where(F.pmod(X.h32(F.concat(F.col("host"), F.lit(DENY_SALT))),
                      F.lit(DENY_MOD)) == 0)
        .withColumn("blocked", F.lit(True))
    )
    return (
        per_host.join(F.broadcast(denylist), "host", "left")
        .select(
            "host", "n_events", "n_urls",
            F.when(F.col("blocked"), F.lit("blocked"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# Iterative BPE training: R merge rounds, each feeding the next
# ---------------------------------------------------------------------------
#
# ``bpe_merge_candidates`` above scores ONE round's candidates;
# ``bpe_train_merges`` runs the actual trainer loop (Sennrich et al. 2016,
# Algorithm 1): R rounds of count-adjacent-pairs → pick the most frequent →
# apply the merge to every word → recount. The corpus-scale story is
# unchanged — the corpus is collapsed to its distinct-word frequency table
# ONCE (the only corpus-sized shuffle; Heaps' law keeps the vocab sublinear)
# and every round runs over the vocabulary only, exactly how production BPE
# trainers (subword-nmt, HuggingFace tokenizers) are structured.
#
# Cross-engine determinism: the symbol sequence of a word is carried as a
# U+001F-joined string; the best pair is the (freq DESC, l, r) total-order
# head; the merge application is a LEFT FOLD over the symbols with a string
# accumulator — "merge when the accumulator's last complete symbol is l and
# the next symbol is r" — which is the left-to-right non-overlapping greedy
# of the published algorithm, and is expressed by the SAME lambda in Spark
# (``F.aggregate``) and DuckDB (``list_reduce``), so the engines cannot
# diverge. Spark's higher-order functions do not codegen, but they run over
# the bounded vocab, never the corpus; each round's vocab is localCheckpoint
# cut so the R-round lineage stays linear instead of exponential (the same
# treatment as link_graph_pagerank's iterations).

#: trained merge rounds (unrolled in the oracle)
BPE_TRAIN_ROUNDS = 6

#: symbol separator inside a carried word — U+001F UNIT SEPARATOR cannot
#: appear in any token (the tokenizer strips control chars), so "ends with
#: SEP||l" tests exactly "last complete symbol is l"
BPE_SEP = "\x1f"
_SEP_SQL = "chr(31)"


def _bpe_round_ctes(k: int) -> str:
    return f"""p{k} AS (
  SELECT s.syms[r.i] AS l, s.syms[r.i + 1] AS r, sum(s.wf)::BIGINT AS freq
  FROM (SELECT string_split(w_s, {_SEP_SQL}) AS syms, wf FROM v{k - 1}) s,
       unnest(range(1, len(s.syms))) AS r(i)
  GROUP BY 1, 2
),
best{k} AS (
  SELECT {k} AS merge_round, l, r, freq
  FROM p{k} ORDER BY freq DESC, l, r LIMIT 1
),
v{k} AS (
  -- LEFT JOIN ON TRUE, not a cross join: when the pair supply exhausts
  -- before the last round, best{k} is EMPTY and a cross join would
  -- annihilate the vocab (fertility would read zero rows); with NULL
  -- l/r the fold's merge condition is never satisfied, so the word
  -- rebuilds unchanged — matching the published algorithm's "stop
  -- merging, keep the vocabulary" (and the Spark side's identical join)
  SELECT w0,
         CASE WHEN strpos(w_s, {_SEP_SQL}) = 0 THEN w_s
         ELSE list_reduce(string_split(w_s, {_SEP_SQL}),
              (acc, x) -> CASE WHEN (acc = b.l OR ends_with(acc, {_SEP_SQL} || b.l))
                               AND x = b.r
                          THEN acc || x ELSE acc || {_SEP_SQL} || x END) END AS w_s,
         wf
  FROM v{k - 1} LEFT JOIN best{k} b ON TRUE
)"""


_BPE_V0_SQL = f"""v0 AS (
  SELECT t || '{BPE_EOW}' AS w0,
         array_to_string(string_split(t || '{BPE_EOW}', ''), {_SEP_SQL}) AS w_s,
         count(*)::BIGINT AS wf
  FROM documents, unnest({X.tokens_sql("text")}) AS u(t)
  GROUP BY 1, 2
)"""

_BPE_CHAIN_SQL = (
    "WITH "
    + _BPE_V0_SQL
    + ",\n"
    + ",\n".join(_bpe_round_ctes(k) for k in range(1, BPE_TRAIN_ROUNDS + 1))
)

_BPE_TRAIN_ORACLE = (
    _BPE_CHAIN_SQL
    + """
SELECT merge_round, l AS left_sym, r AS right_sym, l || r AS merged, freq
FROM ("""
    + "\nUNION ALL\n".join(
        f"SELECT * FROM best{k}" for k in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    + """)
ORDER BY merge_round
"""
)


def _bpe_train(spark: SparkSession, sf_dir: str, word_freqs: DataFrame | None = None):
    """Run the trainer loop; return (per-round best rows, final vocab).

    The final vocab keeps the ORIGINAL word ``w0`` next to its merged
    symbol string ``w_s`` so downstream consumers (fertility stats) can
    join the trained segmentation back onto corpus tokens.

    ``word_freqs`` (optional): a precomputed (w0, wf) frequency frame —
    callers that already paid a corpus-sized token aggregation (fertility's
    per-lang counts) re-aggregate THAT instead of triggering a second
    corpus scan here."""
    if word_freqs is None:
        docs = _spread(load(spark, sf_dir, "documents")).select("text")
        word_freqs = (
            docs.select(F.explode(X.tokens_expr(F.col("text"))).alias("t"))
            .select(F.concat(F.col("t"), F.lit(BPE_EOW)).alias("w0"))
            .groupBy("w0")
            .agg(F.count("*").cast("long").alias("wf"))
        )
    vocab = (
        word_freqs.select(
            "w0",
            F.array_join(F.split(F.col("w0"), ""), BPE_SEP).alias("w_s"),
            "wf",
        )
        .localCheckpoint(eager=False)
    )
    bests = []
    for k in range(1, BPE_TRAIN_ROUNDS + 1):
        syms = F.split(F.col("w_s"), BPE_SEP)
        pairs = (
            vocab.where(F.size(syms) >= 2)
            .select(
                syms.alias("syms"),
                "wf",
                F.explode(F.sequence(F.lit(1), F.size(syms) - 1)).alias("i"),
            )
            .select(
                F.element_at(F.col("syms"), F.col("i")).alias("l"),
                F.element_at(F.col("syms"), F.col("i") + 1).alias("r"),
                "wf",
            )
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("wf").cast("long").alias("freq"))
            .orderBy(F.col("freq").desc(), "l", "r")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        bests.append(
            best.select(
                F.lit(k).cast("int").alias("merge_round"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat(F.col("l"), F.col("r")).alias("merged"),
                "freq",
            )
        )
        sep_l = F.concat(F.lit(BPE_SEP), F.col("l"))
        merged_ws = F.when(F.size(syms) == 1, F.col("w_s")).otherwise(
            F.aggregate(
                F.slice(syms, 2, F.size(syms) - 1),
                F.element_at(syms, 1),
                lambda acc, x: F.when(
                    ((acc == F.col("l")) | acc.endswith(sep_l))
                    & (x == F.col("r")),
                    F.concat(acc, x),
                ).otherwise(F.concat(acc, F.lit(BPE_SEP), x)),
            )
        )
        # broadcast LEFT join on TRUE (not crossJoin): an EMPTY best —
        # pair supply exhausted before the last round — must keep the
        # vocab unchanged (NULL l/r never satisfies the merge condition),
        # exactly like the oracle's LEFT JOIN ON TRUE; a cross join would
        # annihilate every word and downstream consumers would see an
        # empty corpus instead of fully-merged words
        vocab = (
            vocab.join(F.broadcast(best.select("l", "r")), F.lit(True), "left")
            .select("w0", merged_ws.alias("w_s"), "wf")
            .localCheckpoint(eager=False)
        )
    return bests, vocab


@query(
    "bpe_train_merges",
    _BPE_TRAIN_ORACLE,
    doc=f"the full BPE trainer loop (Sennrich et al. 2016 Alg. 1): "
        f"{BPE_TRAIN_ROUNDS} rounds of pair-count → (freq DESC, pair) "
        "argmax → greedy left-to-right merge applied to every vocab word, "
        "each round feeding the next; corpus collapsed to the distinct-word "
        "frequency table once (the only corpus-sized shuffle), rounds run "
        "on the vocab only; the merge fold is the identical lambda in both "
        "engines (F.aggregate / list_reduce) and the oracle unrolls the "
        "rounds as chained CTEs",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    bests, _ = _bpe_train(spark, sf_dir)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out.orderBy("merge_round")


# ---------------------------------------------------------------------------
# Tokenizer QA: apply the trained merges back to the corpus
# ---------------------------------------------------------------------------

_FERTILITY_ORACLE = (
    _BPE_CHAIN_SQL
    + f""",
mapping AS (
  SELECT w0, len(string_split(w_s, {_SEP_SQL}))::BIGINT AS n_sym
  FROM v{BPE_TRAIN_ROUNDS}
),
langtok AS (
  SELECT lang, t || '{BPE_EOW}' AS w0, count(*)::BIGINT AS wf
  FROM documents, unnest({X.tokens_sql("text")}) AS u(t)
  GROUP BY 1, 2
)
SELECT lang,
       sum(wf)::BIGINT AS n_words,
       sum(wf * n_sym)::BIGINT AS n_subwords,
       {X.r6_sql("sum(wf * n_sym) / sum(wf)::DOUBLE")} AS fertility
FROM langtok JOIN mapping USING (w0)
GROUP BY lang ORDER BY lang
"""
)


@query(
    "bpe_tokenize_fertility",
    _FERTILITY_ORACLE,
    doc="tokenizer QA closing the training loop: the segmentation learned "
        f"by the {BPE_TRAIN_ROUNDS}-round trainer is applied back to the "
        "corpus and summarized as per-lang fertility (subword symbols per "
        "word — the metric tokenizer teams track per language to catch "
        "under-served scripts); ONE corpus-sized pass total — the "
        "(lang, word) count is the only corpus aggregation, the trainer's "
        "word frequencies re-aggregate it (vocab-sized input), the merge "
        "chain runs over the vocab only, and the fertility join is "
        "vocab-sized",
)
def bpe_tokenize_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus-sized pass total: the per-(lang, word) counts are the
    # single corpus aggregation, cut once; the trainer's corpus-wide word
    # frequencies re-aggregate langtok (vocab-sized input) instead of
    # re-scanning and re-exploding the corpus
    docs = _spread(load(spark, sf_dir, "documents")).select("lang", "text")
    langtok = (
        docs.select("lang", F.explode(X.tokens_expr(F.col("text"))).alias("t"))
        .select("lang", F.concat(F.col("t"), F.lit(BPE_EOW)).alias("w0"))
        .groupBy("lang", "w0")
        .agg(F.count("*").cast("long").alias("wf"))
        .localCheckpoint(eager=False)
    )
    word_freqs = langtok.groupBy("w0").agg(F.sum("wf").cast("long").alias("wf"))
    _, vocab = _bpe_train(spark, sf_dir, word_freqs=word_freqs)
    mapping = vocab.select(
        "w0", F.size(F.split(F.col("w_s"), BPE_SEP)).cast("long").alias("n_sym")
    )
    return (
        langtok.join(mapping, "w0")
        .groupBy("lang")
        .agg(
            F.sum("wf").cast("long").alias("n_words"),
            F.sum(F.col("wf") * F.col("n_sym")).cast("long").alias("n_subwords"),
            X.r6(
                F.sum(F.col("wf") * F.col("n_sym"))
                / F.sum("wf").cast("double")
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# robots.txt policy evaluation (RFC 9309 longest-match)
# ---------------------------------------------------------------------------
#
# The gate every polite crawler runs before a fetch: match the url path
# against the host's allow/disallow prefix rules, pick the LONGEST matching
# prefix, and on an exact length tie let allow win (RFC 9309 §2.2.2 "most
# specific match ... least restrictive rule"). No rule → allowed.
#
# Rules are synthesized deterministically per host so both engines build the
# identical policy table: every host carries disallow /p/1 (a broad prefix
# ban), allow /p/12 (a longer override re-opening part of it), and the
# allow-vs-disallow /p/15 pair at EQUAL length (pins the tie rule); even-
# numbered hosts add disallow /p/3 (per-host variation). At production scale
# the rules table is parsed robots.txt files — a few MB for millions of
# hosts — and broadcasts exactly like this synthesized one.

_ROBOTS_COMMON = [
    ("disallow", "/p/1"),
    ("allow", "/p/12"),
    ("allow", "/p/15"),
    ("disallow", "/p/15"),
]
_ROBOTS_EVEN_HOST = ("disallow", "/p/3")


def _robots_oracle() -> str:
    common = ", ".join(f"('{k}', '{p}')" for k, p in _ROBOTS_COMMON)
    ek, ep = _ROBOTS_EVEN_HOST
    return f"""
WITH urls AS (
  SELECT DISTINCT {_canon_url_sql()} AS url FROM events
), parsed AS (
  SELECT url,
         regexp_extract(url, '^https?://([^/:]+)', 1) AS host,
         regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path
  FROM urls
), hosts AS (
  SELECT DISTINCT host,
         TRY_CAST(regexp_extract(host, '^h([0-9]+)', 1) AS BIGINT) AS hd
  FROM parsed
), rules AS (
  SELECT host, kind, prefix
  FROM hosts CROSS JOIN (VALUES {common}) r(kind, prefix)
  UNION ALL
  SELECT host, '{ek}', '{ep}' FROM hosts WHERE hd % 2 = 0
), matched AS (
  -- LEFT join: a url with no matching rule keeps one NULL-rule row, so the
  -- per-url argmax window also resolves the default-allow case — no second
  -- pass over the url table
  SELECT p.url, p.host, r.kind, r.prefix,
         row_number() OVER (
           PARTITION BY p.url
           ORDER BY length(r.prefix) DESC NULLS LAST, (r.kind = 'allow') DESC
         ) AS rk
  FROM parsed p LEFT JOIN rules r
    ON r.host = p.host AND starts_with(p.path, r.prefix)
)
SELECT host,
       CASE WHEN kind IS NULL OR kind = 'allow'
            THEN 'allowed' ELSE 'blocked' END AS verdict,
       COALESCE(prefix, '') AS matched_rule,
       count(*)::BIGINT AS n_urls
FROM matched WHERE rk = 1
GROUP BY 1, 2, 3
ORDER BY host, verdict, matched_rule
"""


def evaluate_robots(parsed: DataFrame, rules: DataFrame) -> DataFrame:
    """Reusable robots evaluation core for LITERAL-PREFIX rules: per url
    (``parsed``: url/host/path), match the host's prefix ``rules``
    (host/kind/prefix), pick the LONGEST matching prefix, allow wins an
    exact-length tie, no rule -> allowed. Returns
    (url, host, verdict, matched_rule).

    Scope: implements RFC 9309's longest-match/allow-wins precedence over
    plain string prefixes only — the '*' and '$' wildcard forms the RFC
    also defines are NOT supported here; expand wildcard rules to literal
    prefixes (or extend the match predicate) before feeding real parsed
    robots.txt rule sets.

    LEFT broadcast join (equi on host + the prefix predicate riding the
    join): a url with no matching rule keeps one NULL-rule row, so the
    per-url argmax window also resolves the default-allow case — one url
    pass, no second join back. Property-tested against a pure-Python
    evaluator on random rule/path sets (test_properties)."""
    from pyspark.sql import Window

    p_, r_ = parsed.alias("p"), rules.alias("r")
    matched = p_.join(
        F.broadcast(r_),
        (F.col("p.host") == F.col("r.host"))
        & F.col("p.path").startswith(F.col("r.prefix")),
        "left",
    ).select(
        F.col("p.url").alias("url"),
        F.col("p.host").alias("host"),
        F.col("r.kind").alias("kind"),
        F.col("r.prefix").alias("prefix"),
    )
    w = Window.partitionBy("url").orderBy(
        F.length("prefix").desc_nulls_last(), (F.col("kind") == "allow").desc()
    )
    return (
        matched.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "url",
            "host",
            F.when(
                F.col("kind").isNull() | (F.col("kind") == "allow"), F.lit("allowed")
            )
            .otherwise(F.lit("blocked"))
            .alias("verdict"),
            F.coalesce("prefix", F.lit("")).alias("matched_rule"),
        )
    )



@query(
    "robots_policy_eval",
    _robots_oracle(),
    doc="robots.txt policy evaluation (RFC 9309 longest-match; allow wins "
        "exact-length ties — pinned by the planted equal-length allow/"
        "disallow pair): per-url verdict from the host's prefix rules, "
        "rolled up per (host, verdict, winning rule); rules table is "
        "host-count-sized and BROADCAST (a real corpus' parsed robots "
        "files are a few MB for millions of hosts), urls make one pass — "
        "broadcast-hash prefix join + per-url argmax window, no corpus "
        "self-join",
)
def robots_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    urls = ev.select(url_canonical_expr(_url_raw_expr()).alias("url")).distinct()
    parsed = urls.select(
        "url",
        F.regexp_extract("url", r"^https?://([^/:]+)", 1).alias("host"),
        F.regexp_extract("url", r"^https?://[^/]+(/[^?#]*)", 1).alias("path"),
    ).localCheckpoint(eager=False)  # reused by hosts, the join, and the rollup
    hosts = parsed.select(
        "host",
        # try_cast: hosts not matching hN (real-corpus names) degrade to a
        # NULL hd (→ no even-host rule) instead of throwing under ANSI mode
        F.regexp_extract("host", r"^h([0-9]+)", 1).try_cast("long").alias("hd"),
    ).distinct()
    common = F.array(
        *[
            F.struct(F.lit(k).alias("kind"), F.lit(p).alias("prefix"))
            for k, p in _ROBOTS_COMMON
        ]
    )
    ek, ep = _ROBOTS_EVEN_HOST
    even = F.array(F.struct(F.lit(ek).alias("kind"), F.lit(ep).alias("prefix")))
    empty = F.array().cast("array<struct<kind:string,prefix:string>>")
    rules = hosts.select(
        "host",
        F.explode(
            F.concat(common, F.when(F.col("hd") % 2 == 0, even).otherwise(empty))
        ).alias("r"),
    ).select("host", "r.kind", "r.prefix")
    return (
        evaluate_robots(parsed, rules)
        .groupBy("host", "verdict", "matched_rule")
        .agg(F.count("*").cast("long").alias("n_urls"))
        .orderBy("host", "verdict", "matched_rule")
    )


# ---------------------------------------------------------------------------
# Tokenizer QA #2: character coverage / UNK rate on out-of-corpus text
# ---------------------------------------------------------------------------
#
# SentencePiece's character_coverage and every production tokenizer report:
# which characters of INCOMING text are absent from the training corpus'
# character inventory (they become UNK/byte-fallback tokens at inference).
# Training inventory = distinct characters of `documents.text`; evaluation
# stream = the events table's raw `props` JSON strings — a genuinely
# different distribution (braces, quotes, colons, digits) so the UNK rate
# is non-trivially nonzero. The inventory is charset-sized and BROADCAST;
# the evaluation is one scan + rollup.

_CHARCOV_SQL = f"""
WITH train AS (
  SELECT DISTINCT u.c FROM documents,
       unnest(regexp_extract_all(text, '(?s).')) AS u(c)
), ev AS (
  SELECT event_type, u.c
  FROM events, unnest(regexp_extract_all(props, '(?s).')) AS u(c)
)
SELECT ev.event_type,
       count(*)::BIGINT AS n_chars,
       count(*) FILTER (WHERE t.c IS NULL)::BIGINT AS unk_chars,
       {X.r6_sql("count(*) FILTER (WHERE t.c IS NULL) / count(*)::DOUBLE")}
         AS unk_rate,
       count(DISTINCT CASE WHEN t.c IS NULL THEN ev.c END)::BIGINT
         AS n_distinct_unk
FROM ev LEFT JOIN train t ON t.c = ev.c
GROUP BY ev.event_type ORDER BY ev.event_type
"""


@query(
    "bpe_char_coverage",
    _CHARCOV_SQL,
    doc="tokenizer character-coverage audit (the SentencePiece "
        "character_coverage / byte-fallback-rate metric): the training "
        "corpus' distinct-character inventory (documents.text) is "
        "broadcast against an out-of-corpus evaluation stream (events' "
        "raw props JSON), reporting per-type UNK character occurrences "
        "and rate — the number every tokenizer team checks before a new "
        "data source enters training; inventory is charset-sized, "
        "evaluation is one scan + rollup",
)
def bpe_char_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ev = load(spark, sf_dir, "events")
    # (?s): Java regex '.' skips \r/\u0085/\u2028/\u2029 and RE2 '.' skips
    # only \n — DOTALL makes BOTH count every character incl. line
    # terminators, so web-crawl text with \r cannot desync the engines
    chars = lambda c: F.explode(F.expr(f"regexp_extract_all({c}, '(?s).', 0)"))  # noqa: E731
    train = docs.select(chars("text").alias("c")).distinct()
    evc = ev.select("event_type", chars("props").alias("c"))
    return (
        evc.join(
            F.broadcast(train.withColumn("known", F.lit(True))), "c", "left"
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_chars"),
            F.count(F.when(F.col("known").isNull(), 1)).cast("long").alias(
                "unk_chars"
            ),
            X.r6(
                F.count(F.when(F.col("known").isNull(), 1))
                / F.count("*").cast("double")
            ).alias("unk_rate"),
            F.count_distinct(
                F.when(F.col("known").isNull(), F.col("c"))
            ).cast("long").alias("n_distinct_unk"),
        )
        .orderBy("event_type")
    )

"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md F1).

Generates the engine's subject table — ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` per BASELINE.json ``input_hint`` —
entirely with Catalyst expressions: every "random" quantity is derived from
``xxhash64`` of the row id plus a salt, so the same (n_rows, n_days, seed)
always produces byte-identical data on any cluster size, with no driver-side
loops and no RNG state. At 10^12-row scale this generator is itself a
distributed job (``spark.range`` parallelizes the id space).

Skew is built in on purpose: host ranks follow an inverse-square law
(continuous-Zipf s=1.5 via inverse-CDF, top host ≈ 29% of rows) so the skew
handling demanded by the north rule is exercised by construction.

Injected defects (FIXTURES.md F1, keyed by day index, tagged in ``_defect``):
(placed on the LAST six days so drift days have a clean baseline; see
``defect_days``):
- n-6: duplicated url rows           → uniqueness violations
- n-5: lang='xx' on ~5% of rows      → referential violations
- n-4: ~12% NULL text (vs ~1% base)  → null-rate drift
- n-3: text length ×3                → length-distribution drift (≥ CONSENSUS)
- n-2: constant text                 → Boring gate (constant column)
- n-1: ~99.5% of rows dropped        → TooShort gate
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["PAGE_SCHEMA", "synth_pages", "LANGS", "defect_days"]

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# lang mix per FIXTURES.md F1
LANGS = [("eng", 0.6), ("deu", 0.7), ("fra", 0.8), ("spa", 0.9), ("zho", 1.0)]

def defect_days(n_days: int) -> dict[str, int]:
    """Defect-day placement (FIXTURES F1): the last six days carry one defect
    each, so drift days have a full clean baseline before them."""
    return {
        "dup": max(0, n_days - 6),
        "lang": max(0, n_days - 5),
        "null_text": max(0, n_days - 4),
        "len_shift": max(0, n_days - 3),
        "constant": max(0, n_days - 2),
        "too_short": max(0, n_days - 1),
    }

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "ocean", "river",
    "forest", "meadow", "stone", "ember", "frost", "gale",
]
_WORDS_PER_PARA = 40


def _u(seed_col: Column, salt: str) -> Column:
    """Deterministic uniform in (0, 1] derived from a hash (never exactly 0)."""
    return (F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(1_000_000)) + 1) / 1_000_000.0


def _host(seed_col: Column, n_hosts: int) -> Column:
    """Continuous-Zipf(s=1.5) host rank via inverse CDF: rank = ceil(u^-2).

    P(rank=1) = P(u > 1/√2) ≈ 0.293 — the skewed-host fixture.
    """
    rank = F.least(F.lit(n_hosts), F.ceil(F.pow(_u(seed_col, "host"), F.lit(-2.0))))
    return F.concat(F.lit("host-"), F.lpad(rank.cast("string"), 5, "0"), F.lit(".example.org"))


def _word_stream(seed_col: Column, n_words: Column, salt: str) -> Column:
    """Deterministic word sequence: vocab indexed by per-position hashes."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    idx = F.sequence(F.lit(0), n_words - 1)
    word = lambda i: F.element_at(  # noqa: E731
        vocab, (F.pmod(F.xxhash64(seed_col, F.lit(salt), i), F.lit(len(_VOCAB))) + 1).cast("int")
    )
    return F.transform(idx, word)


def _paragraphs(words: Column) -> Column:
    """Group the word array into newline-separated paragraphs of ≤ 40 words."""
    n_paras = F.ceil(F.size(words) / F.lit(_WORDS_PER_PARA)).cast("int")
    para = lambda p: F.concat_ws(  # noqa: E731
        " ", F.slice(words, p * _WORDS_PER_PARA + 1, _WORDS_PER_PARA)
    )
    return F.concat_ws("\n", F.transform(F.sequence(F.lit(0), n_paras - 1), para))


def _lorem_pool() -> str:
    """Deterministic ~30k-char word pool (seeded LCG over the vocab).

    Per-row text is a SUBSTRING of this constant — O(1) codegen string ops
    per row instead of per-word hash transforms, which are evaluated
    interpreted (higher-order functions don't codegen) and dominated
    generation time ~50x at the 10^6-row bench scale. Overlapping
    substrings also give documents genuine n-gram overlap, which exercises
    the near-dup operators.
    """
    state = 0xC0FFEE
    words = []
    for _ in range(5000):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        words.append(_VOCAB[(state >> 33) % len(_VOCAB)])
    return " ".join(words)


_LOREM = _lorem_pool()
# widest substring ever taken: 200 words * 3 (len_shift) * ~6.2 chars + jitter
_LOREM_SPAN = 4200
_CHARS_PER_WORD = 6


def _page_text(rid: Column, n_words: Column, day: Column) -> Column:
    """Two-paragraph page text: unique uid word + lorem substring.

    Day-level length jitter keeps per-day stat series (avg/p50 of length)
    non-degenerate — identical day distributions would give zero-variance
    drift baselines, which no real crawl has.
    """
    n_chars = (
        n_words * _CHARS_PER_WORD
        + F.pmod(F.xxhash64(rid, F.lit("jit")), F.lit(11))
        + F.pmod(F.xxhash64(day.cast("long"), F.lit("dayjit")), F.lit(13))
    )
    offset = F.pmod(F.xxhash64(rid, F.lit("off")), F.lit(len(_LOREM) - _LOREM_SPAN)) + 1
    return F.concat(
        F.lit("uid"),
        F.conv(rid.cast("string"), 10, 16),
        F.lit("\n"),
        F.substring(F.lit(_LOREM), offset.cast("int"), n_chars.cast("int")),
    )


def synth_pages(
    spark: SparkSession,
    n_rows: int = 10_000,
    n_days: int = 8,
    base_date: str = "2026-08-01",
    n_hosts: int = 1000,
    defects: bool = True,
    keep_defect_tag: bool = False,
) -> DataFrame:
    """Build the deterministic page table (see module docstring)."""
    df = spark.range(n_rows).withColumnRenamed("id", "_id")
    rid = F.col("_id")

    day = F.pmod(F.xxhash64(rid, F.lit("day")), F.lit(n_days)).cast("int")
    second = F.pmod(F.xxhash64(rid, F.lit("sec")), F.lit(86_400))
    warc_ts = F.to_timestamp(F.lit(base_date)) + F.make_dt_interval(days=day, secs=second.cast("double"))

    lang_u = _u(rid, "lang")
    lang = F.lit(LANGS[-1][0])
    for name, cum in reversed(LANGS[:-1]):
        lang = F.when(lang_u <= cum, F.lit(name)).otherwise(lang)

    url = F.concat(
        F.lit("https://"), _host(rid, n_hosts), F.lit("/p/"),
        F.conv(F.abs(F.xxhash64(rid, F.lit("path"))).cast("string"), 10, 16), F.lit("-"),
        rid.cast("string"),
    )

    # word count: 20–200 words, quadratic-skewed toward short pages
    n_words = (F.lit(20) + F.floor(F.pow(_u(rid, "len"), F.lit(2.0)) * 180)).cast("int")

    ddays = defect_days(n_days)
    defect = F.lit(None).cast("string")
    if defects:
        n_words = F.when(day == ddays["len_shift"], n_words * 3).otherwise(n_words)
        defect = F.when(day == ddays["len_shift"], F.lit("len_shift")).otherwise(defect)

    text = _page_text(rid, n_words, day)

    if defects:
        constant_text = F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), F.lit(40)), lambda _: F.lit("steady"))
        )
        # the whole day is constant → the within-partition Boring gate
        # (distinct-count == 1, SURVEY §2.2) skips drift for d7
        is_constant = day == ddays["constant"]
        text = F.when(is_constant, constant_text).otherwise(text)
        defect = F.when(is_constant, F.lit("constant")).otherwise(defect)

        # ~1% nulls everywhere (the drift baseline), 12% on the defect day
        null_u = _u(rid, "null")
        is_null_text = F.when(day == ddays["null_text"], null_u <= 0.12).otherwise(
            null_u <= 0.01
        )
        defect = F.when(is_null_text, F.lit("null_text")).otherwise(defect)

        is_bad_lang = (day == ddays["lang"]) & (_u(rid, "badlang") <= 0.05)
        lang = F.when(is_bad_lang, F.lit("xx")).otherwise(lang)
        defect = F.when(is_bad_lang, F.lit("bad_lang")).otherwise(defect)

    html = F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            F.regexp_extract(url, r"https://([^/]+)/", 1),
            F.lit("</title></head><body><nav><a href=\"https://www.example.org/\">home</a>"
                  "<a href=\"https://search.example.org/\">search</a></nav><article><p>"),
            F.regexp_replace(text, "\n", "</p><p>"),
            F.lit("</p></article><footer>crawl</footer></body></html>"),
        ),
        "UTF-8",
    )

    if defects:
        # html stays intact for null-text rows (extraction "failed upstream")
        text = F.when(is_null_text, F.lit(None)).otherwise(text)

    out = df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        day.alias("_day"),
        defect.alias("_defect"),
    )

    if defects:
        # d8: drop ~99.5% of the last day → TooShort partition
        last_day = n_days - 1
        keep = (F.col("_day") != last_day) | (_u(F.xxhash64(F.col("url")), "keep8") <= 0.005)
        out = out.where(keep).withColumn(
            "_defect",
            F.when(F.col("_day") == last_day, F.lit("too_short")).otherwise(F.col("_defect")),
        )
        # d3: duplicate ~5% of that day's urls (identical full rows)
        dups = out.where(
            (F.col("_day") == ddays["dup"]) & (_u(F.xxhash64(F.col("url")), "dup") <= 0.05)
        ).withColumn("_defect", F.lit("dup"))
        out = out.unionAll(dups)

    if not keep_defect_tag:
        out = out.drop("_day", "_defect")
    return out


def synth_documents(spark: SparkSession, n_rows: int = 100_000) -> DataFrame:
    """Deterministic documents table matching the testdata schema
    (doc_id, text, lang, source, n_chars) at arbitrary scale — used by the
    scaling bench to size the dedup stage beyond the fixed sf dirs.

    Every 20th doc copies the text of the doc 19 ids earlier (~5% exact
    duplicates). Text is a per-doc hashed word stream (`_word_stream`
    seeded by the base id), NOT a lorem-pool substring: overlapping
    substrings of a small pool give near-ALL-PAIRS MinHash candidates
    (measured 11M pairs from 50k docs — a quadratic verify stage that
    would swamp a throughput bench), while independent word streams keep
    chance 3-gram Jaccard ~0 so the candidate set is the injected dup
    pairs plus band-collision noise. Generation is HOF-interpreted and
    therefore slow per row — fine for the bench's one-time prep, not for
    the 10^6-row page fixtures (_page_text's substring trick exists for
    those).
    """
    rid = F.col("doc_id")
    base = F.when(rid % 20 == 19, rid - 19).otherwise(rid)
    n_words = (F.pmod(F.xxhash64(base, F.lit("nw")), F.lit(81)) + 60).cast("int")
    text = F.concat_ws(" ", _word_stream(base, n_words, "doc"))
    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")])
    return spark.range(n_rows).select(F.col("id").alias("doc_id")).select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            langs,
            (F.pmod(F.xxhash64(rid, F.lit("lg")), F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        _host(rid, 1000).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def synth_embeddings(
    spark: SparkSession, n_rows: int = 20_000, dim: int = 64
) -> DataFrame:
    """Deterministic embeddings table matching the testdata schema
    (vec_id, embedding float[], label) at arbitrary scale — used by the
    sf1 scale probe to size the embedding-dedup/ANN stages beyond the
    fixed sf dirs.

    Components are hash-uniform in [-0.5, 0.5); every 20th vector copies
    the vector 19 ids earlier (cosine exactly 1) so the near-dup path has
    real work at any scale, mirroring synth_documents' dup rule.
    """
    rid = F.col("vec_id")
    base = F.when(rid % 20 == 19, rid - 19).otherwise(rid)
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(base, F.lit("emb"), j), F.lit(1_000_000))
            / 1_000_000.0
            - 0.5
        ).cast("float"),
    )
    return spark.range(n_rows).select(F.col("id").alias("vec_id")).select(
        "vec_id",
        emb.alias("embedding"),
        F.pmod(F.xxhash64(rid, F.lit("lb")), F.lit(10)).cast("int").alias("label"),
    )

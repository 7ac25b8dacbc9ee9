"""Text-analysis primitives for the training-data pipeline.

Each primitive is defined ONCE as constants/arithmetic and rendered twice:
as a PySpark Column expression (the engine) and as an ANSI-SQL fragment (the
DuckDB oracle used by the driver's correctness gate). Both renderings share
the same constants defined in this module, so verdict parity is by
construction rather than by careful double-maintenance.

The portable cross-engine hash is ``h32(s) = int(md5(s)[:8], 16)`` — md5 is
bit-identical everywhere, giving a deterministic 32-bit value both engines
compute natively (Spark ``conv(substring(md5(c),1,8),16,10)``, DuckDB
``('0x'||substr(md5(c),1,8))::BIGINT``). All downstream hashing (MinHash
permutations, SimHash bit votes, rolling fingerprints) is plain 64-bit
modular arithmetic on top of h32, safe from overflow under ANSI mode.

Scale notes: everything here is a JVM-side Catalyst expression chain —
no Python UDFs — so at 10^12 documents these run inside whole-stage codegen
on the scan, with column pruning limited to the ``text`` column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

__all__ = [
    "MINHASH_PERMS",
    "MERSENNE_P",
    "STOPWORDS",
    "h32",
    "h32_sql",
    "tokens_expr",
    "tokens_sql",
    "token_count_expr",
    "token_count_codegen_expr",
    "token_count_sql",
    "quality_score_codegen_expr",
    "regex_token_count_expr",
    "regex_token_count_sql",
    "stopword_ratio_expr",
    "stopword_ratio_sql",
    "lang_id_expr",
    "lang_id_sql",
    "quality_score_expr",
    "quality_score_sql",
    "fingerprint_expr",
    "fingerprint_sql",
    "shingles_expr",
    "shingles_sql",
    "minhash_sig_expr",
    "minhash_sig_sql",
    "simhash_expr",
    "char_counts_udf",
    "simhash_sql",
]

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------

#: modulus for MinHash permutations (Mersenne prime 2^31 - 1)
MERSENNE_P = 2_147_483_647

#: fixed (a, b) pairs for the MinHash permutation family h_i(x) = (a*x + b) % p.
#: Deterministic: generated once from a linear congruential walk so both the
#: Spark expression and the oracle SQL embed the exact same literals.
#: a < 2^30 keeps a*h32 < 2^62 — no 64-bit overflow under ANSI mode.


def _lcg_constants(n: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    state = seed
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = (state >> 20) % (2**30 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = (state >> 20) % MERSENNE_P
        out.append((a, b))
    return out


MINHASH_PERMS: list[tuple[int, int]] = _lcg_constants(16)

#: modulus + multiplier of the rolling document fingerprint
FP_MOD = 1_000_000_007
FP_MULT = 31

#: english stopword subset for the n-gram/stopword language heuristic
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that",
    "from", "but", "not", "have", "has",
]

#: regex for the BPE-ish token counter: words | numbers | single punctuation
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: stopword-ratio threshold above which the lang-ID heuristic says "en"
LANG_EN_THRESHOLD = 0.05


# ---------------------------------------------------------------------------
# Portable 32-bit hash
# ---------------------------------------------------------------------------

def h32(col: Column) -> Column:
    """int(md5(s)[:8], 16) — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def r6(col: Column) -> Column:
    """Portable 6-dp rounding: floor(x·1e6 + 0.5)/1e6 in BOTH engines.

    Native round() differs at half-way boundaries (Spark rounds the exact
    BigDecimal expansion HALF_UP; DuckDB rounds in float space), which flips
    the last digit for small-rational values like token ratios. The floor
    form is the same double arithmetic everywhere, so it cannot disagree.
    """
    return F.floor(col * 1_000_000 + F.lit(0.5)) / 1_000_000


def r6_sql(expr: str) -> str:
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000"


def h32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# ---------------------------------------------------------------------------
# Tokenization (lowercase, whitespace split, empties dropped)
# ---------------------------------------------------------------------------

def tokens_expr(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({expr}), '\\s+'), t -> t <> '')"


def token_count_expr(col: Column) -> Column:
    return F.size(tokens_expr(col)).cast("long")


def _ws_trim(col: Column) -> Column:
    # regexp trim, NOT F.trim: trim() strips only U+0020, so a leading tab
    # or newline would survive it, split() would emit a leading empty token,
    # and the codegen twins would disagree with both the HOF forms and the
    # DuckDB oracles (one wrong ntok corrupts every downstream cumulative
    # sum in mixture_token_budget). regexp_replace stays codegen-able.
    return F.regexp_replace(F.lower(col), r"^\s+|\s+$", "")


def _trim_toks(col: Column) -> Column:
    # trim first: `\s+` runs collapse, so only the string's edges can
    # produce empty tokens — trimming removes them without a filter lambda
    return F.split(_ws_trim(col), r"\s+")


def tokens_codegen_expr(col: Column) -> Column:
    """Whole-stage-codegen twin of :func:`tokens_expr` for EXPLODE paths.

    The HOF ``F.filter`` form is CodegenFallback and drags every downstream
    per-token expression (md5 hashing, bucketing) into interpreted
    evaluation. The trim+split form stays in the codegen span and yields
    the identical token list — PROVIDED the caller first excludes
    whitespace-only/empty text with ``nonempty_text_expr`` (trim+split
    returns ``['']`` there, where the HOF form returns ``[]``).
    """
    return _trim_toks(col)


def nonempty_text_expr(col: Column) -> Column:
    """Guard for :func:`tokens_codegen_expr`: True iff the text has at
    least one token (equivalent to ``size(tokens_expr(col)) >= 1``)."""
    return _ws_trim(col) != ""


def token_count_codegen_expr(col: Column) -> Column:
    """Whole-stage-codegen twin of :func:`token_count_expr`.

    ``F.filter(...)`` is a higher-order function — a CodegenFallback
    expression that ejects its whole Project from whole-stage codegen.
    The trim+split form needs no lambda, stays inside the codegen span,
    and returns the same value for every input.
    """
    return (
        F.when(_ws_trim(col) == "", F.lit(0))
        .otherwise(F.size(_trim_toks(col)))
        .cast("long")
    )


def quality_score_codegen_expr(col: Column) -> Column:
    """Whole-stage-codegen twin of :func:`quality_score_expr`.

    The two higher-order folds become codegen-able scalars: Σ len(token)
    equals the count of non-whitespace characters (one regexp_replace), and
    the TTR token array comes from trim+split so no filter lambda is needed.
    All intermediates are exact (integer-valued doubles), so the score is
    bit-identical to the HOF form.
    """
    toks = _trim_toks(col)
    empty = _ws_trim(col) == ""
    words = F.when(empty, F.lit(0.0)).otherwise(F.size(toks).cast("double"))
    n = F.greatest(words, F.lit(1.0))
    ndistinct = F.when(empty, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(toks)).cast("double")
    )
    awl = F.length(F.regexp_replace(F.lower(col), r"\s", "")).cast("double") / n
    return r6(
        F.least(words / 100.0, F.lit(1.0)) * 0.4
        + (ndistinct / n) * 0.3
        + F.least(awl / 8.0, F.lit(1.0)) * 0.3
    )


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})::BIGINT"


def regex_token_count_expr(col_name: str) -> Column:
    # lit() pattern, not F.expr — SQL string literals would eat the \s escape
    return F.size(
        F.regexp_extract_all(col_name, F.lit(TOKEN_REGEX), F.lit(0))
    ).cast("long")


def regex_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_REGEX}'))::BIGINT"


# ---------------------------------------------------------------------------
# Stopword ratio + language-ID heuristic
# ---------------------------------------------------------------------------

def _stop_array() -> Column:
    return F.array(*[F.lit(s) for s in STOPWORDS])


def _stop_list_sql() -> str:
    return "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def stopword_ratio_from_tokens_expr(toks: Column) -> Column:
    """Stopword ratio over an already-materialized token-array column.

    Prefer this over :func:`stopword_ratio_expr` whenever several signals
    share one tokenization: passing a bound array *column* means lambda
    bodies reference a cheap attribute, while inlining ``tokens_expr``
    re-evaluates the split per higher-order-function element (O(tokens²)
    per row in the worst case)."""
    stops = F.size(F.filter(toks, lambda t: F.array_contains(_stop_array(), t)))
    return r6(stops / F.greatest(F.size(toks), F.lit(1)))


def stopword_ratio_expr(col: Column) -> Column:
    return stopword_ratio_from_tokens_expr(tokens_expr(col))


def stopword_ratio_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    return r6_sql(
        f"len(list_filter({toks}, t -> list_contains({_stop_list_sql()}, t)))"
        f" / greatest(len({toks}), 1)"
    )


def lang_id_expr(col: Column) -> Column:
    """'en' when the stopword ratio clears the threshold, else 'other'.

    The reference's nearest analog is namespace classification of metric
    names (`skyline_functions.py:1103-1129` dotted-element matching); for the
    training-data pipeline this is the standard cheap n-gram/stopword
    language gate run before expensive model-based LID.
    """
    return F.when(stopword_ratio_expr(col) > LANG_EN_THRESHOLD, F.lit("en")).otherwise(
        F.lit("other")
    )


def lang_id_from_tokens_expr(toks: Column) -> Column:
    """Token-column twin of :func:`lang_id_expr` (see
    :func:`stopword_ratio_from_tokens_expr` for why)."""
    return F.when(
        stopword_ratio_from_tokens_expr(toks) > LANG_EN_THRESHOLD, F.lit("en")
    ).otherwise(F.lit("other"))


def lang_id_sql(expr: str) -> str:
    return (
        f"case when {stopword_ratio_sql(expr)} > {LANG_EN_THRESHOLD} "
        f"then 'en' else 'other' end"
    )


# ---------------------------------------------------------------------------
# Quality score
# ---------------------------------------------------------------------------

def quality_score_expr(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + lexical diversity.

    score = 0.4·min(1, words/100) + 0.3·type_token_ratio
          + 0.3·min(1, avg_word_len/8); rounded to 6dp.
    """
    return quality_score_from_tokens_expr(tokens_expr(col))


def quality_score_from_tokens_expr(toks: Column) -> Column:
    """Token-column twin of :func:`quality_score_expr` (see
    :func:`stopword_ratio_from_tokens_expr` for why)."""
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    words = F.size(toks).cast("double")
    ttr = F.size(F.array_distinct(toks)) / n
    awl = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n
    return r6(
        F.least(words / 100.0, F.lit(1.0)) * 0.4
        + ttr * 0.3
        + F.least(awl / 8.0, F.lit(1.0)) * 0.3
    )


def quality_score_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    n = f"greatest(len({toks}), 1)::DOUBLE"
    ttr = f"(len(list_distinct({toks})) / {n})"
    awl = f"(list_reduce(list_prepend(0.0, list_transform({toks}, t -> len(t)::DOUBLE)), (acc, x) -> acc + x) / {n})"
    return r6_sql(
        f"least(len({toks})::DOUBLE / 100.0, 1.0) * 0.4"
        f" + {ttr} * 0.3 + least({awl} / 8.0, 1.0) * 0.3"
    )


# ---------------------------------------------------------------------------
# Rolling document fingerprint
# ---------------------------------------------------------------------------

def fingerprint_expr(col: Column) -> Column:
    """Left-fold polynomial rolling hash over token h32s, mod 1e9+7."""
    hashes = F.transform(tokens_expr(col), lambda t: h32(t))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_MULT + h) % FP_MOD,
    )


def fingerprint_sql(expr: str) -> str:
    hashes = f"list_transform({tokens_sql(expr)}, t -> {h32_sql('t')})"
    return (
        f"list_reduce(list_prepend(0::BIGINT, {hashes}), "
        f"(acc, h) -> (acc * {FP_MULT} + h) % {FP_MOD})"
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash signature
# ---------------------------------------------------------------------------

def shingles_expr(col: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (space-joined), [] when fewer than k tokens.

    Only for one-shot use over a raw text column; when the caller already has
    (or reuses) a token array, bind it to a column and call
    :func:`shingles_from_tokens_expr` — inlining the tokenizer here puts a
    split inside every element_at lambda call (O(k·tokens) splits per row)."""
    return shingles_from_tokens_expr(tokens_expr(col), k)


def shingles_from_tokens_expr(toks: Column, k: int = 3) -> Column:
    """Shingles over a bound token-array column (see :func:`shingles_expr`)."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.array_distinct(joined)


def shingles_sql(toks: str, k: int = 3) -> str:
    """Shingle SQL over a bound token-list expression/alias ``toks``.

    (The oracle SQL binds tokens in a CTE first — inlining the tokenizer 16×
    into the MinHash arms would make the SQL unreadable and slow.)
    """
    parts = ", ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"list_distinct(list_transform("
        f"case when len({toks}) >= {k} then generate_series(1, len({toks}) - {k - 1}) "
        f"else []::BIGINT[] end, "
        f"i -> concat_ws(' ', {parts})))"
    )


def minhash_sig_expr(col: Column, n_perms: int = 16) -> Column:
    """MinHash signature: array of min over shingles of (a·h32+b) mod p."""
    sh = shingles_expr(col)
    hashes = F.transform(sh, lambda s: h32(s))
    sig = F.array(
        *[
            F.array_min(
                F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE_P)
            )
            for (a, b) in MINHASH_PERMS[:n_perms]
        ]
    )
    return sig


def minhash_sig_sql(shingle_hashes: str, n_perms: int = 16) -> str:
    """SQL MinHash signature over a bound list-of-h32 alias."""
    mins = ", ".join(
        f"list_min(list_transform({shingle_hashes}, h -> ({a} * h + {b}) % {MERSENNE_P}))"
        for (a, b) in MINHASH_PERMS[:n_perms]
    )
    return f"[{mins}]"


# ---------------------------------------------------------------------------
# SimHash (32-bit, over token h32s)
# ---------------------------------------------------------------------------

#: SimHash width. Round 4 widened 32 -> 60 bits (4 LSH bands of 15 bits):
#: with b-bit bands, random band collisions are ~n^2/2^(b+1) per band, so
#: 8-bit bands that were fine at 5k docs went quadratic at the 50k-doc sf1
#: scale probe (a single hot band bucket OOM'd a 16g heap); 15-bit bands
#: cut random collisions 128x while the hamming<=3 pigeonhole guarantee
#: over 4 bands is width-independent. 60 bits = 15 md5 hex chars, safely
#: inside signed-int64 range in BOTH engines (16 chars could overflow).
SIMHASH_BITS = 60
SIMHASH_HEX_CHARS = SIMHASH_BITS // 4


def h60(col: Column) -> Column:
    """int(md5(s)[:15], 16) — the 60-bit sibling of h32, token hash of the
    SimHash bit votes. Identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, SIMHASH_HEX_CHARS), 16, 10).cast(
        "long"
    )


def h60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, {SIMHASH_HEX_CHARS}))::BIGINT"


def simhash_expr(col: Column) -> Column:
    """Bit i set iff more than half of the tokens have bit i set in h60."""
    hashes = F.transform(tokens_expr(col), lambda t: h60(t))
    # the per-bit loop is unrolled in python (pyspark lambdas can't close over
    # a Column bit index); Catalyst constant-folds the per-bit masks

    def _bit_votes(i: int):
        # bit i of h == (h % 2^(i+1)) >= 2^i — pure long arithmetic
        def merge(acc, h):
            return acc + F.when(
                (h % F.lit(1 << (i + 1))) >= F.lit(1 << i), F.lit(1)
            ).otherwise(F.lit(0)).cast("long")

        return merge

    bits = [
        F.when(
            F.aggregate(hashes, F.lit(0).cast("long"), _bit_votes(i)) * 2
            > F.size(hashes),
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    hashes = f"list_transform({toks}, t -> {h60_sql('t')})"
    return (
        f"list_sum(list_transform(generate_series(0, {SIMHASH_BITS - 1}), i -> "
        f" case when 2 * list_sum(list_transform({hashes}, h -> (h >> i) & 1)) "
        f"           > len({hashes}) "
        f" then (1::BIGINT << i) else 0::BIGINT end))::BIGINT"
    )


def shingles_udf(k: int = 3):
    """Arrow-batched twin of :func:`shingles_expr` for shingle hot paths.

    The expression form chains interpreted higher-order functions (split →
    filter → transform(concat_ws(element_at×k)) → array_distinct), which
    don't enter whole-stage codegen and dominated the MinHash pipeline
    (measured 16 s of a 14–16 s query at sf0.1). This kernel produces the
    IDENTICAL output — lowercase, ASCII-\\s+ split, empties dropped,
    k-token space-joined shingles, first-occurrence-order distinct — which
    the oracle's value-hash equality check enforces end-to-end.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("array<string>")
    def _shingles(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            toks = [w for w in ws.split(t.lower()) if w]
            if len(toks) < k:
                out.append([])
                continue
            out.append(
                list(
                    dict.fromkeys(
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    )
                )
            )
        return pd.Series(out)

    return _shingles


def text_hashes_udf():
    """Arrow-batched twin of fingerprint_expr + simhash_expr (one token pass).

    Pure integer arithmetic — md5-derived h32 per token, left-fold
    polynomial mod for the fingerprint, per-bit majority votes for the
    SimHash — so parity with the expression forms and the DuckDB oracle is
    exact by construction (no float ordering involved). The expression
    forms run 1 + 32 interpreted folds per row (HOFs don't codegen); this
    kernel also memoizes h32 per unique token, which the ~34-word synthetic
    vocabulary rewards heavily.
    """
    import hashlib
    import re
    from collections import Counter

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+", re.ASCII)
    bit_idx = np.arange(SIMHASH_BITS, dtype=np.int64)

    @pandas_udf("struct<fingerprint: long, simhash: long>")
    def _hashes(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, tuple[int, int]] = {}

        def hashes_py(t: str) -> tuple[int, int]:
            v = memo.get(t)
            if v is None:
                hx = hashlib.md5(t.encode("utf-8")).hexdigest()
                v = (int(hx[:8], 16), int(hx[:SIMHASH_HEX_CHARS], 16))
                memo[t] = v
            return v

        fps, sims = [], []
        for t in texts:
            if t is None:
                # NULL in → NULL out, matching the expression forms and the
                # DuckDB oracles (mapping null to 0 would make every
                # null-text pair a hamming-0 "duplicate" the oracle lacks)
                fps.append(None)
                sims.append(None)
                continue
            toks = [w for w in ws.split(t.lower()) if w]
            pairs = [hashes_py(w) for w in toks]
            acc = 0
            for h32v, _ in pairs:
                acc = (acc * FP_MULT + h32v) % FP_MOD
            fps.append(acc)
            n = len(pairs)
            sim = 0
            if n:
                cnt = Counter(h60v for _, h60v in pairs)
                H = np.fromiter(cnt.keys(), np.int64, len(cnt))
                C = np.fromiter(cnt.values(), np.int64, len(cnt))
                votes = (((H[:, None] >> bit_idx) & 1) * C[:, None]).sum(axis=0)
                sim = int(((2 * votes > n).astype(np.int64) << bit_idx).sum())
            sims.append(sim)
        return pd.DataFrame(
            {"fingerprint": pd.array(fps, dtype="Int64"),
             "simhash": pd.array(sims, dtype="Int64")}
        )

    return _hashes


def char_counts_udf():
    """Arrow-batched character-frequency moments: (n_chars, Σ count(c)²).

    Feeds the Simpson diversity index 1 − Σc²/n² — a cheap gibberish/spam
    gauge (low diversity ⇔ few characters dominate). Both outputs are
    INTEGERS, so the engine/oracle agreement is exact by construction: the
    only float op (the final division) happens once, relationally, on the
    same two integers in both engines — no transcendentals, no float-fold
    order anywhere. One Arrow pass per doc, no shuffle; the relational
    restatement (explode one row per character, groupBy twice) is the shape
    you must never run at 10^12 docs and exists only as the DuckDB oracle.
    """
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n: long, sumsq: long>")
    def _counts(texts: pd.Series) -> pd.DataFrame:
        ns, sq = [], []
        for t in texts:
            cnt = Counter(t) if t else {}
            ns.append(sum(cnt.values()))
            sq.append(sum(c * c for c in cnt.values()))
        return pd.DataFrame({"n": ns, "sumsq": sq})

    return _counts

"""Semantic unit tests for the curation operators: quality-classifier
inference (hash/weight arithmetic vs an independent Python reference),
CCNet perplexity bucketing (predictable text scores lower than rare text,
short docs excluded), and SemDeDup pruning (identical vectors pruned,
orthogonal vectors kept, zero vectors survive with NULL cosine).

Cross-engine value parity is covered by the catalog sweep
(tests/test_catalog.py); these pin the SEMANTICS on crafted inputs where
the expected answer is known by construction.
"""

from __future__ import annotations

import hashlib

import pytest

from skyline_spark.catalog.curation_queries import (
    CCNET_Q,
    QCLF_BUCKETS,
    QCLF_WSPAN,
    SEMDEDUP_TAU,
    ccnet_perplexity_buckets,
    quality_classifier_score,
    semdedup_prune,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ref_clf_score(text: str):
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return 0, 0, None
    sq = sum(
        _h32(f"qw:{_h32(t) % QCLF_BUCKETS}") % QCLF_WSPAN - 1000 for t in toks
    )
    import math

    score = math.floor(sq / (1000.0 * len(toks)) * 1e6 + 0.5) / 1e6
    return sq, len(toks), score


# ---------------------------------------------------------------------------
# quality_classifier_score
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clf_docs(spark, tmp_path_factory):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "spark table scan merge join filter", "en"),
        (2, "", "en"),           # empty → n_tokens 0, score NULL, keep False
        (3, "solo", "en"),       # single token
    ]
    d = tmp_path_factory.mktemp("clf")
    spark.createDataFrame(
        [(i, t, lang, "s0", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), {i: t for i, t, _ in rows}


def test_classifier_matches_python_reference(spark, clf_docs):
    sf_dir, texts = clf_docs
    got = {r["doc_id"]: r for r in quality_classifier_score(spark, sf_dir).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        sq, n, score = _ref_clf_score(text)
        row = got[doc_id]
        assert row["n_tokens"] == n, doc_id
        if n == 0:
            assert row["clf_score"] is None
            assert row["clf_keep"] is False or row["clf_keep"] is None
        else:
            assert row["clf_score"] == pytest.approx(score, abs=1e-9), doc_id
            assert row["clf_keep"] == (sq > 0), doc_id


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ccnet_docs(spark, tmp_path_factory):
    # doc 0: one bigram repeated — the LM memorizes it, lowest perplexity
    # doc 2: 27 distinct singleton tokens — every bigram is unseen-rare AND
    #        several tokens fall outside the top-24 vocab (the <unk> path)
    # doc 3: a single token — no bigram, must be EXCLUDED from the output
    predictable = "ping pong " * 15
    mixed = "ping pong data table ping pong scan merge ping pong"
    rare = " ".join(f"z{i:02d}" for i in range(27))
    rows = [
        (0, predictable.strip(), "en"),
        (1, mixed, "en"),
        (2, rare, "en"),
        (3, "solo", "en"),
    ]
    d = tmp_path_factory.mktemp("ccnet")
    spark.createDataFrame(
        [(i, t, lang, "s0", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_ccnet_buckets_and_exclusions(spark, ccnet_docs):
    got = {r["doc_id"]: r for r in ccnet_perplexity_buckets(spark, ccnet_docs).collect()}
    assert set(got) == {0, 1, 2}, "single-token doc must be excluded"
    # the memorized bigram scores far more probable than singleton bigrams
    assert got[0]["nll_rate"] < got[1]["nll_rate"] < got[2]["nll_rate"]
    # 3 docs in one lang → exactly one per tercile
    assert got[0]["bucket"] == "head"
    assert got[1]["bucket"] == "middle"
    assert got[2]["bucket"] == "tail"
    assert got[0]["n_bigrams"] == 29
    assert got[2]["n_bigrams"] == 26
    # nll_rate is a positive mean negative-log-prob per bigram
    assert all(r["nll_rate"] > 0 for r in got.values())
    # sanity on the fixed-point scale: nll of an always-seen bigram stays
    # well under a rare one's ln((V+1-ish) denominators) magnitude
    assert got[0]["nll_rate"] < 2.0


# ---------------------------------------------------------------------------
# semdedup_prune
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def semdedup_vecs(spark, tmp_path_factory):
    """12 unit-ish vectors, dim 64: seeds 0..7 are scaled one-hots (the
    k-means seed centroids), vec 8 is an exact COPY of vec 0 (cosine 1 →
    must be pruned as a duplicate of 0), vecs 9/10 are one-hots orthogonal
    to everything (kept), vec 11 is all zeros (NULL cosine, kept)."""
    rows = []
    for i in range(8):
        v = [0.0] * 64
        v[i] = 1.0
        rows.append((i, v, 0))
    v8 = [0.0] * 64
    v8[0] = 1.0
    rows.append((8, v8, 0))
    for j, i in enumerate((9, 10)):
        v = [0.0] * 64
        v[20 + j] = 1.0
        rows.append((i, v, 0))
    rows.append((11, [0.0] * 64, 0))
    d = tmp_path_factory.mktemp("semdedup")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_semdedup_prunes_exact_copy_only(spark, semdedup_vecs):
    got = {r["vec_id"]: r for r in semdedup_prune(spark, semdedup_vecs).collect()}
    assert set(got) == set(range(12))
    # the exact copy is pruned, attributed to its earlier-ranked leader
    assert got[8]["pruned"] is True
    assert got[8]["dup_of"] == 0
    assert got[0]["pruned"] is False
    # orthogonal vectors collide in no pair above tau
    for i in (1, 2, 3, 4, 5, 6, 7, 9, 10):
        assert got[i]["pruned"] is False, i
        assert got[i]["dup_of"] is None
    # the zero vector survives with NULL cosine and ranks LAST in its
    # cluster (NULLS LAST on both engines)
    assert got[11]["pruned"] is False
    assert got[11]["centroid_cos"] is None
    same_cluster = [r for r in got.values() if r["cluster"] == got[11]["cluster"]]
    assert got[11]["keep_rank"] == len(same_cluster)
    # ranks are a permutation within every cluster
    by_cluster: dict[int, list[int]] = {}
    for r in got.values():
        by_cluster.setdefault(r["cluster"], []).append(r["keep_rank"])
    for c, ranks in by_cluster.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), c
    assert 0.0 < SEMDEDUP_TAU < 1.0 and CCNET_Q == 1 << 20


# ---------------------------------------------------------------------------
# curation_verdicts / curation_report
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def curate_docs(spark, tmp_path_factory):
    """Crafted corpus exercising every stage: docs 0/1 are exact duplicates
    (doc 1 must lose dedup), doc 2 is too short, doc 3 is pure 3-gram
    repetition, docs 100.. are 40 well-formed docs in one language whose
    token mass (~1600) exceeds nothing — and docs 200.. are 60 docs in a
    second language (~2400 tokens) that MUST hit the 2000-token budget."""
    # 20 tokens with POSITIVE classifier hash-weights (so clf_keep is True
    # regardless of the few-token suffixes), forward + reversed = 40 tokens
    # with no repeated 3-gram (dup3 stays under the cap)
    pos = ("part sort theta epsilon pi row window fast data upsilon "
           "slow kappa iota spark gamma rho tau batch mu table").split()
    base = " ".join(pos + pos[::-1]) + " "
    rows = [
        (0, base + "one two three", "aa"),
        (1, base + "one two three", "aa"),          # exact dup of doc 0
        (2, "tiny doc", "aa"),                       # < 20 tokens
        (3, "spam ham " * 30, "aa"),                 # dup3 ≈ 1
    ]
    for i in range(40):
        rows.append((100 + i, base + f"uniq{i:03d} filler words", "bb"))
    for i in range(60):
        rows.append((200 + i, base + f"other{i:03d} filler words", "cc"))
    d = tmp_path_factory.mktemp("curate")
    spark.createDataFrame(
        [(i, t, lang, "s0", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), rows


def test_curation_stage_semantics(spark, curate_docs):
    from skyline_spark.catalog.curation_queries import (
        CURATE_TOKENS_PER_LANG,
        curation_report,
        curation_verdicts,
    )

    sf_dir, rows = curate_docs
    got = {r["doc_id"]: r for r in curation_verdicts(spark, sf_dir).collect()}
    assert len(got) == len(rows)

    # dedup: keeper is the lower doc_id, the copy loses ONLY dedup
    assert got[0]["dedup_keep"] is True
    assert got[1]["dedup_keep"] is False
    assert got[1]["filter_keep"] == got[0]["filter_keep"]
    assert got[1]["kept"] is False
    # heuristic gates
    assert got[2]["filter_keep"] is False      # short
    assert got[3]["filter_keep"] is False      # repetitive
    assert got[2]["kept"] is False and got[3]["kept"] is False

    # classifier verdict matches the independent hash/weight reference
    texts = {i: t for i, t, _ in rows}
    for doc_id in (0, 100, 200):
        sq, _, _ = _ref_clf_score(texts[doc_id])
        assert got[doc_id]["clf_keep"] == (sq > 0), doc_id

    # budget: survivors of lang cc exceed the quota → the kept set must be
    # exactly the greedy h32('curate:'||id)-ordered prefix fitting 2000
    surv = [
        i for i, _, lang in rows
        if lang == "cc"
        and got[i]["dedup_keep"] and got[i]["filter_keep"] and got[i]["clf_keep"]
    ]
    order = sorted(surv, key=lambda i: (_h32(f"curate:{i}"), i))
    cum, expect_kept = 0, set()
    for i in order:
        cum += got[i]["n_tokens"]
        if cum <= CURATE_TOKENS_PER_LANG:
            expect_kept.add(i)
    actual_kept = {i for i in surv if got[i]["kept"]}
    assert actual_kept == expect_kept
    assert 0 < len(actual_kept) < len(surv), "budget should truncate lang cc"

    # the report is the exact funnel rollup of the verdicts
    rep = {r["lang"]: r for r in curation_report(spark, sf_dir).collect()}
    for lang in ("aa", "bb", "cc"):
        rows_l = [r for r in got.values() if r["lang"] == lang]
        assert rep[lang]["docs_total"] == len(rows_l)
        assert rep[lang]["after_dedup"] == sum(r["dedup_keep"] for r in rows_l)
        assert rep[lang]["kept_docs"] == sum(r["kept"] for r in rows_l)
        assert rep[lang]["kept_tokens"] == sum(
            r["n_tokens"] for r in rows_l if r["kept"]
        )
        assert rep[lang]["kept_tokens"] <= CURATE_TOKENS_PER_LANG


def test_gopher_rules_integer_verdicts(spark):
    """The battery's verdicts are integer cross-multiplications; pin the
    rule semantics on constructed docs: a stopword-free doc fails
    r_stopwords, a one-word-repeated doc fails r_repetition, a too-short
    doc fails r_words, and a clean doc keeps."""
    import pandas as pd

    from skyline_spark.catalog.curation_queries import (
        GOPHER_MIN_WORDS,
        gopher_quality_rules,
    )

    clean = ("the quick brown fox jumps over a lazy dog and runs to the "
             "hills with many fine friends in tow")
    no_stop = "quick brown fox jumps runs hills friends wolves badgers otters weasels stoats"
    repeated = "the spam spam spam spam spam spam spam spam spam spam spam"
    short = "the cat sat"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [clean, no_stop, repeated, short],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(clean), len(no_stop), len(repeated), len(short)],
        }
    )
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="gopher_")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    rows = {r.doc_id: r for r in gopher_quality_rules(spark, tmp).collect()}
    assert rows[0].keep
    assert not rows[1].r_stopwords and not rows[1].keep
    assert not rows[2].r_repetition and not rows[2].keep
    assert rows[3].n_words < GOPHER_MIN_WORDS and not rows[3].r_words


def test_winsorize_mass_accounting(spark):
    """mass_before - mass_after == sum of (n_chars - p99) over clipped docs,
    and nothing at or below p99 is ever clipped."""
    from skyline_spark.catalog.audit_queries import winsorize_doclen

    rows = winsorize_doclen(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected per-lang rows"
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for r in rows:
        clipped_excess = con.execute(
            "SELECT coalesce(sum(n_chars - ?), 0), count(*) FROM documents "
            "WHERE lang = ? AND n_chars > ?",
            [r.p99, r.lang, r.p99],
        ).fetchone()
        assert r.mass_before - r.mass_after == clipped_excess[0]
        assert r.n_clipped == clipped_excess[1]
        # type-1 p99 rank guarantee: at least ceil(0.99 n) docs at or below
        at_or_below = con.execute(
            "SELECT count(*) FROM documents WHERE lang = ? AND n_chars <= ?",
            [r.lang, r.p99],
        ).fetchone()[0]
        assert 100 * at_or_below >= 99 * r.n_docs

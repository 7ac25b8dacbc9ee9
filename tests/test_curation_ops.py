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

"""Semantic invariants for the audit-family operators (audit_queries.py).

Cross-engine parity is already swept by tests/test_catalog.py; these tests
pin the *meaning*: the planted defects surface where (and only where) the
fixture plants them, and the plan-shape/determinism claims hold.
"""

from __future__ import annotations

import pytest

from skyline_spark.catalog import QUERIES

# sf0.01, not the sweep's sf0.001: the planted dup-day length collisions
# and the 'de' vocabulary shift need enough rows to materialize (the same
# reasoning as test_psi_fires_on_planted_length_shift)
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def by_name(spark):
    def run(name):
        return {  # keyed rows for order-free assertions
            tuple(r[: _KEYS[name]]): r.asDict()
            for r in QUERIES[name].build(spark, SF_DIR).collect()
        }

    return run


_KEYS = {
    "column_profile": 2,
    "constraint_suggestion": 2,
    "fd_check": 1,
    "corpus_divergence_js": 1,
    "ngram_dup_rate": 1,
    "crawl_fetch_plan": 2,
}


def test_fd_planted_violation_localized(spark):
    """url->lang must hold; url->text_len must break, and ONLY via the
    planted dup-day urls (every violating key is a dup.example.org url)."""
    rows = {r["fd"]: r for r in QUERIES["fd_check"].build(spark, SF_DIR).collect()}
    assert rows["url->lang"]["holds"] is True
    assert rows["url->lang"]["violating_rows"] == 0
    assert rows["url->text_len"]["holds"] is False
    assert rows["url->text_len"]["violating_keys"] > 0
    # violating keys are exactly the planted shared urls
    from skyline_spark.catalog.flagship_queries import _derived_pages
    from pyspark.sql import functions as F

    pages = _derived_pages(spark, SF_DIR)
    bad = (
        pages.groupBy("url")
        .agg(
            F.countDistinct(F.coalesce(F.length("text"), F.lit(-1))).alias("nd")
        )
        .where(F.col("nd") > 1)
        .select("url")
        .collect()
    )
    assert len(bad) == rows["url->text_len"]["violating_keys"]
    assert all(r.url.startswith("https://dup.example.org/") for r in bad)


def test_js_drift_fires_only_on_shifted_lang(by_name):
    rows = by_name("corpus_divergence_js")
    langs = {k[0] for k in rows}
    assert ("de",) in rows or "de" in langs
    for (lang,), r in rows.items():
        if lang == "de":
            assert r["drifted"] is True
            assert r["js"] > 0.005
            # snapshot B lost tokens (the removed vocabulary item)
            assert r["tokens_b"] < r["tokens_a"]
        else:
            # byte-identical snapshots → JS exactly 0 (ln(1) quantizes to 0)
            assert r["js"] == 0.0
            assert r["drifted"] is False
            assert r["tokens_a"] == r["tokens_b"]


def test_profile_and_suggestions_reflect_planted_defects(by_name):
    prof = by_name("column_profile")
    # planted NULL text (purchase rows + user_id%17) → incomplete text col
    assert prof[("text", "completeness")]["value"] < 1.0
    assert prof[("url", "completeness")]["value"] == 1.0
    # dup-day urls → url distinctness below 1
    assert prof[("url", "distinctness")]["value"] < 1.0
    sugg = by_name("constraint_suggestion")
    assert ("url", "not_null") in sugg
    assert ("text", "completeness_ge") in sugg
    assert ("url", "distinctness_ge") in sugg  # NOT unique — dup day
    # the observed-domain suggestion includes the planted bad value: the
    # engine proposes from data, promotion to a rule is the human step
    assert "error" in sugg[("lang", "is_in")]["params"].split(",")
    # params floor-2dp string matches the r6 support it was derived from
    for (col, kind), r in sugg.items():
        if kind in ("completeness_ge", "distinctness_ge"):
            assert abs(float(r["params"]) - r["support"]) < 0.01 + 1e-9


def test_fetch_plan_slots_capped_and_deterministic(spark):
    df = QUERIES["crawl_fetch_plan"].build(spark, SF_DIR)
    rows = df.collect()
    from skyline_spark.catalog.audit_queries import _FETCH_CAP

    per_host = {}
    for r in rows:
        assert 1 <= r.n_urls <= _FETCH_CAP
        per_host.setdefault(r.host, []).append(r)
    for host, slots in per_host.items():
        nums = sorted(s.slot for s in slots)
        assert nums == list(range(len(nums))), f"slot gap for {host}"
        # only the LAST slot may be under-full
        for s in slots:
            if s.slot != nums[-1]:
                assert s.n_urls == _FETCH_CAP
    # deterministic: a second build yields the identical plan
    again = QUERIES["crawl_fetch_plan"].build(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ngram_dup_rate_consistency(by_name):
    rows = by_name("ngram_dup_rate")
    for _, r in rows.items():
        assert r["distinct_grams"] <= r["total_grams"]
        assert 0 <= r["dup_occurrences"] <= r["total_grams"]
        # the top gram's count must be consistent with the dup mass
        if r["top_gram_count"] > 1:
            assert r["dup_occurrences"] >= r["top_gram_count"]
        assert r["top_gram"].count(" ") == 2  # a genuine trigram


def test_robots_tie_and_longest_match(spark):
    """RFC 9309 semantics pinned: the equal-length allow/disallow pair on
    /p/15 resolves to ALLOW (tie rule), /p/12* re-opens inside the /p/1
    ban (longest match), and /p/1* outside those stays blocked."""
    rows = QUERIES["robots_policy_eval"].build(spark, SF_DIR).collect()
    by_rule = {}
    for r in rows:
        by_rule.setdefault(r.matched_rule, set()).add(r.verdict)
    # the tie pair and the longer override are allow-only everywhere
    assert by_rule.get("/p/15") == {"allowed"}
    assert by_rule.get("/p/12") == {"allowed"}
    # the broad ban actually blocks (it is the winning rule somewhere)
    assert "blocked" in by_rule.get("/p/1", set())
    # no-match urls default to allowed with an empty rule
    assert by_rule.get("") == {"allowed"}


def test_anchor_text_consistency(spark):
    from skyline_spark.catalog.graph_queries import OUT_DEG

    rows = QUERIES["anchor_text_topk"].build(spark, SF_DIR).collect()
    import duckdb

    n_docs, total_edges = duckdb.sql(
        f"SELECT count(*), count(*)*{OUT_DEG} FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    # conservation: every edge lands on exactly one target
    assert sum(r.n_inlinks for r in rows) == total_edges
    for r in rows:
        assert 1 <= r.distinct_anchors <= r.n_inlinks
        assert r.top_anchor_count >= 1
        assert 0 <= r.doc_id < n_docs


def test_confusion_matrix_rows_sum_to_one(spark):
    rows = QUERIES["lang_confusion_matrix"].build(spark, SF_DIR).collect()
    per_label = {}
    for r in rows:
        per_label.setdefault(r.lang, []).append(r)
    for lang, cells in per_label.items():
        assert abs(sum(c.rate for c in cells) - 1.0) < 1e-5
        assert {c.predicted for c in cells} <= {"en", "other"}


def test_source_scorecard_consistency(spark):
    import duckdb

    rows = QUERIES["source_scorecard"].build(spark, SF_DIR).collect()
    n_docs, n_sources = duckdb.sql(
        f"SELECT count(*), count(DISTINCT source) "
        f"FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()
    assert len(rows) == n_sources
    assert sum(r.docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.kept_docs <= r.docs
        assert 0 <= r.kept_tokens <= r.tokens
        assert 0.0 <= r.mean_quality <= 1.0
        assert abs(r.kept_rate - r.kept_docs / r.docs) < 1e-6
    # the gates must actually discriminate at this scale: some docs kept,
    # some dropped, across the corpus
    assert 0 < sum(r.kept_docs for r in rows) < n_docs


def test_expectations_ledger_sequential_semantics(spark):
    rows = {r.expectation: r for r in
            QUERIES["expectations_enforce"].build(spark, SF_DIR).collect()}
    # every planted defect fires its expectation
    assert rows["text_not_null"].flagged > 0
    assert rows["lang_in_allowlist"].flagged > 0        # planted 'error' lang
    assert rows["len_within_bound"].flagged > 0         # planted x3 length day
    assert rows["url_unique"].flagged > 0               # planted dup-day urls
    # warn counts but never drops
    assert rows["len_within_bound"].dropped == 0
    assert rows["len_within_bound"].action == "warn"
    # the ledger is a consistent running account
    assert rows["text_not_null"].rows_after == (
        rows["lang_in_allowlist"].rows_after + rows["lang_in_allowlist"].dropped
    )
    assert rows["len_within_bound"].rows_after == rows["lang_in_allowlist"].rows_after
    assert rows["url_unique"].rows_after == (
        rows["len_within_bound"].rows_after - rows["url_unique"].dropped
    )
    # sequential uniqueness: survivor-dedup can never drop more rows than
    # (survivors - distinct surviving urls)
    from skyline_spark.catalog.flagship_queries import _derived_pages
    from pyspark.sql import functions as F

    pages = _derived_pages(spark, SF_DIR)
    allowed = ["click", "view", "purchase", "signup"]
    surv = pages.where(F.col("text").isNotNull() & F.col("lang").isin(*allowed))
    n_surv, n_urls = surv.agg(
        F.count("*"), F.countDistinct("url")
    ).first()
    assert rows["url_unique"].dropped == n_surv - n_urls

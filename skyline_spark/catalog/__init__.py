"""Query catalog: every public operator as a (Spark builder, DuckDB oracle) pair.

The driver contract (``__spark_entry__.py``) needs, per operator, a callable
``(spark, sf_dir) -> DataFrame`` and an equivalent ANSI-SQL string DuckDB can
run over the same parquet tables. Registering both together — generated from
the same constants — keeps them in lockstep.
"""

from .registry import QUERIES, QuerySpec, query  # noqa: F401

# importing the modules populates the registry
from . import text_queries  # noqa: F401,E402
from . import series_queries  # noqa: F401,E402
from . import relational_queries  # noqa: F401,E402
from . import pipeline_queries  # noqa: F401,E402
from . import skew_queries  # noqa: F401,E402
from . import extras_queries  # noqa: F401,E402
from . import mixing_queries  # noqa: F401,E402
from . import flagship_queries  # noqa: F401,E402
from . import curation_queries  # noqa: F401,E402
from . import selection_queries  # noqa: F401,E402
from . import graph_queries  # noqa: F401,E402
from . import crawl_queries  # noqa: F401,E402
from . import sketch_queries  # noqa: F401,E402
from . import audit_queries  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Curated registration order.
#
# The driver's per-round correctness gate records the FIRST 50 queries()
# entries (dict order); everything past that line keeps only the in-repo
# pytest parity (tests/test_catalog.py sweeps ALL queries) plus the committed
# full-sweep snapshot (tools/check_parity.py → PARITY_r{N}.json). Round 2
# lost driver rows for the flagship consensus and 11 other queries purely to
# accidental import order, so the window is now explicit: flagships and
# queries WITHOUT a green row in the previous round's CORRECTNESS file come
# first; queries already evidenced green in round 2 rotate past the line.
# tests/test_catalog.py::test_driver_window_membership pins this list.
# ---------------------------------------------------------------------------

#: the driver records correctness rows for exactly this many queries()
#: entries (dict order), rows-only entries included — evidenced by
#: CORRECTNESS_r01.json (43 entries → all recorded, incl. no_oracle rows)
#: vs CORRECTNESS_r02.json (68 registered → first 50 recorded)
DRIVER_WINDOW = 50

# Round-4 rotation: the 46 round-3 rows are banked (CORRECTNESS_r03.json),
# so every slot they held is free. The window now gives FIRST-EVER driver
# rows to the 23 oracled queries whose only evidence so far is the repo-run
# parity snapshot (the round-3 audit/sketch/crawl/graph additions), keeps
# the three flagship consensus twins in-window (their ensembles change this
# round: 7-of-9 -> 9-of-9 oracled detectors), holds slots for the four
# formerly rows-only entries being oracled this round
# (replay_full_ensemble, extracted_text_parity, multimodal x2), and fills
# the remainder with refresh slots for queries whose last driver row is the
# two-round-old CORRECTNESS_r02 — each refresh slot is displaced, oldest
# evidence first (bottom of the list upward), as round-4-new queries land.

PRIORITY_WINDOW: list[str] = [
    # flagship consensus twins — ensembles extended to 9-of-9 this round,
    # so their r3 rows no longer cover current code
    "validate_pages_relational",
    "drift_ensemble_daily_relational",
    "drift_ensemble_relational",
    # formerly rows-only, oracled this round (VERDICT r3 asks #4/#5/#6);
    # the replay evidence now rides the 8-detector oracled twin — the full
    # 9-kernel replay_full_ensemble stays rows-only and rotates out
    "replay_ensemble_relational",
    "extracted_text_parity",
    "multimodal_media_features",
    "multimodal_resize_frames",
    # the 23 oracled-but-never-driver-checked round-3 additions
    "dedup_winnowing",
    "dedup_incremental_minhash",
    "ann_ivf_recall",
    "fk_orphan_check",
    "drift_psi",
    "completeness_grid",
    "link_graph_hits",
    "anchor_text_topk",
    "bpe_train_merges",
    "bpe_tokenize_fertility",
    "robots_policy_eval",
    "heavy_hitters_cms",
    "tdigest_quantiles",
    "theta_sketch_urls",
    "column_profile",
    "constraint_suggestion",
    "fd_check",
    "corpus_divergence_js",
    "ngram_dup_rate",
    "crawl_fetch_plan",
    "lang_confusion_matrix",
    "source_scorecard",
    "expectations_enforce",
    # refresh slots: last driver row is CORRECTNESS_r02 (two rounds old);
    # displaced bottom-up by round-4-new queries
    "series_gates",
    "luminosity_correlation",
    "ionosphere_layers",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "boundary_alert_threshold",
    "boundary_static_thresholds",
    "boundary_drop_off_cliff",
    "dedup_exact",
    "dedup_simhash",
    "dedup_embedding_lsh",
    # round-5 new: flood-guard observability (the three banded dedup paths
    # above changed semantics this round — exact-dup pre-collapse + band
    # caps — so they hold these refresh slots AND the guard needs its
    # first-ever row)
    "dedup_band_guard",
    # round-5 new: the Ionosphere profile-training write path's oracled twin
    "ionosphere_train_profile",
    # round-5 new: the persisted per-run metrics row in long form
    "validate_run_metrics",
    # round-5 new: the Luminosity driver's correlation store / related-
    # metrics grouping
    "luminosity_related_metrics",
    # round-5 new: the skew-immune two-phase exact-quantile shape (VERDICT
    # r4 ask #5), probe-backed by SCALE_PROBE_r05.json's 'skew' section
    "salted_host_quantiles",
    # round-4-new queries displace eight refresh slots (bottom-up:
    # alert_dedup, luminosity_shift_correlation, text_token_count,
    # text_lang_id, text_quality, ann_lsh_topk, then — when the NFC and
    # char-coverage audits landed — events_daily_stats and text_pii_scrub
    # from the list's then-bottom; all eight hold r2 driver rows): the
    # sample-fed ks gate + lag-0 ADF tau (the two ks_test sub-gates the
    # 9-of-9 twins cannot exercise), the Gopher rule battery, CCNet
    # boilerplate line dedup, the HLL cardinality audit, the winsorize
    # outlier audit, Unicode NFC normalization and tokenizer character
    # coverage
    "detector_ks_gate",
    "detector_adf_tau",
    "gopher_quality_rules",
    "boilerplate_line_dedup",
]
assert len(PRIORITY_WINDOW) == DRIVER_WINDOW, (
    f"curated driver window must be exactly {DRIVER_WINDOW} entries, "
    f"got {len(PRIORITY_WINDOW)}"
)

# --- past the 50-row line from here: every one of these carries a green
# driver row in a committed CORRECTNESS_r{N}.json (r2 or r3) or, for the
# rows-only forms, their oracled twins sit in-window; all stay covered by
# the in-repo sweep each round (tests/test_catalog.py pins the rotation
# invariant) ---
PRIORITY_ROTATED: list[str] = [
    # r4-green, displaced by round-5's new queries (dedup_band_guard,
    # ionosphere_train_profile, validate_run_metrics, salted_host_quantiles)
    "hll_daily_users",
    "shard_rendezvous_stability",
    "bpe_char_coverage",
    "text_normalize_nfc",
    "winsorize_doclen",
    "replay_full_ensemble",
    "boundary_autoaggregate",
    "events_daily_stats",
    "text_pii_scrub",
    "alert_dedup",
    "luminosity_shift_correlation",
    "text_token_count",
    "text_lang_id",
    "text_quality",
    "ann_lsh_topk",
    # r3-green flagship satellites + detectors + series/relational family
    "validate_pages_full",
    "drift_ensemble_daily",
    "checkpoint_digest_quantiles",
    "detector_stddev_from_average",
    "detector_median_absolute_deviation",
    "detector_mean_subtraction_cumulation",
    "detector_first_hour_average",
    "detector_least_squares",
    "detector_histogram_bins",
    "detector_grubbs_score",
    "detector_ks_2samp_d",
    "detector_stddev_from_moving_average",
    "asof_join_attribution",
    "range_join_incidents",
    "sessionize_events",
    "ionosphere_profile_match",
    "ionosphere_tsfresh_match",
    "mirage_second_pass",
    "tsfresh_features",
    "roomba_vacuum",
    "util_namespace_functions",
    "second_order_anomalies",
    "events_props_extract",
    "salted_group_count",
    "tpch_q1_pricing_summary",
    "join_orders_by_nation",
    "window_top_orders_per_nation",
    "domain_cap_sample",
    "mixture_token_budget",
    "dedup_exact_substrings",
    "url_canonical_dedup",
    "mixture_temperature_sample",
    "quality_classifier_score",
    "ccnet_perplexity_buckets",
    "semdedup_prune",
    "curation_verdicts",
    "curation_report",
    "dsir_select",
    "pack_context_windows",
    "bloom_novelty",
    "mixture_epoch_plan",
    "link_graph_pagerank",
    "bpe_merge_candidates",
    "crawl_snapshot_delta",
    "url_host_blocklist",
    # r2-green, unchanged since their rows
    "filter_pipeline",
    "decontaminate_ngrams",
    "ann_ivf_topk",
    "kmeans_lloyd",
    "text_tfidf_topk",
    "dedup_passages",
    "text_repetition",
    "text_fingerprint",
    "text_char_diversity",
    "sample_stratified",
    "corpus_shuffle_shards",
    "replay_stddev_from_average",
    "transform_non_negative_derivative",
    "series_tail_avg",
    "ann_cosine_topk",
    "docs_nchars_check",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_lsh_recall",
    # pytest-only kernel twin (rows-only by design)
    "tsfresh_features_kernel",
]

PRIORITY: list[str] = PRIORITY_WINDOW + PRIORITY_ROTATED


def _apply_priority() -> None:
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY names unknown queries: {missing}")
    unlisted = [n for n in QUERIES if n not in PRIORITY]
    ordered = {n: QUERIES[n] for n in PRIORITY}
    ordered.update({n: QUERIES[n] for n in unlisted})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority()

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

# The second round-3 session's additions (the audit family, robots/anchor/
# confusion, source_scorecard, expectations_enforce,
# dedup_incremental_minhash) land PAST the window deliberately: every
# in-window slot is held by an entry that still needs a FRESH driver row —
# the flagships, the round-2 orphans, the round-3 adds with no row at all,
# and the 9 detectors, whose r2 rows no longer cover current code (their
# catalog builders changed in the d510425..HEAD round-3 diff). With no
# strictly-better swap available, the new queries carry the committed
# full-sweep snapshot (PARITY_r03.json, same sf/same comparison as the
# driver gate) as their evidence tier — the fallback the rotation-invariant
# test below codifies.

PRIORITY_WINDOW: list[str] = [
    # flagship consensus + pipeline (incl. their rows-only full-kernel forms)
    "validate_pages_relational",
    "drift_ensemble_daily_relational",
    "drift_ensemble_relational",
    "validate_pages_full",
    "drift_ensemble_daily",
    "extracted_text_parity",
    "replay_full_ensemble",
    "checkpoint_digest_quantiles",
    # the 9 reference detectors + gates (core SURVEY §2.1/§2.2)
    "detector_stddev_from_average",
    "detector_median_absolute_deviation",
    "detector_mean_subtraction_cumulation",
    "detector_first_hour_average",
    "detector_least_squares",
    "detector_histogram_bins",
    "detector_grubbs_score",
    "detector_ks_2samp_d",
    "detector_stddev_from_moving_average",
    # boundary / luminosity / ionosphere / mirage (§2.5–2.9) + the round-3
    # time-series joins (as-of, range — no committed driver row yet)
    "asof_join_attribution",
    "range_join_incidents",
    "sessionize_events",
    "ionosphere_profile_match",
    "ionosphere_tsfresh_match",
    # mirage_second_pass gained a degenerate-input guard this round
    # (06ad64e), so its r2 row no longer covers the current code — it stays
    # inside the window for a fresh row
    "mirage_second_pass",
    # round-2 orphans (oracled, green in pytest + r1, no r2 row)
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
    # headline LLM-pipeline operators (dedup/ANN/text); round-3 additions
    # (no committed green row yet) displace r2-green ops — boundary_
    # autoaggregate, events_daily_stats, text_pii_scrub rotate out (all
    # hash-green in CORRECTNESS_r02) to make room for the curation trio
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
    # round-3-new, no committed driver row yet: link-graph PageRank and the
    # upsampling-epoch planner displace dedup_clusters and dedup_minhash_lsh
    # (both hash-green in CORRECTNESS_r02; minhash additionally carries the
    # round-3 scaling-bench evidence in scaling_results.json)
    "mixture_epoch_plan",
    "link_graph_pagerank",
    # round-3-new crawl-management trio (no committed driver row yet):
    # displaces series_gates, luminosity_correlation, ionosphere_layers —
    # all three hash-green in CORRECTNESS_r02 with implementations
    # untouched since that row was recorded (verified against the
    # round-boundary diff d510425..HEAD)
    "bpe_merge_candidates",
    "crawl_snapshot_delta",
    "url_host_blocklist",
]
assert len(PRIORITY_WINDOW) == DRIVER_WINDOW, (
    f"curated driver window must be exactly {DRIVER_WINDOW} entries, "
    f"got {len(PRIORITY_WINDOW)}"
)

# --- past the 50-row line from here: every one of these has a green row in
# CORRECTNESS_r02.json (driver, sf0.01) and stays covered by the in-repo
# sweep each round (tests/test_catalog.py pins that rotation invariant) ---
PRIORITY_ROTATED: list[str] = [
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
    "boundary_autoaggregate",
    "events_daily_stats",
    "text_pii_scrub",
    "alert_dedup",
    "luminosity_shift_correlation",
    "text_token_count",
    "text_lang_id",
    "text_quality",
    "ann_lsh_topk",
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
    "multimodal_media_features",
    "multimodal_resize_frames",
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

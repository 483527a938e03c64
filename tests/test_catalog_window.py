"""Guard the driver's correctness window (rounds 1-2 regression).

The correctness harness only checks the first ``DRIVER_CHECK_CAP``
entries of ``QUERIES`` in insertion order. Round 2 accidentally evicted
``events_sessionize`` by inserting a new query mid-dict; these
assertions make that class of mistake a test failure instead of a
silent coverage loss.
"""

from __future__ import annotations

from forest_open_data_pipelines_spark.plans.catalog import (
    DRIVER_CHECK_CAP,
    PARKED_FROM,
    QUERIES,
)

# Entries that need a driver row THIS round and must stay inside the
# window: the four r4-parked entries getting their FIRST driver rows
# (judge r4 item 1) plus every round-5 operator (also first rows).
MUST_BE_IN_WINDOW = {
    # first driver rows ever (added parked in r4)
    "sanitize_slide_text",
    "anp_resource_urls",
    "monthly_by_region_augmented",
    "ann_topk_ivf_trained",
    # round-5 operators (first driver rows)
    "dedup_simhash64",
    "payload_merge_dedupe",
    "payload_merge_dedupe_by_region",
    "monthly_chart_spec_scoped",
    "anp_panel_payloads",
    "annual_reference_extract",
    "mensal_links",
    "govbr_freshness_labels",
    "dedup_ngram_ppjoin",
    "dedup_clusters",
    "quality_repetition",
    "pack_sequences",
    "ckan_resource_select",
    "supranational_items",
    "payload_merge_dedupe_scoped",
    "customer_order_distribution",
    "order_priority_semijoin",
    "mma_manifest_items",
    "coids_entry_periods",
    "disjunctive_promo_revenue",
    "returned_item_ranking",
    "dedup_canonical_corpus",
    "bpe_merge_candidates",
    "join_key_skew_report",
    "event_funnel",
    "lang_id_ngram",
    "embedding_label_stats",
    "dedup_method_eval",
    "user_retention_cohorts",
    "session_duration_stats",
    "corpus_curation",
    "govbr_resource_classify",
    "cvm_latest_zips",
}


def test_checked_window_fits_cap():
    names = list(QUERIES)
    parked_start = names.index(PARKED_FROM)
    assert parked_start <= DRIVER_CHECK_CAP, (
        f"{parked_start} entries precede the parked section but the driver "
        f"only checks {DRIVER_CHECK_CAP}; move "
        f"{names[DRIVER_CHECK_CAP:parked_start]} into the parked tail"
    )


def test_priority_entries_inside_window():
    window = set(list(QUERIES)[:DRIVER_CHECK_CAP])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"evicted from driver window: {sorted(missing)}"

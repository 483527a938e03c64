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
# window: the round-6 additions (first rows), every round-5 entry that
# had NEVER had a driver row (judge r5 item 1 — the third-tranche
# operators parked behind the pinned r5 window), and the holdovers
# whose round-6 code changes need fresh driver-scale evidence.
MUST_BE_IN_WINDOW = {
    # round-6 additions (first driver rows)
    "focos_llm_payload",
    "boletins_integrados_links",
    "cvm_latest_yearly_csvs",
    "fenced_json_extract",
    "eia_xls_picks",
    "eia_series_combinations",
    "embedding_quantize_sq8",
    "ann_topk_sq8",
    "bpe_train",
    "charlm_perplexity",
    # never-driver-checked round-5 entries (first rows)
    "pii_scrub",
    "decontaminate_ngram",
    "chunk_dedup",
    "dataset_mixture_plan",
    "stratified_sample",
    "stratified_token_sample",
    "span_dedup",
    "dedup_incremental",
    "dedup_canonical_by_quality",
    "token_histogram",
    "numeric_correlations",
    "edit_distance_pairs",
    "edit_distance_topk",
    "curation_report_by_source",
    "quality_by_lang_report",
    "cheapest_supplier_per_part",
    "part_revenue_concentration",
    "large_orders",
    "idle_balance_customers",
    "revenue_change_forecast",
    "top_supplier_by_revenue",
    # round-6 code-path changes
    "corpus_curation",
    "dedup_simhash64",
    "dedup_method_eval",
    "dedup_clusters",
    # dedup_canonical_corpus parked in the third session for
    # ann_method_eval: its r5 driver row stands and the hardened
    # closure it depends on keeps in-window coverage via dedup_clusters
    # third-session additions (first driver rows)
    "dedup_semantic",
    "boilerplate_ngrams",
    "stratified_topk_sample",
    "inmet_yearly_zips",
    "ann_method_eval",
    "dedup_containment",
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

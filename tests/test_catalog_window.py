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
# window: everything that has NEVER had a green driver row — the 11
# round-7-extension additions and the two round-8 reference-gap
# closers. The 37 refresh slots (oldest r3/r4 evidence) are
# discretionary and not pinned here.
MUST_BE_IN_WINDOW = {
    # round-7-extension additions (first rows)
    "monthly_seasonal_index",
    "supplier_concentration_hhi",
    "part_affinity_pairs",
    "daily_anomaly_report",
    "sampled_revenue_estimate",
    "event_transitions",
    "dedup_winnowing",
    "winnowing_incremental",
    "duplicate_spans",
    "strip_duplicate_spans",
    "media_integrity_audit",
    # round-8 reference-gap closers + tuning/planning additions
    # (first rows)
    "anp_prompt_texts",
    "eia_petroleum_weekly_files",
    "corpus_shard_plan",
    "quality_threshold_sweep",
    "report_fallback_blocks",
    # round-8 extension additions (first rows)
    "token_zipf_fit",
    "tokenizer_fertility",
    "cluster_size_histogram",
    "embedding_drift_report",
    "bm25_topk",
    "bm25_route",
    "hard_negative_mining",
    "hybrid_rrf_topk",
    "dataset_card",
    "bitext_mining",
    "shard_curriculum",
    # newly oracle-paired (rows-only until round 8) — first value rows
    "multimodal_features",
    "multimodal_frames",
    "resize_media",
    "embedding_outlier_report",
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

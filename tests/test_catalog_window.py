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
# window: everything that has NEVER had a green driver row — the three
# round-6 compare failures (fixed this round), the six late round-6
# additions that landed after the r6 driver run, and the eight round-7
# additions. The 33 refresh slots (oldest r2/r3/r4 evidence) are
# discretionary and not pinned here.
MUST_BE_IN_WINDOW = {
    # round-6 compare failures, fixed this round
    "embedding_quantize_sq8",
    "embedding_quantize_pq",
    "token_histogram",
    # late round-6 additions (first rows)
    "q8_market_share",
    "q17_small_quantity_revenue",
    "perplexity_buckets",
    "lang_id_confusion",
    "focos_prompt_texts",
    "referential_integrity_audit",
    # round-7 additions (first rows)
    "q9_product_type_profit",
    "q12_shipping_delay",
    "q16_supplier_part_variety",
    "q20_dominant_suppliers",
    "q21_sole_latest_shipper",
    "freshness_watch_signals",
    "manifest_meta_envelope",
    "route_nearest_query",
    # round-7 second tranche (first rows)
    "ngram_novelty",
    "vocab_growth",
    "multimodal_dedup",
    "cvm_fund_picks",
    "focos1km_tifs",
    "audit_markdown_table",
    "freshness_report_lines",
    "dedup_threshold_sweep",
    "column_best_match",
    "corpus_snapshot_diff",
    "simhash_budget_sweep",
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

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
# window: everything whose current catalog plan has NEVER had a green
# driver row. The 40 refresh slots (oldest r4/r5/r6 evidence) are
# discretionary and not pinned here.
MUST_BE_IN_WINDOW = {
    # late round-11 additions awaiting their first driver row (judge
    # verified sf0.01 + sf0.1 in the r11 session; spacesaving_hitters
    # and distinct_rollup_sketch rows-only by design)
    "spacesaving_hitters",
    "session_concurrency",
    "part_skyline",
    "cusum_change_points",
    "distinct_rollup_sketch",
    "overlapping_session_pairs",
    "cuped_ab_metrics",
    "survival_churn_curve",
    "part_bfs_hops",
    # entries whose catalog plan/oracle changed in round 12 — their
    # r11 driver rows no longer witness current code
    "curation_gate_matrix",
    "bpe_encode",
    # round-12 additions awaiting their first driver row
    "quantile_rollup_sketch",
    "retrieval_rank_eval",
    "priority_sample",
    "kmv_distinct_rollup",
    "entity_resolution",
    "entity_resolution_eval",
    "entity_clusters",
    "er_incremental_classify",
    "kn_bigram_perplexity",
    "conformal_forecast_intervals",
    "markov_next_event_eval",
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

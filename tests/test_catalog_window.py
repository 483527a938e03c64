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
    # round-11 additions awaiting their first driver row
    # (all oracle MATCH at sf0.001/0.01/0.1 in the builder session;
    # unigram_lm_step rows-only by design)
    "media_decode_report",
    "gopher_repetition_rules",
    "unigram_lm_step",
    "unigram_encode",
    "part_triangles",
    # entries whose catalog plan/schema changed in round 11 — their
    # r10 driver rows no longer witness current code
    "c4_line_filters",
    "effective_overview_metrics",
    "curation_gate_matrix",
    "dataset_card",
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

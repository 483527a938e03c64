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

# Entries that were never driver-checked in rounds 1-2 and must stay
# inside the window until they have green rows on record.
MUST_BE_IN_WINDOW = {
    "events_sessionize",
    "events_windowed",
    "events_asof_attribution",
    "clicks_before_purchase",
    "skew_two_phase_agg",
    "skew_salted_join_agg",
    "multimodal_features",
    "multimodal_frames",
    "resize_media",
    # round-3 additions that need their first driver row
    "html_list_parse",
    "dir_listing_files",
    "feed_validate",
    "manifest_status",
    "catalog_cards",
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

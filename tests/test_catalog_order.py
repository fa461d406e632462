"""Catalog emission order: the external driver verifies only a bounded
prefix (DRIVER_WINDOW entries), so the catalog must put not-yet-verified
and changed-this-round queries inside that window."""

from __future__ import annotations

from os_ex_3_map_reduce_spark.plans.catalog import (
    DRIVER_PRIORITY,
    DRIVER_WINDOW,
    all_oracles,
    all_queries,
)

# Queries with no external verdict yet, or whose behavior changed this
# round — MUST be inside the verification window (round 6: the 12
# never-verified names, the two round-5 ERRs fixed by the dtype-adaptive
# event time, and the event-touching queries whose last green verdict
# predates the fixture's dtype change).
MUST_BE_IN_WINDOW = {
    # never driver-verified (as of CORRECTNESS_r05)
    "q_mapreduce_key_equiv",
    "q_stream_cdc_apply",
    "q_pack_chunks",
    "q_sample_stratified",
    "q_join_bucketed",
    "q_python_datasource",
    "q_variant_json",
    "q_observe_metrics",
    "q_merge_upsert",
    "q_null_handling",
    "q_percentiles_grouped",
    "q_histogram",
    # round-5 ERRs fixed this round
    "q_stream_outer_join",
    "q_stream_foreach_sink",
    # event-touching queries un-broken by the round-6 ts fix
    "q_events_hourly",
    "q_json_extract",
    "q_join_asof",
    "q_join_range",
    "q_lateral",
    "q_rollup_time",
    "q_salted_agg",
    "q_time_gapfill",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_join",
    "q_stream_dedup",
    "q_stream_stateful",
    "q_stream_static_join",
    # new in round 6
    "q_multimodal_resize",
    "q_binaryfile_ingest",
    "q_dedup_keep_best",
}


def test_priority_prefix_fills_window_exactly():
    assert len(DRIVER_PRIORITY) == DRIVER_WINDOW
    assert len(set(DRIVER_PRIORITY)) == DRIVER_WINDOW


def test_window_contains_required_queries():
    window = list(all_queries())[:DRIVER_WINDOW]
    assert set(window) == set(DRIVER_PRIORITY)
    missing = MUST_BE_IN_WINDOW - set(window)
    assert not missing, f"required queries outside driver window: {missing}"


def test_ordering_preserves_full_surface():
    qs = all_queries()
    os_ = all_oracles()
    # nothing lost or duplicated by the reordering
    assert len(qs) >= 87
    assert set(os_) <= set(qs)
    # oracles keep pairing with their queries regardless of order
    assert all(isinstance(sql, str) and sql.strip() for sql in os_.values())

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
# round — MUST be inside the verification window (round 7: the 18
# round-2-stale names from VERDICT r6 "What's missing" #1, the three
# sketch queries whose oracles were upgraded from rows-only to pinned
# expectations this round, and the reworked simhash).
MUST_BE_IN_WINDOW = {
    # last green in round 2 — four rounds stale
    "q_above_nation_avg",
    "q_agg_filtered",
    "q_array_fns",
    "q_case_when",
    "q_date_parts",
    "q_date_trunc",
    "q_join_cross",
    "q_join_nullsafe",
    "q_map_fns",
    "q_math_fns",
    "q_percentiles",
    "q_regexp_fns",
    "q_set_ops_all",
    "q_shipping_priority",
    "q_string_fns",
    "q_unpivot",
    "q_window_misc",
    "q_window_range_frame",
    # oracle upgraded this round (rows-only -> pinned expectation)
    "q_approx_distinct",
    "q_approx_percentiles",
    "q_sketch_heavyhitters",
    # implementation reworked this round
    "q_simhash_neardup",
    # new in round 7
    "q_bloom_semijoin",
    "q_sessionize",
    "q_profile_stats",
    "q_pii_redact",
    "q_zorder_cluster",
    "q_incremental_agg",
    "q_setsim_prefix",
    "q_kmeans_assign",
    "q_pagerank",
    "q_time_interpolate",
    "q_sample_weighted",
    "q_histogram_equidepth",
    "q_cohort_retention",
    "q_outlier_zscore",
    "q_funnel",
    "q_drift_ks",
    "q_chi2_terms",
    "q_trend_ols",
    "q_event_transitions",
    "q_mad_robust",
    "q_gini",
    "q_multimodal_audio_frames",
    "q_data_contract",
    "q_sample_budget",
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

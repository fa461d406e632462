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

# Queries with no external verdict yet, or changed this round — MUST be
# inside the verification window (round 3).
MUST_BE_IN_WINDOW = {
    # never driver-verified
    "q_salted_join",
    "q_sample_hash",
    "q_contamination",
    "q_repetition",
    "q_normalize_text",
    "q_ann_lsh_recall",
    "q_recursive_cte",
    "q_stream_outer_join",
    "q_stream_foreach_sink",
    "q_stream_python_source",
    "q_stream_partitioned_source",
    "q_job_control",
    "q_multimodal_bmp",
    "q_multimodal_wav",
    # changed this round
    "q_hof_fns",
    "q_fingerprint_rolling",
    "q_embedding_topk_pairs",
    "q_embedding_neardup",
    "q_ann_lsh_topk",
    "q_ann_ivf_topk",
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

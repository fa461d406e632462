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

# Families that had no external verdict in round 1 and MUST be inside the
# verification window this round.
MUST_BE_IN_WINDOW = {
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_join",
    "q_stream_static_join",
    "q_stream_stateful",
    "q_stream_dedup",
    "q_join_asof",
    "q_join_range",
    "q_lateral",
    "q_time_gapfill",
    "q_unpivot",
    "q_window_range_frame",
    "q_sketch_heavyhitters",
    # changed this round
    "q_fingerprint_rolling",
    "q_multimodal_fake_image",
    "q_multimodal_frames",
    "q_simhash_neardup",
    "q_embedding_topk_pairs",
    "q_embedding_neardup",
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

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

# Queries that MUST be inside the verification window this round
# (round 11: CORRECTNESS_r10 never ran, so every name that was
# unverified or changed going into round 10 is STILL unverified —
# all 34 never-verified names plus the 7 kernel-changed ones must
# hold window slots; the r7-stale rotation fill is policy, not a
# hard requirement, so it is not pinned here).
MUST_BE_IN_WINDOW = {
    # never driver-verified (late-r9 registrations)
    "q_similarity_topk_batch",
    "q_ann_lsh_batch",
    "q_ann_pq_topk",
    "q_ann_pq_recall",
    "q_sssp_weighted",
    "q_labelprop",
    "q_triangles",
    "q_stream_full_outer_join",
    # never driver-verified (round-10 main session)
    "q_ann_ivf_append",
    "q_cc_starcontract",
    "q_ann_ivfpq_topk",
    "q_dedup_ingest",
    "q_stream_dedup_ingest",
    # never driver-verified (round-10 late + continuation sessions)
    "q_ann_ivfpq_residual",
    "q_shard_shuffle",
    "q_upsample_quality",
    "q_kcore",
    "q_ann_ivfpq_append",
    "q_corenumbers",
    "q_range_search_batch",
    "q_ann_ivf_range",
    "q_kmeans_lloyd",
    "q_linkpred",
    "q_stream_right_outer_join",
    "q_bpe_merges",
    "q_gram_matrix",
    "q_pca_topk",
    "q_ann_sq_topk",
    "q_ppr",
    "q_semdedup",
    "q_substring_dupes",
    "q_scd2_history",
    "q_lm_perplexity",
    "q_bpe_encode",
    # rounding / null-guard kernel changes in round 10, last green
    # verdict predates the change
    "q_similarity_topk",
    "q_embedding_topk_pairs",
    "q_embedding_neardup",
    "q_ann_lsh_topk",
    "q_ann_lsh_recall",
    "q_ann_ivf_topk",
    "q_ann_ivf_batch",
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


def test_generated_docs_in_sync_with_registry():
    """ADVICE r9 / VERDICT r9 #5: CATALOG.md and README.md once said
    149 while 150 were registered (a late registration skipped the
    regen). Pin both docs' counts to len(all_queries()) so the drift
    class cannot recur — regenerate with tools/gen_catalog.py and fix
    README by hand when this fails."""
    import pathlib
    import re

    n = len(all_queries())
    root = pathlib.Path(__file__).resolve().parent.parent
    catalog_md = (root / "CATALOG.md").read_text()
    m = re.match(r"# CATALOG\.md.*?\n\n(\d+) queries, (\d+) with", catalog_md, re.S)
    assert m, "CATALOG.md header format changed — update this test"
    assert int(m.group(1)) == n, (
        f"CATALOG.md says {m.group(1)} queries, registry has {n}: "
        "re-run python tools/gen_catalog.py > CATALOG.md"
    )
    assert catalog_md.count("| `q_") == n
    readme = (root / "README.md").read_text()
    for phrase in (f"all {n} queries", f"{n} queries total"):
        assert phrase in readme, f"README.md stale: expected {phrase!r}"


def test_r12_queue_names_registered_and_below_window():
    """Late-round registrations parked below the verification window
    (the r9 precedent) must exist in the registry and must NOT occupy
    window slots — they are queued for fronting next rotation."""
    from os_ex_3_map_reduce_spark.plans.catalog import DRIVER_R12_QUEUE

    qs = set(all_queries())
    for name in DRIVER_R12_QUEUE:
        assert name in qs, name
        assert name not in DRIVER_PRIORITY, name

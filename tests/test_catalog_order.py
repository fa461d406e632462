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
# (round 11: CORRECTNESS_r10 came back 50/50 green, so the old window
# rotates out wholesale. The only hard pins are the five names whose
# implementation CHANGES this round — bloom n_probe false-negative
# fix, Theil-Sen prefix-sum median, BM25-ingest evidence trim +
# manifest-atomic merge, and the catalog-txn FK read-back cap. The
# other 45 slots are never-verified backlog fill in tools/rotation.py
# order — policy, not a hard requirement, so not pinned here.)
MUST_BE_IN_WINDOW = {
    "q_bloom_fileskip",
    "q_theil_sen",
    "q_stream_bm25_ingest",
    "q_stream_txn_ingest",
    "q_txn_multitable",
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

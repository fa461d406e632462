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
# (round 12: CORRECTNESS_r11 came back 49/50 — the hard pins are the
# round's red row, fixed this round with the libm-free literal-table
# oracle, plus the three names whose implementation or pins CHANGE
# this round: the LSH auto-geometry default re-pinned the sf0.1 rows
# of both LSH queries, and nn_descent's truth kernel moved to the
# sampled-truth device. The other 46 slots are never-verified backlog
# fill in tools/rotation.py order — policy, not a hard requirement,
# so not pinned here.)
MUST_BE_IN_WINDOW = {
    "q_entropy_quality",
    "q_ann_lsh_topk",
    "q_ann_lsh_recall",
    "q_nn_descent",
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


def test_r13_queue_names_registered_and_below_window():
    """Names deferred below the verification window (the r9 precedent)
    must exist in the registry and must NOT occupy window slots — they
    are queued for fronting next rotation."""
    from os_ex_3_map_reduce_spark.plans.catalog import DRIVER_R13_QUEUE

    qs = set(all_queries())
    for name in DRIVER_R13_QUEUE:
        assert name in qs, name
        assert name not in DRIVER_PRIORITY, name

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
# (round 16, optimization round 2: every query whose implementation —
# or a shared operator underneath it — changed in the r16
# optimizations must re-row driver-side; every r15 must-window name
# went green in CORRECTNESS_r15, so the remaining slots are the
# oldest-stale greens per tools/rotation.py, not pinned here.)
MUST_BE_IN_WINDOW = {
    # changed this round (r16 optimizations) — must re-row
    "q_vt_branch",
    "q_bitemporal",
    "q_dsir_select",
    "q_audio_fingerprint",
    "q_kendall_tau",
    "q_kcenter_sample",
    "q_louvain_sweep",
    "q_modularity",
    "q_assortativity",
    "q_triangles",
    "q_ktruss",
    "q_vt_changes",
    "q_mor_delete",
    "q_ann_ivf_append",
    "q_ann_ivfpq_append",
    "q_ann_ivf_batch",
    "q_ann_ivfpq_residual",
    "q_ann_nsw_append",
    "q_ann_diskann",
}


def test_priority_prefix_fills_window_exactly():
    # r13: the priority prefix may exceed the window — positions past
    # DRIVER_WINDOW are the pinned spill (changed names that did not
    # fit), fronted next rotation. The window itself must be exactly
    # the first DRIVER_WINDOW names, no duplicates anywhere.
    assert len(DRIVER_PRIORITY) >= DRIVER_WINDOW
    assert len(set(DRIVER_PRIORITY)) == len(DRIVER_PRIORITY)


def test_window_contains_required_queries():
    window = list(all_queries())[:DRIVER_WINDOW]
    assert window == list(DRIVER_PRIORITY[:DRIVER_WINDOW])
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


def test_spill_names_sit_immediately_after_window():
    """Changed names that did not fit the 50-window (the splitter
    sweep touched 48 oracles) are pinned at positions just past it so
    the next rotation fronts them first."""
    spill = DRIVER_PRIORITY[DRIVER_WINDOW:]
    ordered = list(all_queries())
    assert list(ordered[DRIVER_WINDOW : DRIVER_WINDOW + len(spill)]) == list(
        spill
    )

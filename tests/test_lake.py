"""Lake-management operator tests beyond the oracle-parity sweep."""

from __future__ import annotations

from .conftest import SF_CORRECT


def test_profile_approx_knob_matches_exact_within_hll_error(spark):
    """profile(approx=True) is the 100 TB path (mergeable HLL, no
    Expand): per-column distinct estimates must land within HLL's
    documented ~5% of the exact profile, with every other statistic
    identical."""
    from os_ex_3_map_reduce_spark.plans.lake import _PROFILE_COLS, profile
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    cols = list(_PROFILE_COLS)
    exact = {r.column_name: r for r in profile(docs, cols).collect()}
    approx = {r.column_name: r for r in profile(docs, cols, approx=True).collect()}
    assert set(exact) == set(approx) == set(cols)
    for c in cols:
        e, a = exact[c], approx[c]
        assert (a.n_rows, a.n_nulls, a.min_value, a.max_value) == (
            e.n_rows, e.n_nulls, e.min_value, e.max_value
        )
        assert abs(a.n_distinct - e.n_distinct) <= max(1, 0.05 * e.n_distinct), (
            f"{c}: approx {a.n_distinct} vs exact {e.n_distinct}"
        )


def test_profile_approx_plan_has_no_expand(spark):
    """The knob's whole point: exact profiling pays an Expand (xN row
    amplification for multi-distinct); the HLL path must not."""
    from os_ex_3_map_reduce_spark.plans.explain import explain_str
    from os_ex_3_map_reduce_spark.plans.lake import _PROFILE_COLS, profile
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    plan = explain_str(profile(docs, list(_PROFILE_COLS), approx=True))
    assert "Expand" not in plan, plan

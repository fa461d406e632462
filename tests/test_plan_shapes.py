"""Physical-plan shape assertions — the 100 TB scale contract.

Correctness says a query returns the right rows; these tests say it
returns them with the right *plan*: small dims broadcast, filters and
projections pushed into the parquet scan, aggregations partial before
the shuffle, top-k without a global sort. A regression here is a
performance bug even while every value stays correct.
"""

from __future__ import annotations

import pytest

from os_ex_3_map_reduce_spark.plans import all_queries
from os_ex_3_map_reduce_spark.plans.explain import (
    explain_str,
    pushed_filters,
    read_schema,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_broadcast_join_is_broadcast(spark, qs):
    plan = explain_str(qs["q_join_broadcast"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # the fact table must not shuffle for the join itself
    assert "SortMergeJoin" not in plan


def test_sortmerge_join_hint_respected(spark, qs):
    plan = explain_str(qs["q_join_sortmerge"](spark, SF))
    assert "SortMergeJoin" in plan


def test_filter_and_projection_reach_the_scan(spark, qs):
    df = qs["q_filter_project"](spark, SF)
    assert pushed_filters(df).count("PushedFilters: []") == 0, (
        "no filters were pushed to the parquet scan:\n" + explain_str(df)
    )
    # column pruning: lineitem has 16 columns; the scan must read fewer.
    rs = read_schema(df)
    assert rs and "l_comment" not in rs


def test_agg_is_partial_before_shuffle(spark, qs):
    """Two HashAggregate nodes (partial + final) ⇒ map-side combine."""
    plan = explain_str(qs["q_agg_pricing_summary"](spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_topk_avoids_global_sort(spark, qs):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k then driver merge), not a full sort-exchange of all rows."""
    plan = explain_str(qs["q_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_wordcount_flagship_shape(spark, qs):
    plan = explain_str(qs["q_wordcount"](spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial+final count
    assert "TakeOrderedAndProject" in plan  # top-10 without global sort


def test_similarity_topk_has_no_shuffle(spark, qs):
    """Brute-force query-vector top-k is scan → project → take-ordered;
    a shuffle here would mean the operator doesn't scale linearly."""
    plan = explain_str(qs["q_similarity_topk"](spark, SF))
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark, qs):
    """EXISTS must plan as a semi join (no row multiplication), and the
    tiny filtered build side should broadcast."""
    plan = explain_str(qs["q_join_semi"](spark, SF))
    assert "LeftSemi" in plan


def test_multiway_join_broadcasts_all_dims(spark, qs):
    """region/nation/supplier are tiny: the 3-way dim chain must be all
    broadcast joins — zero shuffles of the fact table for joining."""
    plan = explain_str(qs["q_join_multiway"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_exact_dedup_single_shuffle(spark, qs):
    """Dedup via window: exactly one hash-partition exchange on the key
    (plus possibly one for the final join); never a cartesian."""
    plan = explain_str(qs["q_dedup_exact"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

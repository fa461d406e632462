"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5.1: golden outputs only, no property testing).

The generic map_reduce operator must agree with a plain-pandas
reference implementation for ANY client: arbitrary key/value data,
duplicate keys, empty emissions, 0..N fan-out. Spark jobs per example
are expensive, so examples are capped and deadlines disabled; the
value distribution (text keys incl. empties/unicode, signed ints)
still covers the interesting boundaries.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from os_ex_3_map_reduce_spark.operators.map_reduce import (
    MapReduceClient,
    run_map_reduce,
)

KEYS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=0,
    max_size=4,
)
ROWS = st.lists(st.tuples(KEYS, st.integers(-1000, 1000)), min_size=1, max_size=40)


class SumEvensDropOdds(MapReduceClient):
    """Exercises every emission arity: map emits 0 pairs for negative
    values, 2 pairs for multiples of ten, else 1; reduce emits nothing
    for keys whose sum is odd."""

    intermediate_schema = "k string, v long"
    output_schema = "k string, total long"

    def map(self, row):
        if row.v < 0:
            return []
        if row.v % 10 == 0:
            return [(row.k, row.v), (row.k, row.v)]
        return [(row.k, row.v)]

    def reduce(self, key, group: pd.DataFrame):
        total = int(group["v"].sum())
        if total % 2 == 1:
            return []
        return [(key[0], total)]


def _reference(rows: list[tuple[str, int]]) -> set[tuple[str, int]]:
    acc: dict[str, int] = {}
    for k, v in rows:
        if v < 0:
            continue
        acc[k] = acc.get(k, 0) + (2 * v if v % 10 == 0 else v)
    return {(k, t) for k, t in acc.items() if t % 2 == 0}


@pytest.mark.filterwarnings("ignore")
@given(rows=ROWS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_map_reduce_matches_pandas_reference(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r.k, r.total) for r in run_map_reduce(df, SumEvensDropOdds()).collect()
    }
    assert got == _reference(rows)


@pytest.mark.filterwarnings("ignore")
@given(rows=ROWS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_map_reduce_parallelism_invariance(spark, rows):
    """The reference's multiThreadLevel sweep as a property: reduce-side
    partition count must never change the result."""
    df = spark.createDataFrame(rows, "k string, v long")
    a = {
        (r.k, r.total)
        for r in run_map_reduce(df, SumEvensDropOdds(), num_shuffle_partitions=1).collect()
    }
    b = {
        (r.k, r.total)
        for r in run_map_reduce(df, SumEvensDropOdds(), num_shuffle_partitions=7).collect()
    }
    assert a == b == _reference(rows)

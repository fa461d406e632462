"""Driver-faithful correctness gate: every catalog query with an oracle
must hash-match DuckDB at sf0.01 (the same comparison CORRECTNESS_r{N}
will run)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .conftest import SF_CORRECT, assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_CORRECT)
    assert_matches_oracle(df, duck, _ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, duck):
    """Queries without an oracle still must run and return rows."""
    df = _QUERIES[name](spark, SF_CORRECT)
    assert df.count() > 0, f"{name}: produced no rows"

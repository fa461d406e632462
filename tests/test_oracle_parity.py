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


def test_every_query_has_an_exact_oracle():
    """Since round 8 (deterministic sample-trained IVF retired the last
    rows-only entry) the catalog invariant is total oracle coverage: a
    new query landing without an oracle_sql entry is a regression the
    driver would record as a weaker rows-only check — fail here first.
    If a genuinely non-SQL-expressible query ever needs rows-only
    status, document the why in its registration and exempt it here by
    name."""
    assert sorted(set(_QUERIES) - set(_ORACLES)) == []

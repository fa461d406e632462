"""Query catalog: the engine's user-facing query surface.

Every operator family from SURVEY.md §2 registers here as a named query
(Spark callable) plus, where SQL-expressible, a DuckDB oracle string.
This is the contract ``__spark_entry__.py`` exposes to the driver: the
driver runs the Spark side and the oracle side-by-side at sf0.01 and
hash-compares values (order-insensitive, columns matched by name).

Determinism rules every registered query obeys (so the hash compare is
meaningful rather than flaky):

1. **No raw timestamp columns in output** — render event/order time as
   formatted strings or epoch integers; Spark TIMESTAMP_LTZ vs DuckDB
   TIMESTAMP_NS stringification differs.
2. **Large float aggregations go through exact decimal sums** then cast
   to double — double summation order differs between engines (and
   between Spark runs!), decimal is associative and exact.
3. **Top-k always carries a total tiebreak** on a key column, applied
   *after* any float rounding, so the selected set is identical.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects; late import avoids cycles.
    from . import llm, mapreduce_queries, relational, streaming_queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {q.name: q.fn for q in _REGISTRY.values()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}


def get_query(name: str) -> Query:
    _load_all()
    return _REGISTRY[name]

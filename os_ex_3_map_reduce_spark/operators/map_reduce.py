"""Generic map→shuffle→reduce operator: the reference's whole surface.

Reference parity (SURVEY.md §2.1 R1–R8):

- ``map(k1, v1, ctx)`` emitting 0..N pairs via ``emit2``
  [R:MapReduceClient.h] → here the *rows returned* by a user map
  function (a flatMap): no emit callback survives, which is the one
  purely-syntactic shape change (SURVEY.md §3.2).
- per-thread sort + single-threaded merge-shuffle
  [R:MapReduceFramework.cpp] → Spark's sort-based shuffle (parallel,
  spilling, hash-partitioned) behind ``groupBy(key)``.
- ``reduce(group, ctx)`` emitting 0..N pairs via ``emit3`` — full
  UDTF-over-group power, NOT just scalar aggregation → ``applyInPandas``
  (each distinct key's rows arrive as one pandas DataFrame; the rows
  returned are the output).

Two API levels:

- :func:`map_reduce` — batch-level (fast path): user functions see Arrow
  batches (pandas DataFrames), vectorizable.
- :class:`MapReduceClient` + :func:`run_map_reduce` — row-level
  (reference-shaped): ``map(row) -> iterable of tuples``,
  ``reduce(key, group_df) -> iterable of tuples``. Convenience wrapper
  over the same plan; per-row Python is the slow path by design.

Scale notes (100 TB): the mapped relation is hash-partitioned on the
key — same contract as the reference's shuffle, minus its single-thread
merge bottleneck. One group must fit in one executor's memory
(``applyInPandas`` materializes the group), which is exactly the
reference's own constraint (a group = one in-RAM vector). For known-hot
keys, pre-aggregate in ``map_fn`` (combiner) or salt the key before
calling; AQE skew handling covers the join paths but not grouped-map,
so the combiner pattern is the documented mitigation.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_key(
    key: Column | str,
    *,
    trim: bool = False,
    fold_case: bool = False,
    prefix_len: int | None = None,
) -> Column:
    """Canonical representative of a comparator-defined key class.

    The reference shuffles with the user's ``K2::operator<`` and groups
    keys that compare EQUIVALENT under it — ``!(a<b) && !(b<a)`` — so a
    comparator that only inspects part of the key merges bytewise-
    distinct K2 values into one reduce group [SURVEY.md §7.4]. Spark's
    ``groupBy`` is exact-equality, so the engine expresses the same
    semantics by grouping on a *normalization*: a function constant on
    each equivalence class. This helper builds the common string-key
    normalizations, applied in the order trim → fold_case → prefix
    (each corresponds to a comparator that ignores padding, case, or
    everything past a prefix). For anything fancier pass your own
    ``Column -> Column`` to ``map_reduce(key_normalizer=...)`` — any
    deterministic JVM expression works, and the grouping stays a single
    hash shuffle on the normalized value.
    """
    c = F.col(key) if isinstance(key, str) else key
    if trim:
        c = F.trim(c)
    if fold_case:
        # ASCII-only by contract: engine-specific unicode case rules
        # (Java's combining-dot 0130, final sigma) would make the
        # normalized key corpus-dependent across engines — see
        # functions/text.py ascii_fold.
        from ..functions.text import ascii_fold

        c = ascii_fold(c)
    if prefix_len is not None:
        c = F.substring(c, 1, prefix_len)
    return c


def map_reduce(
    df: DataFrame,
    map_fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    key_cols: list[str] | str,
    reduce_fn: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    intermediate_schema: str,
    output_schema: str,
    num_shuffle_partitions: int | None = None,
    key_normalizer: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Batch-level generic MapReduce over a DataFrame.

    ``map_fn``: ``mapInPandas`` body — iterator of input batches →
    iterator of intermediate batches matching ``intermediate_schema``
    (0..N rows per input row: the emit2 surface).
    ``reduce_fn``: called once per distinct key with all its rows;
    returns a pandas DataFrame matching ``output_schema`` (0..N rows:
    the emit3 surface).
    ``num_shuffle_partitions``: reference's ``multiThreadLevel``
    analog — pins reduce-side parallelism; default leaves it to the
    session/AQE.
    ``key_normalizer``: optional comparator-equivalence hook (see
    :func:`normalized_key`) applied to each key column for grouping.
    When set, ``reduce_fn``'s key argument carries the NORMALIZED
    values while the group DataFrame keeps the original intermediate
    columns — i.e. reduce sees every raw K2 of the equivalence class,
    exactly the reference's contract.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    mapped = df.mapInPandas(map_fn, schema=intermediate_schema)
    if key_normalizer is not None:
        group_cols = [f"__nk_{c}" for c in key_cols]
        mapped = mapped.select(
            "*",
            *[key_normalizer(F.col(c)).alias(n) for c, n in zip(key_cols, group_cols)],
        )
        inner_reduce = reduce_fn

        def reduce_fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            return inner_reduce(key, pdf.drop(columns=group_cols))

    else:
        group_cols = key_cols
    if num_shuffle_partitions is not None:
        mapped = mapped.repartition(num_shuffle_partitions, *group_cols)
    return mapped.groupBy(*group_cols).applyInPandas(reduce_fn, schema=output_schema)


class MapReduceClient:
    """Row-level client, the reference's ``MapReduceClient`` re-shaped
    [R:MapReduceClient.h].

    Subclass and define:

    - ``intermediate_schema``: DDL string for emitted (K2, V2...) rows;
      the FIRST ``n_key_cols`` fields are the shuffle key.
    - ``output_schema``: DDL string for emitted (K3, V3...) rows.
    - ``map(self, row) -> iterable[tuple]`` — row is a named tuple of
      the input row (K1/V1); yield 0..N intermediate tuples (emit2).
    - ``reduce(self, key, group) -> iterable[tuple]`` — ``key`` is a
      tuple of key values, ``group`` a pandas DataFrame of every
      intermediate row with that key (the post-shuffle
      IntermediateVec); yield 0..N output tuples (emit3).

    The client must be picklable (it ships to executors).
    """

    intermediate_schema: str
    output_schema: str
    n_key_cols: int = 1
    #: Optional comparator-equivalence hook (reference: ``K2::operator<``
    #: may ignore parts of the key, merging bytewise-distinct K2 values
    #: into one reduce group — see :func:`normalized_key`). A staticmethod
    #: ``Column -> Column``; evaluated driver-side when building the
    #: plan, so it never ships to executors and stays JVM-expression fast.
    key_normalizer: Callable[[Column], Column] | None = None

    def map(self, row: Any) -> Iterable[tuple]:  # pragma: no cover - abstract
        raise NotImplementedError

    def reduce(self, key: tuple, group: pd.DataFrame) -> Iterable[tuple]:  # pragma: no cover
        raise NotImplementedError


def _ddl_field_names(ddl: str) -> list[str]:
    """Top-level field names of a DDL schema string.

    Parsed with Spark's own DDL parser — a naive ``split(',')`` yields
    wrong names (and therefore wrong shuffle keys) the moment a client
    schema nests a comma-bearing type like ``k struct<a:int,b:int>``.
    """
    from pyspark.sql.types import _parse_datatype_string

    return list(_parse_datatype_string(ddl).fieldNames())


def run_map_reduce(
    df: DataFrame,
    client: MapReduceClient,
    num_shuffle_partitions: int | None = None,
) -> DataFrame:
    """Run a row-level :class:`MapReduceClient` over ``df``.

    Equivalent of ``startMapReduceJob(client, inputVec, outputVec, n)``
    minus the async control plane (see :mod:`.job` for that parity).
    """
    inter_cols = _ddl_field_names(client.intermediate_schema)
    out_cols = _ddl_field_names(client.output_schema)
    key_cols = inter_cols[: client.n_key_cols]

    def map_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            emitted: list[tuple] = []
            for row in pdf.itertuples(index=False):
                emitted.extend(client.map(row))
            yield pd.DataFrame(emitted, columns=inter_cols)

    def reduce_group(key: tuple, group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(list(client.reduce(key, group)), columns=out_cols)

    return map_reduce(
        df,
        map_batches,
        key_cols,
        reduce_group,
        client.intermediate_schema,
        client.output_schema,
        num_shuffle_partitions,
        key_normalizer=client.key_normalizer,
    )


class SortedGroupFold:
    """User contract for :func:`sorted_group_scan` — an ONLINE fold
    over a group's rows delivered in sort order, possibly in several
    chunks: ``init(key)`` makes the initial state, ``step(state,
    chunk)`` consumes one pandas chunk (rows of THIS group only, in
    order) and returns the new state, ``finish(key, state)`` emits
    0..N output tuples. State is whatever the fold needs — O(1) for
    running aggregates — which is the entire point: unlike
    ``applyInPandas``, the group is never materialized."""

    def init(self, key: tuple) -> Any:  # pragma: no cover - interface
        raise NotImplementedError

    def step(self, state: Any, chunk: pd.DataFrame) -> Any:  # pragma: no cover
        raise NotImplementedError

    def finish(self, key: tuple, state: Any) -> Iterable[tuple]:  # pragma: no cover
        raise NotImplementedError


def sorted_group_scan(
    df: DataFrame,
    key_cols: list[str],
    sort_cols: list[str],
    fold: SortedGroupFold,
    output_schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Secondary sort — the classic MapReduce composite-key pattern
    (partition by the natural key, sort the shuffle by (key, value
    fields), stream each group through reduce in value order), the one
    grouped-reduce shape :func:`run_map_reduce` cannot express because
    ``applyInPandas`` materializes whole groups in arbitrary row
    order.

    Spark-first realization: ``repartition(key)`` co-locates each key,
    ``sortWithinPartitions(key, sort)`` makes every group a contiguous
    SORTED run inside its partition — the ordering work rides the
    shuffle's own sort machinery, costing zero extra passes — and one
    ``mapInPandas`` walks the partition detecting group boundaries,
    folding each group's chunks online. A group larger than one Arrow
    batch arrives as several ``step`` calls (boundary-spanning groups
    are the hard part of the pattern and are property-tested with
    tiny batch sizes); memory is O(fold state), never O(group) — at
    100 TB this is what makes billion-row keys reducible where
    ``applyInPandas`` would OOM.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    arranged = df.repartition(n, *key_cols).sortWithinPartitions(
        *key_cols, *sort_cols
    )
    out_names = _ddl_field_names(output_schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key: tuple | None = None
        state: Any = None
        pending: list[tuple] = []
        for pdf in batches:
            if not len(pdf):
                continue
            keys = list(zip(*[pdf[k] for k in key_cols]))
            bounds = [0]
            bounds += [i for i in range(1, len(keys)) if keys[i] != keys[i - 1]]
            bounds.append(len(keys))
            for s, e in zip(bounds[:-1], bounds[1:]):
                k = keys[s]
                chunk = pdf.iloc[s:e]
                if cur_key is not None and k != cur_key:
                    pending.extend(fold.finish(cur_key, state))
                    cur_key = None
                if cur_key is None:
                    cur_key, state = k, fold.init(k)
                state = fold.step(state, chunk)
            if pending:
                yield pd.DataFrame(pending, columns=out_names)
                pending = []
        if cur_key is not None:
            pending.extend(fold.finish(cur_key, state))
        if pending:
            yield pd.DataFrame(pending, columns=out_names)

    return arranged.mapInPandas(run, output_schema)

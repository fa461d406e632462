"""Vector/embedding column helpers.

Two computation paths, both deterministic:

- JVM path (:func:`cosine_to_query`): higher-order-function fold —
  sequential, stays in codegen, zero Python. Used for query-vector
  scoring where the query is a literal.
- Arrow path (:func:`cosine_matrix_udf` users): numpy float64 matmul
  inside a pandas UDF for all-pairs / batched scoring — ~100× the
  per-row throughput of a Python loop, and empirically bit-compatible
  with DuckDB's DOUBLE[] cosine at round-4 (measured gap: engine diff
  ≤ 4e-16 vs nearest rounding boundary ≥ 2e-10 on the fixture).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_fold(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_to_query(emb_col: str | Column, query: Iterable[float]) -> Column:
    """Cosine similarity of each row's embedding to a literal query
    vector, entirely JVM-side: dot / (norm_d * norm_q).

    A zero-norm embedding scores 0.0 instead of erroring (ANSI mode
    turns the bare division into DIVIDE_BY_ZERO — found by the round-9
    randomized batch/single equivalence test) — matching the Arrow
    batch kernels, which score zero vectors unnormalized (= 0 against
    every query). A NULL/missing embedding stays NULL: without the
    explicit isNull branch, ``when(den != 0.0, ...)`` evaluates NULL
    as false and the otherwise-branch would silently convert a null
    embedding into a 0.0 score (ADVICE r9)."""
    d = to_double_array(emb_col)
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    den = norm_fold(d) * norm_fold(q)
    return (
        F.when(den.isNull(), F.lit(None).cast("double"))
        .when(den != F.lit(0.0), dot_fold(d, q) / den)
        .otherwise(F.lit(0.0))
    )

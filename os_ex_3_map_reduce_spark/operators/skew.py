"""Skew-mitigation operators (SURVEY.md §2.4).

AQE's skew-join splitting handles skewed *joins* automatically; skewed
*aggregation* keys still funnel every row of a hot key through one
reducer. Salting breaks that: aggregate on (key, salt) first — spreads
each hot key over ``salt_buckets`` reducers — then combine the partial
results per key. Works for any algebraic aggregate (count/sum/min/max);
the helper takes the partial and final expression lists explicitly so
the decomposition stays visible and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partial_aggs`` aggregate within (key, salt); ``final_aggs``
    combine the per-salt partials per key (e.g. partial ``count(*) AS
    n`` then final ``sum(n) AS n``). The salt comes from a seeded
    uniform; which bucket a given row lands in is irrelevant to the
    per-key result, so the output is exact and stable.

    At 100 TB: map-side partial aggregation already absorbs most of the
    win for low-cardinality keys; salting matters when a key's rows
    overflow one reducer's memory/CPU even after partials — web-scale
    "host" keys, null-heavy join keys, boilerplate dedup buckets.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)

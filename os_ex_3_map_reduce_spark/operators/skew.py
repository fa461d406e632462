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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    distribute_by: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Manual skew-join: replicate the small side per salt bucket and
    spread each hot big-side key over ``salt_buckets`` reducers.

    ``on`` is a list of (big_col, small_col) equi-key pairs;
    ``distribute_by`` names big-side columns whose hash assigns the salt
    (they must vary WITHIN a join key — salting on the key itself would
    put every row of the hot key back in one bucket). The small side is
    exploded ``salt_buckets``× so every (key, salt) combination exists.

    Join semantics are preserved for ``inner`` and ``left`` (each big
    row matches exactly its own salt's copy); right/full would duplicate
    unmatched small rows per salt, so they are rejected.

    AQE's skew-join split covers this automatically for plain shuffle
    joins; the manual primitive remains necessary where AQE can't reach:
    pre-partitioned/bucketed layouts that must stay co-located, stateful
    streaming joins (no AQE in streaming), or when the skew is known
    ahead of time and re-planning mid-query is too late.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in distribute_by]), F.lit(salt_buckets)
    ).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = big_s["__salt"] == small_s["__salt"]
    for bk, sk in on:
        cond = cond & (big_s[bk] == small_s[sk])
    return big_s.join(small_s, cond, how).drop(big_s["__salt"]).drop(
        small_s["__salt"]
    )

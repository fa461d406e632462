"""Count-Min sketch as a pure DataFrame operator (the brief's "novel
sketch" custom-operator slot; the reference has no sketches — its only
aggregation is exact sort-based group-by-key [R:MapReduceFramework.cpp]).

The sketch is not a driver-side object: it IS a (depth × width) counts
relation built with one aggregation —

    explode key → depth (row, bucket) coordinates   (xxhash64, JVM-side)
    groupBy(row, bucket).count()                    (map-side combine)

which is exactly what makes CMS work at 100 TB: the partial-aggregate
state per task is capped at depth*width cells no matter how many rows
stream through, the shuffle moves at most depth*width rows per map
partition, and two sketches merge by adding cell counts (the same
groupBy). Estimation is a broadcast join of candidate keys against the
tiny sketch relation, min over rows — no Python anywhere.

Guarantees (standard CMS): estimate >= true count, and
estimate <= true + (e/width)*N with probability 1 - e^-depth.
Deterministic: xxhash64 is a fixed pure function, so the whole sketch
(and any ranking built on it) is identical on every run and cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: str, row: int, width: int):
    """Bucket of ``key_col`` in sketch row ``row`` — xxhash64 with the
    row index mixed in as a second hashed column."""
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(row)), F.lit(width)).cast("int")


def cms_build(
    df: DataFrame, key_col: str, depth: int = 5, width: int = 1024
) -> DataFrame:
    """Build the sketch relation ``(row int, bucket int, cnt long)``.

    Sparse: cells never touched are absent (an absent cell is 0).
    """
    coords = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket(key_col, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return coords.groupBy("c.row", "c.bucket").agg(F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise sum.
    This is the distributive property that lets per-day / per-source
    sketches roll up without touching raw data again."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over rows of the cell the
    key hashes to. Returns ``(key_col, est long)``.

    The sketch is at most depth*width rows → always broadcast; the keys
    side streams, so estimating a billion candidates is one broadcast
    hash join + one partial-combined min.
    """
    coords = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket(key_col, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row", "c.bucket")
    return (
        coords.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )

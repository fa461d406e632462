"""Batch merge/upsert (CDC apply) — the snapshot-maintenance operator.

The reference has no mutation surface at all (its output vector is
write-once); a real warehouse ingests change batches continuously, so
the engine provides the snapshot-merge primitive directly expressible
on plain immutable files: apply an updates batch (upserts + deletes) to
a base snapshot and produce the next snapshot.

Semantics (per key):
- update row with ``op = 'D'``        → key removed
- update row with ``op`` != 'D'      → row replaced (upsert; inserts
  are just updates whose key is absent from base)
- key absent from updates            → base row carried over

Scale design: ONE shuffle — a full outer join on the key (both sides
hash-partitioned); per-key arbitration is a null-branch ``CASE``, all
JVM. If multiple update rows share a key, the caller picks the winner
first (``latest_wins``: one window by a version column — deterministic,
no ``dropDuplicates`` nondeterminism). At 100 TB the base is
partitioned/bucketed by the key, the updates batch is comparatively
tiny, and the rewrite touches only affected partitions (dynamic
partition overwrite) — the same join shape, narrower write; a table
format (Delta/Iceberg) would add a transactional commit on top, not a
different plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_wins(
    updates: DataFrame, key: str, version_col: str, op_col: str = "op"
) -> DataFrame:
    """Collapse an updates batch to one row per key.

    Ordering: highest ``version_col`` wins; a version tie is broken
    ascending on ``op_col`` (so 'D' sorts before 'U' — a same-version
    delete beats an update, the conservative choice for CDC replay).
    Remaining columns are NOT consulted: if two rows tie on
    (version, op) the survivor is nondeterministic, so keep the version
    column unique per key within a batch."""
    w = Window.partitionBy(key).orderBy(F.desc(version_col), F.asc(op_col))
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply ``updates`` (one row per key; ``op_col`` = 'D' deletes) to
    ``base``; returns the next snapshot with base's schema."""
    cols = base.columns
    u = updates.select(
        F.col(key).alias("__u_key"),
        F.col(op_col).alias("__u_op"),
        *[F.col(c).alias(f"__u_{c}") for c in cols if c != key],
    )
    joined = base.join(u, base[key] == u["__u_key"], "full_outer")
    return joined.where(
        # every 'D' row drops out — matched deletes remove the base row,
        # unmatched deletes (absent key) are no-ops; everything else stays
        F.col("__u_op").isNull() | (F.col("__u_op") != "D")
    ).select(
        F.coalesce(base[key], F.col("__u_key")).alias(key),
        *[
            F.when(F.col("__u_op").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(base[c])
            .alias(c)
            for c in cols
            if c != key
        ],
    )

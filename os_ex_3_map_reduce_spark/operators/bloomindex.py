"""Persisted per-file BLOOM INDEX — point-lookup file pruning for the
axis zone maps cannot cover.

The engine's written tables already prune two ways: bucket pruning on
the layout key (vt_scan's hash buckets) and min/max zone maps on
clustered columns (q_vt_fileskip, Z-order/Hilbert). Both fail for a
POINT LOOKUP on a high-cardinality column that is neither the bucket
key nor clustered: its values spread uniformly, every file's min/max
spans everything, and the reader opens all files for one row. The
lakehouse answer (Delta/Iceberg bloom filter indexes, Parquet
bloom_filter pages) is a tiny per-file membership sketch consulted
BEFORE storage: a file whose sketch lacks the key cannot contain it
(no false negatives); false positives cost one extra file read.

Representation: the index is the relation ``(fb, pos)`` — the
DISTINCT bit positions each file's keys set under k=2 hash functions
(a bitmap stored as its position list, the roaring-style sparse
form). Pruning semantics are identical to a packed bitmap, and the
relation form keeps the index exactly reproducible in ANSI SQL.

Determinism note (why NOT xxhash64, the engine's usual shuffle hash):
false-positive candidates depend on the hash VALUES, not just the
key semantics, so an oracle must recompute the same hashes — the
positions therefore use pure int64 arithmetic both engines share:
h_i(v) = ((v * A_i + B_i) mod P) mod M, multiplicative hashing with
P prime. Every product stays far inside int64 for the fixture key
ranges (v <= 1e7: v*A ~ 2.6e16).

Sizing: M = 65536 bits/file, k = 2. At sf0.1 (150k orders / 32
files ~ 4.7k keys/file) the per-file load is ~9.4k of 65536 positions
→ ~2% false-positive rate per probe pair → a point lookup reads
~1.0-1.6 of 32 files. At 100 TB the index stays ~M rows per file —
millions of times smaller than the data — and lives in one parquet
the planner (driver) reads like any manifest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: hash constants shared verbatim by the SQL oracle (keep in sync with
#: q_bloom_fileskip's oracle text).
A1, B1 = 2654435761, 104729
A2, B2 = 2246822519, 12582917
P = 479001599
M = 65536


def _h(col: Column, a: int, b: int) -> Column:
    return ((col * F.lit(a) + F.lit(b)) % F.lit(P)) % F.lit(M)


def bloom_positions(col: Column) -> list[Column]:
    """The k=2 probe positions of a key — the one definition the
    writer, the lookup, and the oracle all share."""
    return [_h(col, A1, B1), _h(col, A2, B2)]


def bloom_table_write(
    df: DataFrame,
    path: str,
    bucket_col: str,
    key_col: str,
    nbuckets: int = 32,
) -> None:
    """Write ``df`` as one file per ``fb = bucket_col % nbuckets`` dir
    (the engine's written-index layout discipline) plus the bloom
    index relation over ``key_col`` at ``path/_bloom``."""
    data = df.withColumn(
        "fb", (F.col(bucket_col) % nbuckets).cast("int")
    ).repartition("fb")
    data.write.mode("overwrite").partitionBy("fb").parquet(f"{path}/data")
    pos = data.select(
        "fb",
        F.explode(F.array(*bloom_positions(F.col(key_col)))).alias("pos"),
    ).distinct()
    pos.write.mode("overwrite").parquet(f"{path}/_bloom")


def bloom_candidates(
    spark: SparkSession, path: str, keys: list[int]
) -> dict[int, list[int]]:
    """Per lookup key, the candidate file (bucket) ids whose bloom
    contains EVERY probe position of the key. One tiny index read,
    evaluated engine-side (a grouped ALL-positions test), collected as
    a bounded planner constant — the planFiles step a 100 TB reader
    runs before touching storage."""
    idx = spark.read.parquet(f"{path}/_bloom")
    kdf = spark.createDataFrame(
        [(int(k),) for k in keys], "key long"
    ).select(
        "key",
        F.explode(F.array(*bloom_positions(F.col("key")))).alias("pos"),
    )
    # DISTINCT probe count, not k: a key whose two hash positions
    # collide (h1(v) == h2(v) — 154 such keys exist in [0, 1e7) under
    # the shipped A/B/P/M constants) needs only ONE distinct hit, and
    # counting it as np=2 while nhit counts distinct positions made
    # such keys unreachable — a false NEGATIVE, violating the module
    # guarantee (and diverging from the oracle's COUNT(DISTINCT p)).
    nprobe = kdf.groupBy("key").agg(F.countDistinct("pos").alias("np"))
    hit = (
        kdf.join(idx, "pos")
        .groupBy("key", "fb")
        .agg(F.countDistinct("pos").alias("nhit"))
        .join(F.broadcast(nprobe), "key")
        .where(F.col("nhit") == F.col("np"))
        .select("key", "fb")
    )
    out: dict[int, list[int]] = {int(k): [] for k in keys}
    for r in hit.collect():
        out[int(r.key)].append(int(r.fb))
    return {k: sorted(v) for k, v in out.items()}


def bloom_lookup(
    spark: SparkSession, path: str, key_col: str, key: int, cands: list[int]
) -> DataFrame:
    """Read ONLY the candidate files for ``key`` (zero opens for
    pruned files — scan-pruning numFiles-asserted in tests) and apply
    the exact residual predicate; pruning is an optimization, never a
    filter."""
    if not cands:
        return (
            spark.read.option("basePath", f"{path}/data")
            .parquet(f"{path}/data")
            .where(F.lit(False))
        )
    reader = spark.read.option("basePath", f"{path}/data")
    df = reader.parquet(*[f"{path}/data/fb={c}" for c in cands])
    return df.where(F.col(key_col) == key)

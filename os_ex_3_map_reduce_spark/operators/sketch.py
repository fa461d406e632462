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


# --- Bloom filter (membership sketch) --------------------------------------
#
# PySpark 4.1 exposes neither DataFrame.stat.bloomFilter (dropped from
# the Python client) nor bloom_filter_agg/might_contain as public SQL
# functions, so the membership sketch is built the same way as the CMS
# above: a pure DataFrame aggregation over xxhash64 coordinates. The
# filter is ONE row holding a sparse map<word_idx int, word long> of
# 64-bit bitmap words — broadcastable at any sensible size (2^20 bits
# = at most 16k map entries), probed with JVM-only bit arithmetic
# (element_at + AND), no Python, no shuffle on the probe side.
#
# This is the explicit form of what Spark's own runtime row-level
# filtering (InjectRuntimeFilter) does inside the optimizer; surfacing
# it as an operator covers the cases the optimizer can't reach —
# pre-shuffle pruning for bucketed layouts, stream-static joins, or a
# filter shipped between jobs. Guarantees: no false negatives ever;
# false-positive rate ~ (1 - e^(-kn/m))^k for k hashes, n keys, m bits
# — the survivors still need the exact join, which is why
# bloom_might_contain is a PRE-filter, not a join replacement.


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> DataFrame:
    """Build the filter: one row ``(bloom map<int,bigint>)``.

    Each key sets ``num_hashes`` bits (xxhash64 seeded by the hash
    index, pmod into the bit space); bits pack into 64-bit words via
    ``bit_or`` so the build is one explode + one map-side-combined
    aggregation — per-task state is capped at ``num_bits/64`` cells,
    and two filters over the same (num_bits, num_hashes) merge by
    unioning their word relations and re-OR-ing.
    """
    bit = lambda i: F.pmod(  # noqa: E731
        F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits)
    )
    bits = df.select(
        F.explode(F.array(*[bit(i) for i in range(num_hashes)])).alias("bit")
    )
    # shiftleft's count argument must be a literal in the Python API —
    # the variable-shift forms go through F.expr
    words = bits.select(
        F.expr("cast(shiftrightunsigned(bit, 6) as int)").alias("w"),
        F.expr("shiftleft(cast(1 as bigint), cast(bit & 63 as int))").alias("m"),
    )
    packed = words.groupBy("w").agg(F.bit_or("m").alias("word"))
    return packed.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("w", "word")))
        ).alias("bloom")
    )


def bloom_might_contain(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Rows of ``df`` whose key might be in the filter (same schema as
    ``df``). The one-row filter broadcasts; each probe is
    ``num_hashes`` map lookups + AND masks, fully inside whole-stage
    codegen — a missing word means those bits are all zero.
    """
    # explicit crossJoin: one broadcast row against every probe row
    probed = df.crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for i in range(num_hashes):
        b = f"pmod(xxhash64({key_col}, {i}), {num_bits})"
        word = f"coalesce(element_at(bloom, cast(shiftrightunsigned({b}, 6) as int)), cast(0 as bigint))"
        mask = f"shiftleft(cast(1 as bigint), cast({b} & 63 as int))"
        cond = cond & (F.expr(f"({word} & {mask})") != 0)
    return probed.where(cond).drop("bloom")


# ---------------------------------------------------------------------------
# KMV ("theta") distinct sketch + mergeable bottom-k sample
# ---------------------------------------------------------------------------
#
# The property that makes any sketch usable at 100 TB is MERGEABILITY:
# sketch(A ∪ B) must be computable from sketch(A) and sketch(B) alone,
# so per-partition / per-day partials roll up without rescanning raw
# data. KMV (k minimum values — the construction inside the
# Theta/DataSketches distinct family) has the cleanest possible merge:
# a sketch IS the set of the k smallest hash values of the distinct
# keys, and merge = union the value sets, keep the k smallest. That
# identity — merge(kmv(A), kmv(B)) == kmv(A ∪ B), EXACTLY, not
# approximately — is what q_sketch_theta_union proves in-band.
#
# Estimator (Beyer et al., SIGMOD'07): with hashes uniform on [0, M),
# the k-th smallest value h_(k) estimates density k/n, so
# n ≈ (k-1) * M / h_(k) (the -1 debiases); fewer than k distinct
# hashes means the sketch holds ALL of them and the count is exact.
#
# Hashes are the engine-portable md5-prefix construction (15 hex
# nibbles -> bigint in [0, 2^60), the q_dsir_select recipe): both
# Spark and DuckDB compute the identical value, so the oracle can
# rebuild the sketch bit-for-bit — an EXACT oracle for an
# approximate-distinct operator. xxhash64 would be faster but is not
# reproducible in DuckDB; the portable hash is the price of the
# correctness gate, documented here once.

_HASH60_M = float(1 << 60)  # md5-prefix hash range, exactly 16^15


def portable_hash60(col) -> "F.Column":
    """Engine-portable 60-bit hash: first 15 md5 hex nibbles of the
    column's (or expression's) string form, decoded to bigint. DuckDB
    equivalent: ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def bottom_k(
    df: DataFrame,
    k: int,
    by: list[str] | None = None,
    order: str | list[str] = "h",
) -> DataFrame:
    """The k smallest rows by ``order`` (per ``by`` group), with their
    rank ``rk`` (1-based). ``order`` may be several columns — callers
    whose first sort key can tie across distinct rows (e.g. a hash
    over non-distinct inputs) MUST pass a tiebreak so both engines
    keep the same rows. Two-level: per-input-partition top-k first,
    then the global top-k over the ≤ k × P survivors. The global pass
    sorts k × P rows, not the data — the standard distributed-top-k
    shape, so no single task ever sees more than max(k × P, group
    width) rows.

    Stage 1 deliberately avoids a window over (group, partition id):
    that plans an Exchange of the WHOLE relation (Catalyst can't know
    rows already satisfy a partitioning on spark_partition_id), so the
    data would cross the network just to be locally ranked — measured
    9.9–10.8× on the 10× lineitem draw, i.e. the shuffle IS the cost.
    Instead stage 1 is a single-pass Arrow kernel (mapInPandas): each
    task folds its batches into a per-group buffer compacted to the k
    smallest rows after every batch — O(k × G + batch) state, no
    shuffle, one evaluation. Sort-free alternatives (mins-broadcast
    rank arithmetic over monotonically_increasing_id) evaluate the
    sorted lineage twice and measured 2× worse than the shuffle.
    ``order`` must totally order the carried columns (rows tied on
    every order column must be identical in all output columns) —
    true for distinct-hash KMV input and for samples carrying only
    (h, *order)."""
    from pyspark.sql.window import Window

    by = by or []
    order = [order] if isinstance(order, str) else list(order)
    by_l, order_l, k_l = list(by), list(order), int(k)

    def _local_topk(batches):
        import pandas as pd

        buf = None
        for pdf in batches:
            buf = (
                pdf
                if buf is None
                else pd.concat([buf, pdf], ignore_index=True)
            )
            buf = buf.sort_values(
                order_l, kind="mergesort", ignore_index=True
            )
            buf = (
                buf.groupby(by_l, sort=False).head(k_l)
                if by_l
                else buf.head(k_l)
            )
        if buf is not None:
            yield buf

    local = df.mapInPandas(_local_topk, schema=df.schema)
    w2 = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    return (
        local.withColumn("rk", F.row_number().over(w2.orderBy(*order)))
        .where(F.col("rk") <= k)
    )


def kmv_sketch(
    df: DataFrame, key: str, k: int = 64, by: list[str] | None = None
) -> DataFrame:
    """Build the KMV distinct sketch of ``key`` (per ``by`` group):
    the k smallest portable hashes of the distinct keys. Columns:
    (*by, h, rk). The distinct() is one map-side-combined shuffle on
    (group, hash); everything after runs on ≤ k rows per group per
    partition."""
    by = by or []
    hashed = df.select(
        *by, portable_hash60(key).alias("h")
    ).distinct()
    return bottom_k(hashed, k, by=by)


def kmv_merge(
    sketches: DataFrame, k: int, by: list[str] | None = None
) -> DataFrame:
    """Merge sketches (a union of kmv_sketch outputs, possibly from
    different segments/partitions/days): distinct hash values, keep
    the k smallest. Input is ≤ k rows per source sketch — merging
    never touches raw data, which is the entire point."""
    return bottom_k(
        sketches.select(*(by or []), "h").distinct(), k, by=by
    )


def kmv_estimate(
    sketch: DataFrame, k: int, by: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch relation:
    exact row count when the sketch holds fewer than k values (it then
    holds ALL distinct hashes), else (k-1) * M / h_(k). Both branches
    are single IEEE-double operations on exactly-represented integers,
    so the estimate is bit-identical across engines."""
    by = by or []
    agg = sketch.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH60_M) / F.col("kth_hash")
    )
    return agg.withColumn("est_distinct", est)


def bottomk_sample(
    df: DataFrame,
    k: int,
    id_col,
    keep: list[str],
    by: list[str] | None = None,
) -> DataFrame:
    """Deterministic uniform sample: the k rows whose row-identity
    hash (``portable_hash60(id_col)``) is smallest, carrying ``keep``
    columns. This is the mergeable bottom-k sample (Cohen & Kaplan):
    because membership depends only on the row's own hash,
    bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — exactly
    the property a KLL/GK quantile summary needs from its compactors,
    here in its simplest deterministic form. Quantiles read off the
    sample are within O(1/sqrt(k)) of the population's; the tradeoff
    vs KLL (which gets O(1/k) for the same space) is bought with exact
    cross-engine reproducibility. ``keep`` columns double as the rank
    tiebreak after the hash, so hash ties across distinct rows cannot
    make two engines keep different rows."""
    hashed = df.select(
        *(by or []), *keep, portable_hash60(id_col).alias("h")
    )
    return bottom_k(hashed, k, by=by, order=["h", *keep])

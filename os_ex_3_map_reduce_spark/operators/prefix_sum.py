"""Distributed prefix sum (scan) and PPS systematic sampling.

A global running total over an ordered 100 TB relation cannot be one
window — ``Window.orderBy(...)`` with no partition key collapses to a
single task. The classic fix is the two-level scan, expressed here in
pure DataFrame operations:

1. **Local pass**: order-preserving range buckets (``key div width``),
   per-bucket running sums via a *partitioned* window — every bucket
   scans in parallel.
2. **Bucket pass**: one tiny relation of per-bucket totals (N/width
   rows) gets its own running sum; for a table where even that tier is
   big, the same construction nests (three-level scan) — noted, not
   needed at any plausible bucket count.
3. **Recombine**: broadcast-join each bucket's *exclusive* offset back
   and add the local running sum.

The result is the exact global prefix sum with no single-task stage
over the data.

On top of it: **weighted systematic sampling** (probability
proportional to size — the corpus-subsampling strategy where a
document's chance of selection is proportional to its token count).
With integer weights, stride ``s = total div k``, a document owning
cumulative interval ``(cum - w, cum]`` is selected iff the interval
crosses a stride boundary: ``cum div s > (cum - w) div s`` — all
truncating bigint arithmetic, so selection is exactly reproducible
(and exactly oracle-able). Items with ``w >= s`` are certainty units:
selected at least once, as PPS prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prefix_sums(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    bucket_width: int = 256,
) -> DataFrame:
    """Add ``cum_{c}`` = exact inclusive prefix sum of each value column
    in ``order_col`` order, via ONE two-level scan shared by all
    columns. ``order_col`` must be an integer key; values sum in
    bigint."""
    bucketed = df.withColumn(
        "__bkt", F.expr(f"cast({order_col} as bigint) div {bucket_width}")
    )
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed
    for c in value_cols:
        local = local.withColumn(
            f"__local_{c}", F.sum(F.col(c).cast("long")).over(w_local)
        )
    totals = bucketed.groupBy("__bkt").agg(
        *[F.sum(F.col(c).cast("long")).alias(f"__tot_{c}") for c in value_cols]
    )
    # tier 2: tiny (one row per bucket) — a plain ordered window here is
    # fine; nest the same construction if this tier ever gets big
    w_bkt = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals
    for c in value_cols:
        offsets = offsets.withColumn(
            f"__off_{c}", F.sum(f"__tot_{c}").over(w_bkt) - F.col(f"__tot_{c}")
        )
    offsets = offsets.select("__bkt", *[f"__off_{c}" for c in value_cols])
    out = local.join(F.broadcast(offsets), "__bkt")
    for c in value_cols:
        out = out.withColumn(f"cum_{c}", F.col(f"__off_{c}") + F.col(f"__local_{c}"))
    drop = ["__bkt"] + [f"__local_{c}" for c in value_cols] + [f"__off_{c}" for c in value_cols]
    return out.drop(*drop)


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_width: int = 256,
) -> DataFrame:
    """Single-column :func:`prefix_sums`, with the sum named ``cum``."""
    return prefix_sums(df, order_col, [value_col], bucket_width).withColumnRenamed(
        f"cum_{value_col}", "cum"
    )


def pps_systematic_sample(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    k: int,
    bucket_width: int = 256,
) -> DataFrame:
    """Select ~``k`` rows with probability proportional to
    ``weight_col`` via stride sampling over the exact prefix sum.
    Deterministic: same input → same sample, on any cluster layout.

    Degenerate inputs: when the total weight is below ``k`` (including
    an empty input, where the total aggregates to NULL) the raw stride
    ``t div k`` would be 0 and the selection predicate would divide by
    zero — a hard ANSI-mode runtime error. The stride is therefore
    clamped to ``greatest(1, t div k)``: with stride 1 every
    positive-weight row is a certainty unit (selected), the only
    consistent PPS reading of "asked for more sample mass than
    exists" (ADVICE r7)."""
    if k <= 0:
        raise ValueError(f"pps_systematic_sample: k must be positive, got {k}")
    with_cum = prefix_sum(df, order_col, weight_col, bucket_width)
    total = with_cum.agg(F.sum(F.col(weight_col).cast("long")).alias("t"))
    return (
        with_cum.crossJoin(F.broadcast(total))
        .withColumn("__s", F.expr(f"greatest(1, t div {k})"))
        .where(
            F.expr(f"cum div __s > (cum - cast({weight_col} as bigint)) div __s")
        )
        .drop("t", "__s")
    )

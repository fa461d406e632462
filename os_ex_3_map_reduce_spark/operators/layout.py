"""Data-layout clustering: Z-order (Morton) interleaving for
multi-dimensional data skipping.

The reference engine has no storage layout at all (its input is an
in-memory vector, SURVEY.md R1); this module is part of the mandated
scale surface: at 100 TB the dominant cost is the scan, and the scan is
only cheap if file-level min/max statistics (parquet footers, a lake
format's zone maps) let the planner skip files. Sorting by one column
clusters that column only; Z-ordering interleaves the bits of several
columns so *every* interleaved dimension gets locality, and a predicate
on any of them prunes files.

Design notes for the 100 TB path:

- The Z-value is a pure JVM expression (shift/mask/or over integer
  bucket indices) — computed inside whole-stage codegen, no Python.
- Bucket indices come from per-dimension global min/max, computed in
  one tiny agg job and attached with a broadcast cross join (one row);
  the data pass itself is scan → project → (optional) range partition.
- ``zorder_write`` lays files out with ``repartitionByRange(z)`` so
  each output file covers a contiguous Z range = a small hyper-rectangle
  in dimension space. ``repartitionByRange`` samples to find balanced
  split points — the layout is size-balanced even under skew, at the
  cost of sampling nondeterminism in *file assignment* (file contents
  overlap at boundaries only; the zone-map evidence test measures the
  span shrink, which is robust to that).
- 4 bits/dimension (16 buckets) by default: with 2 dims that is 256
  cells; plenty for file-level skipping where files-per-table is
  10^3..10^5. More bits sharpen pruning but shrink per-cell row counts;
  the classic guidance is bits ≈ log2(number of files) / n_dims.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 4
) -> tuple[DataFrame, Column]:
    """Attach integer bucket indices and the interleaved Z-value.

    Returns ``(df_with_bounds, z_column)`` where ``df_with_bounds``
    carries broadcast-joined per-dimension global ``__min_{c}`` /
    ``__max_{c}`` columns and ``z_column`` is the Morton code (bigint).
    All arithmetic is integer and JVM-side.
    """
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(bounds))
    n_buckets = 1 << bits
    z = F.lit(0).cast("long")
    for dim, c in enumerate(cols):
        # floor((x - lo) * n / (hi - lo + 1)); operands are non-negative
        # after the shift so `div` (exact bigint integer division — NOT
        # `/`, which promotes to double and rounds above 2^53, i.e. at
        # real 10^17-scale surrogate keys) equals floor.
        idx = F.expr(
            f"((cast({c} as bigint) - __min_{c}) * {n_buckets}) "
            f"div (__max_{c} - __min_{c} + 1)"
        )
        # guard degenerate hi==lo and clamp to [0, n_buckets)
        idx = F.least(F.greatest(idx, F.lit(0)), F.lit(n_buckets - 1))
        for bit in range(bits):
            # bit i of dim d lands at position i*n_dims + (n_dims-1-d):
            # round-robin interleave, dim 0 most significant within each
            # bit group (the standard Morton layout).
            pos = bit * len(cols) + (len(cols) - 1 - dim)
            z = z + F.shiftleft(
                F.shiftrightunsigned(idx, bit).bitwiseAND(F.lit(1)), pos
            )
    return out, z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 4,
    keep_z_col: str | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    ``repartitionByRange`` on the Z-value gives each task (→ file) a
    contiguous Z range; ``sortWithinPartitions`` makes parquet row-group
    stats monotone within the file as well. Downstream scans with a
    predicate on ANY of ``cols`` skip most files via footer min/max.

    ``keep_z_col``: persist the Morton code in the written table under
    this name. A maintenance pass later re-compacting the table passes
    exactly this column as ``compact_table(cluster_by=[...])`` — range
    on the persisted Z IS Morton order, whereas range on the raw dims
    would be lexicographic and quietly trade the multi-dim locality for
    single-dim locality. (Measured survival evidence in
    tests/test_io.py::test_compact_preserves_zorder_clustering and
    PLANS.md.)
    """
    with_bounds, z = zorder_value(df, cols, bits=bits)
    drop = [c for c in with_bounds.columns if c.startswith("__min_") or c.startswith("__max_")]
    zname = keep_z_col or "__z"
    staged = (
        with_bounds.withColumn(zname, z)
        .drop(*drop)
        .repartitionByRange(n_files, zname)
        .sortWithinPartitions(zname)
    )
    if keep_z_col is None:
        staged = staged.drop(zname)
    staged.write.mode("overwrite").parquet(path)


def file_zone_maps(path: str, cols: list[str]) -> list[dict]:
    """Read per-file min/max stats for ``cols`` straight from parquet
    footers (what a lake planner consults for skipping) — no data read.
    Evidence helper for tests/benchmarks, runs on the driver over file
    *metadata* only.
    """
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, name)).metadata
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(meta.num_row_groups):
            group = meta.row_group(rg)
            for i in range(group.num_columns):
                col = group.column(i)
                cname = col.path_in_schema
                if cname in cols and col.statistics is not None:
                    st = col.statistics
                    lo[cname] = min(lo.get(cname, st.min), st.min)
                    hi[cname] = max(hi.get(cname, st.max), st.max)
        if lo:
            out.append(
                {"file": name, **{f"min_{c}": lo[c] for c in lo}, **{f"max_{c}": hi[c] for c in hi}}
            )
    return out


def hilbert_d_table(bits: int = 4) -> list[int]:
    """cell -> Hilbert-curve distance for the 2^bits x 2^bits grid
    (the public xy->d bit algorithm, unrolled driver-side once);
    ``cell = ix * 2^bits + iy``. The table is a 256-entry constant for
    the default 4 bits — small enough to ship as a literal array into
    whole-stage codegen AND as a VALUES lookup table into the oracle,
    so BOTH engines share the identical mapping by construction (an
    exact oracle, not a pin)."""
    n = 1 << bits
    out = []
    for x0 in range(n):
        for y0 in range(n):
            x, y, d = x0, y0, 0
            s = n // 2
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                if ry == 0:
                    if rx == 1:
                        x = s - 1 - x
                        y = s - 1 - y
                    x, y = y, x
                s //= 2
            out.append(d)
    return out


def hilbert_value(
    df: DataFrame, cols: list[str], bits: int = 4
) -> tuple[DataFrame, Column]:
    """Attach integer bucket indices and the HILBERT distance — the
    space-filling-curve alternative to :func:`zorder_value` with
    strictly better locality (every consecutive pair of Hilbert cells
    is grid-adjacent; Morton jumps at power-of-two boundaries).
    Bucketing arithmetic is shared with Z-order; the curve mapping is
    a 2^(2*bits)-entry literal-array lookup, still fully JVM-side.
    2-D only (the classic d2xy construction); for 3+ dims compose with
    Morton on the remaining dims or raise ``bits``."""
    if len(cols) != 2:
        raise ValueError("hilbert_value: exactly 2 cluster columns")
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(bounds))
    n_buckets = 1 << bits
    idxs = []
    for c in cols:
        idx = F.expr(
            f"((cast({c} as bigint) - __min_{c}) * {n_buckets}) "
            f"div (__max_{c} - __min_{c} + 1)"
        )
        idxs.append(
            F.least(F.greatest(idx, F.lit(0)), F.lit(n_buckets - 1))
        )
    table = hilbert_d_table(bits)
    cell = idxs[0] * n_buckets + idxs[1]
    h = F.element_at(
        F.array(*[F.lit(int(v)) for v in table]), (cell + 1).cast("int")
    ).cast("long")
    return out, h


def hilbert3_d_table(bits: int = 3) -> list[int]:
    """cell -> Hilbert-curve distance for the 2^bits cube;
    ``cell = (ix * 2^bits + iy) * 2^bits + iz``. The n-dimensional
    construction is Skilling's public transpose transform
    ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004) —
    unlike the classic 2-D d2xy loop it generalizes to any dimension,
    which is what a 3-column clustering key needs. Unrolled
    driver-side once into a 512-entry constant for the default 3
    bits/dim — shipped as a literal array to codegen AND as a VALUES
    table to the oracle, the same shared-constant discipline as the
    2-D table (exact oracle, not a pin). Bijection and the Hilbert
    unit-step property (consecutive distances are grid-adjacent in
    exactly one axis) are asserted in tests for every (bits, dims)
    shipped."""
    ndim = 3
    n = 1 << bits

    def axes_to_d(coords: tuple[int, ...]) -> int:
        X = list(coords)
        M = 1 << (bits - 1)
        # inverse undo excess work
        q = M
        while q > 1:
            p = q - 1
            for i in range(ndim):
                if X[i] & q:
                    X[0] ^= p
                else:
                    t = (X[0] ^ X[i]) & p
                    X[0] ^= t
                    X[i] ^= t
            q >>= 1
        # Gray encode
        for i in range(1, ndim):
            X[i] ^= X[i - 1]
        t = 0
        q = M
        while q > 1:
            if X[ndim - 1] & q:
                t ^= q - 1
            q >>= 1
        for i in range(ndim):
            X[i] ^= t
        # transpose -> scalar distance (MSB-first round-robin)
        d = 0
        for j in range(bits - 1, -1, -1):
            for i in range(ndim):
                d = (d << 1) | ((X[i] >> j) & 1)
        return d

    return [
        axes_to_d((x, y, z))
        for x in range(n)
        for y in range(n)
        for z in range(n)
    ]


def hilbert3_value(
    df: DataFrame, cols: list[str], bits: int = 3
) -> tuple[DataFrame, Column]:
    """Three-dimensional Hilbert clustering value — the layout for a
    THREE-column clustering key (e.g. order x part x supplier), where
    composing 2-D Hilbert with Morton on the third dim would reopen
    exactly the power-of-two jumps Hilbert exists to remove. Same
    integer bucketing as :func:`zorder_value`; the curve mapping is a
    2^(3*bits)-entry literal-array lookup, fully JVM-side."""
    if len(cols) != 3:
        raise ValueError("hilbert3_value: exactly 3 cluster columns")
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"__max_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(bounds))
    n_buckets = 1 << bits
    idxs = []
    for c in cols:
        idx = F.expr(
            f"((cast({c} as bigint) - __min_{c}) * {n_buckets}) "
            f"div (__max_{c} - __min_{c} + 1)"
        )
        idxs.append(
            F.least(F.greatest(idx, F.lit(0)), F.lit(n_buckets - 1))
        )
    table = hilbert3_d_table(bits)
    cell = (idxs[0] * n_buckets + idxs[1]) * n_buckets + idxs[2]
    h = F.element_at(
        F.array(*[F.lit(int(v)) for v in table]), (cell + 1).cast("int")
    ).cast("long")
    return out, h

"""Generic source/sink surface beyond the fixture parquet tables.

The reference has no storage formats at all — its source is an
in-memory vector and its sink a shared output vector [SURVEY.md R1/R8].
An engine that replaces it needs real connectors; these wrappers add
the format breadth (csv, json-lines, orc, parquet) with the scale
knobs applied consistently:

- **Explicit schemas on read.** Schema inference is a full extra pass
  over the data (fatal at 100 TB) and type-unstable between runs; all
  readers here take a DDL schema string or StructType. (CSV/JSON
  inference is still *available* via ``infer_schema=True`` for
  exploration, default off.)
- **Partitioned writes.** ``write_table`` exposes ``partition_by``
  (hive-style directory partitioning → partition pruning on read) and
  ``bucket_by`` (pre-shuffled, sorted buckets → shuffle-free joins and
  aggregations on the bucket key for catalog tables).
- **maxRecordsPerFile** guards against the giant-output-file problem
  on skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import ensure_session_confs

_READERS = ("parquet", "orc", "json", "csv")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | StructType | None = None,
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt`` with an explicit schema (preferred).

    CSV defaults: header on. JSON means json-lines (one object per
    line — the only JSON shape that splits across workers).
    """
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_READERS}")
    ensure_session_confs(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json") and not infer_schema:
        raise ValueError(
            f"{fmt} reads require an explicit schema (schema inference "
            "is a full extra data pass; pass infer_schema=True to allow)"
        )
    elif fmt == "csv" and infer_schema:
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
    max_records_per_file: int | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path``.

    ``partition_by``: hive-style directory partitioning (readers prune
    on these columns). ``bucket_by=(n, cols)`` requires ``table_name``
    (bucketing metadata lives in the catalog via saveAsTable); bucketed
    tables join/aggregate on the bucket key without a shuffle.
    """
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, cols = bucket_by
        if table_name is None:
            raise ValueError("bucket_by requires table_name (saveAsTable)")
        writer.option("path", path).bucketBy(n, *cols).sortBy(*cols).saveAsTable(
            table_name
        )
        return
    writer.save(path)


def compact_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    schema: str | StructType | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Small-files compaction — the table-maintenance pass every
    long-running ingestion pipeline needs: streaming/batch appends leave
    thousands of tiny files, and at 100 TB the resulting task/seek/
    footer overhead dominates scan cost.

    Rewrites ``path`` into ``ceil(total_bytes / target_file_bytes)``
    files and returns that file count. The rewrite stages into a
    sibling directory and swaps last (a crashed compaction must never
    destroy the live table — readers see old or new, nothing in
    between; on object stores the swap is the storage layer's atomic
    rename/commit). Sizing reads the filesystem listing only — never
    the data — and the single data pass is a coalesce-shaped
    repartition write.

    For a hive-partitioned table pass ``partition_by`` (the same
    columns it was written with) — the rewrite then repartitions on
    those columns and keeps the directory layout, targeting the file
    count per partition via ``maxRecordsPerFile`` semantics of the
    repartition; omitting it would silently flatten the layout and
    lose partition pruning for every future read.
    """
    import math
    import shutil
    from pathlib import Path

    p = Path(path)
    total = sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = read_table(spark, path, fmt, schema=schema)
    staged = p.with_name(p.name + ".compact-staging")
    if partition_by:
        from pyspark.sql import functions as F

        reparted = df.repartition(n_files, *[F.col(c) for c in partition_by])
        write_table(reparted, str(staged), fmt, partition_by=partition_by)
    else:
        write_table(df.repartition(n_files), str(staged), fmt)
    backup = p.with_name(p.name + ".compact-old")
    p.rename(backup)
    staged.rename(p)
    shutil.rmtree(backup)
    return n_files

"""Parquet table sources for the fixture star schema.

The reference's only source is an in-memory ``InputVec`` of opaque
(K1*, V1*) pairs [R:MapReduceClient.h, SURVEY.md R1]; splitting work
across threads is an atomic counter. Here the source is a columnar
parquet scan: Spark's scheduler owns the splits, Catalyst pushes
filters/projections into the scan, and the same code addresses one
file or a 100 TB partitioned lake.

Fixture gotchas handled here (FIXTURES.md):
- ``events.ts`` has DRIFTED across fixture generations: parquet
  TIMESTAMP(NANOS) (arriving as int64 nanos under ``nanosAsLong``) in
  early rounds, plain ``timestamp[us]`` (arriving as TIMESTAMP_NTZ)
  since round 4. :func:`event_time_expr` adapts to whatever dtype the
  file serves, so every downstream plan reads the derived ``ts_utc``
  and never touches raw ``ts``. (For the nanos case: integer division,
  NOT ``/`` — float promotion loses precision above 2^53, and epoch
  nanos in 2024 are ~1.7e18.)
- ``events.props`` is a JSON string, parsed on demand by queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_confs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tiny dimension tables — always broadcast-join these (at any scale
#: factor they stay KB-to-MB sized; at 100 TB the facts grow, not these).
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def event_time_expr(df: DataFrame) -> Column:
    """TIMESTAMP event-time from whatever dtype ``ts`` arrives in.

    The fixture has mutated once already (int64-nanos → timestamp[us],
    the round-4/5 regression that broke 19 queries); this helper is the
    single place that absorbs the next mutation. Handles:

    - ``bigint``: epoch nanos via ``nanosAsLong`` → integer-divide to
      µs (never ``/``: double promotion corrupts >2^53 nanos).
    - ``timestamp`` / ``timestamp_ntz``: cast to session-TZ timestamp —
      a wall-clock no-op because the session TZ is pinned UTC.
    - ``string``: ISO parse.

    Works on batch and streaming DataFrames alike (``df.dtypes`` is
    analysis-time metadata, no job is run).
    """
    dt = dict(df.dtypes).get("ts")
    if dt in ("bigint", "long"):
        return F.timestamp_micros(F.expr("ts div 1000").cast("long"))
    if dt == "string":
        return F.to_timestamp("ts")
    return F.col("ts").cast("timestamp")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan)."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalized event-time column alongside the raw ts.
        df = df.withColumn("ts_utc", event_time_expr(df))
    return df


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact table row count from parquet FOOTER metadata — no Spark
    job, no scan. Used by plans that size an algorithm from the corpus
    count (e.g. lsh_auto_geometry): a ``df.count()`` there would
    recompute the full upstream lineage inside timed queries (ADVICE
    r12), while the footer read is O(file-metadata) at any scale."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

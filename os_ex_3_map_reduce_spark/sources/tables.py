"""Parquet table sources for the fixture star schema.

The reference's only source is an in-memory ``InputVec`` of opaque
(K1*, V1*) pairs [R:MapReduceClient.h, SURVEY.md R1]; splitting work
across threads is an atomic counter. Here the source is a columnar
parquet scan: Spark's scheduler owns the splits, Catalyst pushes
filters/projections into the scan, and the same code addresses one
file or a 100 TB partitioned lake.

Fixture gotchas handled here (FIXTURES.md):
- ``events.ts`` is parquet TIMESTAMP(NANOS) → read as int64 nanos
  (``nanosAsLong``) and normalized via integer division (NOT ``/``,
  which promotes to double and loses precision above 2^53 — epoch
  nanos in 2024 are ~1.7e18).
- ``events.props`` is a JSON string, parsed on demand by queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan)."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalized event-time column alongside the raw nanos.
        df = df.withColumn(
            "ts_utc",
            F.timestamp_micros(F.expr("ts div 1000").cast("long")),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Fixture-drift canaries.

The events fixture mutated once already (parquet TIMESTAMP(NANOS) in
rounds 1-3 → timestamp[us] since round 4), silently breaking every
plan that touched raw ``ts``. These tests pin the contract that
survives the NEXT mutation: ``event_time_expr`` must build the same
``ts_utc`` from any dtype the fixture may serve, and ``load_table``
must produce a queryable event-time column from whatever is on disk.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from os_ex_3_map_reduce_spark.sources.tables import event_time_expr, load_table

SF = "/root/testdata/sf0.001"

# One instant, three encodings: 2024-03-01 12:34:56.789012 UTC.
_UTC = datetime.timezone.utc
_INSTANT = datetime.datetime(2024, 3, 1, 12, 34, 56, 789012, tzinfo=_UTC)
_NANOS = int(_INSTANT.timestamp() * 1_000_000) * 1000
_ISO = "2024-03-01 12:34:56.789012"


def _utc_value(df):
    [row] = df.select(event_time_expr(df).alias("ts_utc")).collect()
    return row.ts_utc.astimezone(_UTC) if row.ts_utc.tzinfo else row.ts_utc


def test_event_time_expr_all_dtypes_agree(spark):
    """long-nanos, timestamp_ntz, and string encodings of one instant
    must all produce the identical ts_utc."""
    as_long = spark.createDataFrame(
        [(_NANOS,)], StructType([StructField("ts", LongType())])
    )
    as_ntz = spark.createDataFrame(
        [(_INSTANT.replace(tzinfo=None),)],
        StructType([StructField("ts", TimestampNTZType())]),
    )
    as_str = spark.createDataFrame(
        [(_ISO,)], StructType([StructField("ts", StringType())])
    )
    got = {name: _utc_value(df) for name, df in
           [("long", as_long), ("ntz", as_ntz), ("str", as_str)]}
    expect = _INSTANT.replace(tzinfo=None)
    for name, val in got.items():
        naive = val.replace(tzinfo=None)
        assert naive == expect, f"{name}: {naive} != {expect}"


def test_load_table_builds_queryable_ts_utc(spark):
    """Whatever dtype the on-disk fixture serves today, load_table must
    yield a timestamp-typed ts_utc that supports interval arithmetic
    and windowing — the two operations the 19 broken queries needed."""
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts_utc"] == "timestamp"
    n = (
        ev.select(
            F.window("ts_utc", "1 hour").alias("w"),
            (F.col("ts_utc") + F.expr("INTERVAL 5 MINUTES")).alias("later"),
        )
        .where(F.col("later") > F.col("w.start"))
        .count()
    )
    assert n == ev.count()


def test_events_time_range_sane(spark):
    """The fixture's event times must still be in the documented range
    (monotone-ish starting 2024-01-01): catches a silent unit slip
    (s/ms/µs/ns confusion) that dtype checks alone would miss."""
    ev = load_table(spark, SF, "events")
    lo, hi = ev.agg(F.min("ts_utc"), F.max("ts_utc")).first()
    assert lo.year >= 2023, lo
    assert hi.year <= 2030, hi
    assert lo <= hi


def test_order_and_ship_dates_dtype_and_range(spark):
    """l_shipdate / o_orderdate are the same silent-mutation risk class
    as events.ts (parquet TIMESTAMP served as timestamp_ntz today, and
    ~40 oracles compare them against TIMESTAMP literals / strftime
    them). Pin the dtype EXACTLY — any drift (date, string, nanos-long)
    must fail this canary loudly, not surface as 40 hash mismatches in
    the round's CORRECTNESS file — plus the value-level contract the
    plans rely on: string-literal comparison and date_trunc."""
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    assert dict(li.dtypes)["l_shipdate"] == "timestamp_ntz", li.dtypes
    assert dict(orders.dtypes)["o_orderdate"] == "timestamp_ntz", orders.dtypes
    # value contract: sane TPC-H-ish range, literal comparison works
    lo, hi = orders.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    assert 1992 <= lo.year <= hi.year <= 2005, (lo, hi)
    n_before = orders.where(F.col("o_orderdate") < "1998-06-01").count()
    assert 0 < n_before < orders.count()
    # date_trunc must stay timestamp-typed (rollup/gapfill rely on it)
    trunc_type = dict(
        orders.select(
            F.date_trunc("month", "o_orderdate").alias("m")
        ).dtypes
    )["m"]
    assert trunc_type in ("timestamp", "timestamp_ntz"), trunc_type


def test_events_props_stays_json_string(spark):
    """events.props is a STRING column holding a JSON object (the
    variant/json-extraction queries parse it with get_json_object /
    from_json). If the fixture ever serves it pre-parsed (struct/map)
    or reshapes the payload, fail here first."""
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["props"] == "string", ev.dtypes
    parsed = ev.select(
        F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    n_null = parsed.where(F.col("k").isNull()).count()
    assert n_null == 0, f"{n_null} rows failed JSON key extraction"

"""Exact-boundary micro-pins for every threshold rule whose Spark
MECHANISM differs from its oracle's SQL rule.

Round-15 lesson (the session_window gap-boundary class, latent 14
rounds): fixture sweeps cannot catch boundary semantics on continuous
domains — microsecond timestamps never land exactly ON a window edge,
a gap, or an as-of instant, so an engine pair can agree on every
fixture row while disagreeing at the boundary. Each test here replays
the literal boundary case through BOTH the Spark mechanism the catalog
query uses and the DuckDB rule its oracle spells, and asserts they
agree. Same-rule surfaces (both sides evaluating one shared SQL
predicate on identical data) need no pin — only divergent-mechanism
surfaces are listed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_asof_join_matches_at_exact_instant(spark, duck):
    """q_join_asof: a signup at EXACTLY the purchase instant must match
    (b.t <= a.t is inclusive in DuckDB ASOF; the union+window mechanism
    realizes it by sorting tag 0 before tag 1 at equal t). Also: a
    signup 1 us after must NOT match."""
    us = int(BASE.timestamp() * 1_000_000)
    # (user, t_us, tag 0=signup 1=purchase, event_id)
    rows = [
        (1, us, 0, None),  # signup exactly at purchase time -> match
        (1, us, 1, 100),
        (2, us + 1, 0, None),  # signup 1 us AFTER purchase -> no match
        (2, us, 1, 200),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, t long, tag int, event_id long"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    signup_t = F.last(
        F.when(F.col("tag") == 0, F.col("t")), ignorenulls=True
    ).over(w)
    got = {
        r.event_id: r.signup_us
        for r in df.withColumn("signup_us", signup_t)
        .filter(F.col("tag") == 1)
        .select("event_id", "signup_us")
        .collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""
            WITH sign(user_id, t) AS (VALUES (1, {us}), (2, {us + 1})),
                 purch(event_id, user_id, t) AS
                     (VALUES (100, 1, {us}), (200, 2, {us}))
            SELECT a.event_id, b.t
            FROM purch a ASOF LEFT JOIN sign b
              ON a.user_id = b.user_id AND b.t <= a.t
            """
        ).fetchall()
    }
    assert got == want == {100: us, 200: None}


def test_tumbling_window_boundary_event_in_next_bucket(spark, duck):
    """F.window vs time_bucket: an event exactly ON the hour belongs to
    the STARTING bucket in both engines ([start, end) half-open), and
    one 1 us before belongs to the previous bucket."""
    rows = [(1, BASE), (2, BASE - dt.timedelta(microseconds=1))]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    got = {
        r.k: r.b
        for r in df.select(
            "k",
            F.date_format(
                F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("b"),
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.execute(
            """
            SELECT k, strftime(time_bucket(INTERVAL '1 hour', ts),
                               '%Y-%m-%d %H:%M:%S')
            FROM (VALUES (1, TIMESTAMP '2024-01-01 12:00:00'),
                         (2, TIMESTAMP '2024-01-01 11:59:59.999999'))
                 t(k, ts)
            """
        ).fetchall()
    }
    assert got == want
    assert got[1] == "2024-01-01 12:00:00" and got[2] == "2024-01-01 11:00:00"


def test_sliding_window_boundary_event_in_exactly_two_windows(spark):
    """q_stream_sliding's oracle materializes each event in exactly two
    30-min-slid 1-hour windows; an event exactly ON a slide boundary
    must still land in exactly two ([start, end) half-open on both the
    window start and end side)."""
    df = spark.createDataFrame([(1, BASE)], "k long, ts timestamp")
    wins = (
        df.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .count()
        .select(F.date_format("w.start", "HH:mm").alias("s"))
    )
    starts = sorted(r.s for r in wins.collect())
    # ts = 12:00:00 exactly: windows [11:30, 12:30) and [12:00, 13:00)
    # — NOT [12:30, ...), NOT three windows
    assert starts == ["11:30", "12:00"]


def test_range_frame_bound_inclusive_at_exact_distance(spark, duck):
    """q_window_range_frame: RANGE BETWEEN 10000 PRECEDING AND CURRENT
    ROW must include a row at EXACTLY 10000 below the current value in
    both engines (RANGE bounds are inclusive)."""
    rows = [(1, 0), (2, 10000), (3, 10001)]
    df = spark.createDataFrame(rows, "k long, v long")
    w = (
        Window.orderBy("v").rangeBetween(-10000, 0)
    )
    got = {r.k: r.n for r in df.select("k", F.count("*").over(w).alias("n")).collect()}
    want = {
        r[0]: r[1]
        for r in duck.execute(
            """
            SELECT k, count(*) OVER (ORDER BY v
                       RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
            FROM (VALUES (1, 0), (2, 10000), (3, 10001)) t(k, v)
            """
        ).fetchall()
    }
    assert got == want
    # v=10000 sees v=0 (distance exactly 10000: inclusive);
    # v=10001 does NOT see v=0 (distance 10001) but sees v=10000
    assert got == {1: 1, 2: 2, 3: 2}


def test_interval_join_bounds_strict_and_inclusive(spark, duck):
    """q_stream_join's rule (b.ts > a.ts AND b.ts <= a.ts + 5 min):
    a follow-up at EXACTLY +5 min matches, one at exactly +0 does not
    — evaluated through Spark's join operator and DuckDB's, not just
    one shared predicate string."""
    us = int(BASE.timestamp() * 1_000_000)
    five = 5 * 60 * 1_000_000
    a = spark.createDataFrame([(1, us)], "a_id long, a_t long")
    b = spark.createDataFrame(
        [(10, us), (11, us + five), (12, us + five + 1)],
        "b_id long, b_t long",
    )
    got = sorted(
        r.b_id
        for r in a.join(
            b,
            (F.col("b_t") > F.col("a_t"))
            & (F.col("b_t") <= F.col("a_t") + five),
        ).collect()
    )
    want = sorted(
        r[0]
        for r in duck.execute(
            f"""
            SELECT b_id
            FROM (VALUES (1, {us})) a(a_id, a_t)
            JOIN (VALUES (10, {us}), (11, {us + five}),
                         (12, {us + five + 1})) b(b_id, b_t)
              ON b_t > a_t AND b_t <= a_t + {five}
            """
        ).fetchall()
    )
    assert got == want == [11]

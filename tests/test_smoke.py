"""t1-equivalent smoke: entry() runs on sf0.001 and yields rows."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"w", "cnt"}
    # flagship is a top-10 with total tiebreak → exactly 10 deterministic rows
    assert len(rows) == 10


def test_sql_frontend_matches_dataframe_plans(spark):
    """register_views + spark.sql is a first-class way to drive the
    engine: SQL text over the fixture views must equal the DataFrame
    catalog plans."""
    from os_ex_3_map_reduce_spark.plans import all_queries
    from os_ex_3_map_reduce_spark.sources.tables import register_views

    from .conftest import SF_CORRECT

    register_views(spark, SF_CORRECT)
    sql = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
                   AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    df = all_queries()["q_join_broadcast"](spark, SF_CORRECT)
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_frontend_supports_recursive_cte(spark):
    """Spark 4.1's WITH RECURSIVE works through the engine's SQL
    front-end (acyclic recursion, UNION ALL). Deliberately NOT a
    catalog query: row-per-level recursion executes as a driver-paced
    loop (cteRecursionLevelLimit default 100), so dense spines are
    generated distributively via sequence()+explode instead
    (q_time_gapfill); this test records the capability and its limits."""
    out = spark.sql(
        """
        WITH RECURSIVE fib(n, a, b) AS (
            SELECT 1, 0L, 1L
            UNION ALL
            SELECT n + 1, b, a + b FROM fib WHERE n < 20
        )
        SELECT MAX(b) AS f20 FROM fib
        """
    ).first()
    assert out.f20 == 6765

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

"""Correlated-subquery / decorrelation family (SURVEY.md §2.3 E6 depth).

The reference has no subquery surface at all — a correlated lookup is
"run another MapReduce job per key" in its model. On Spark the same
semantics are DECLARED (scalar subqueries, IN + HAVING, EXISTS /
NOT EXISTS) and Catalyst's decorrelation rules
(``RewriteCorrelatedScalarSubquery``, ``RewritePredicateSubquery``)
rewrite them into the aggregate-then-join plans a MapReduce programmer
would hand-build — so these five queries are the engine-capability demo
that the *optimizer*, not the user, owns the rewrite.

Shapes follow the five TPC-H queries whose point is subquery planning,
adapted to the fixture schema (no partsupp / receiptdate / c_phone):

- Q13: outer join with an ON-clause (not WHERE) filter + double agg.
- Q17: correlated scalar aggregate on the same fact table.
- Q18: IN subquery whose body is a grouped HAVING.
- Q21: EXISTS and NOT EXISTS against the same derived relation.
- Q22: uncorrelated scalar gate + anti-join NOT EXISTS.

Determinism: quantities are integral doubles (1..50) so BIGINT casts
are exact; money sums go through the DECIMAL(18,4) discipline; the Q17
"below half the per-part average" predicate is cross-multiplied to
``2*qty*cnt < sum`` so no engine ever divides; the Q22 scalar average
is one IEEE divide of an exact decimal sum by an exact count, which
both engines compute bit-identically.

Scale notes (100 TB): every decorrelated plan here shuffles the fact
table at most twice on the same key (the per-key aggregate and the
join back), which is the lower bound for the semantics; the Q21
EXISTS pair collapses to ONE extra shuffle because both subqueries
group on ``l_orderkey``. Nothing is driver-side; the only broadcasts
are the supplier/customer/part dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register
from .relational import _SQL_REV, dec, _rev

# Spark SQL accepts the same CAST(... AS DECIMAL(18,4)) spelling DuckDB
# does, so the revenue term string is shared verbatim by both engines.


@register(
    "q_cust_order_distribution",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT "
    "OUTER join where the priority filter lives in the JOIN "
    "CONDITION, not WHERE — moving it to WHERE would silently drop "
    "the zero-order customers the query exists to count. COUNT(col) "
    "over the null-extended side counts matches only, so customers "
    "whose every order is urgent land in the c_count=0 bucket. Two "
    "aggregations: per-customer (shuffles orders on o_custkey once) "
    "then the tiny distribution roll-up. At 100 TB the first agg is "
    "map-side-combinable and the second groups on ≤ a few hundred "
    "distinct counts — effectively free.",
)
def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q17_MANUAL_SQL = f"""
    WITH pq AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND 2 * CAST(l.l_quantity AS BIGINT) * pq.cnt < pq.sum_qty
"""


@register(
    "q_small_qty_revenue",
    oracle=f"""
        WITH manual AS ({_Q17_MANUAL_SQL})
        SELECT 'correlated_subquery' AS variant, n_small, revenue
        FROM manual
        UNION ALL
        SELECT 'manual_aggregate', n_small, revenue FROM manual
        ORDER BY variant
    """,
    doc="TPC-H Q17 shape (small-quantity revenue): revenue from "
    "Brand#1 lineitems whose quantity is below HALF the part's "
    "average quantity. Registered as two rows that must agree: the "
    "correlated-scalar-subquery spelling (what a user writes — two "
    "scalar subqueries against the same fact, correlated on "
    "l_partkey) and the manual aggregate-then-join spelling (what a "
    "MapReduce programmer hand-builds). Catalyst's "
    "RewriteCorrelatedScalarSubquery turns the former into the "
    "latter — per-partkey aggregate, then join back — so both rows "
    "hash-identical IS the decorrelation evidence. The half-average "
    "predicate is cross-multiplied (2*qty*cnt < sum, all BIGINT) so "
    "neither engine divides: quantities are integral, the compare "
    "is exact, and no float boundary can flip a row. At 100 TB the "
    "subquery form costs one extra lineitem shuffle on l_partkey "
    "(the decorrelated aggregate); the brand filter prunes the "
    "probe side before the join back.",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sq17_lineitem"
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView("sq17_part")
    sub = spark.sql(
        f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue
        FROM sq17_lineitem l
        JOIN sq17_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND 2 * CAST(l.l_quantity AS BIGINT)
              * (SELECT COUNT(*) FROM sq17_lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l3.l_quantity AS BIGINT))
               FROM sq17_lineitem l3
               WHERE l3.l_partkey = l.l_partkey)
        """
    ).select(F.lit("correlated_subquery").alias("variant"), "*")

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    manual = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(F.col("p_brand") == "Brand#1")
        .join(pq, li.l_partkey == pq.pk)
        .where(
            2 * F.col("l_quantity").cast("bigint") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            F.count("*").alias("n_small"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
        .select(F.lit("manual_aggregate").alias("variant"), "*")
    )
    return sub.unionByName(manual).orderBy("variant")


@register(
    "q_large_orders",
    oracle="""
        SELECT c.c_name,
               o.o_orderkey,
               o.o_totalprice AS totalprice,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
        )
        GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
        ORDER BY sum_qty DESC, o.o_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume orders): IN subquery whose "
    "body is a grouped HAVING over the same fact table. "
    "RewritePredicateSubquery plans the IN as a LEFT SEMI join "
    "against the post-HAVING aggregate — the semi side is tiny "
    "(46 orders at sf0.01) so AQE broadcasts it and the outer "
    "customer⋈orders⋈lineitem join tree only ever sees qualifying "
    "orders. Quantities summed as exact BIGINT; o_totalprice is a "
    "raw stored column, passed through unaggregated. Top-20 with "
    "the o_orderkey total tiebreak per the catalog discipline.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sq18_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq18_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sq18_lineitem"
    )
    return spark.sql(
        """
        SELECT c.c_name,
               o.o_orderkey,
               o.o_totalprice AS totalprice,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM sq18_customer c
        JOIN sq18_orders o ON c.c_custkey = o.o_custkey
        JOIN sq18_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM sq18_lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
        )
        GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
        ORDER BY sum_qty DESC, o.o_orderkey
        LIMIT 20
        """
    )


@register(
    "q_waiting_suppliers",
    oracle="""
        WITH wl AS (
            SELECT l_orderkey, l_suppkey,
                   datediff('day', o_orderdate, l_shipdate) > 180 AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN wl l1 ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (
              SELECT 1 FROM wl l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM wl l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.late)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): for "
    "each supplier, count multi-supplier orders where THEIR lineitem "
    "shipped late (>180 days after the order date — the fixture has "
    "no receipt/commit dates) and NO other supplier's did. The "
    "derived relation wl (lineitem + lateness flag) is referenced "
    "three times: once as the probe, once under EXISTS (semi join), "
    "once under NOT EXISTS (anti join) — both correlated on "
    "l_orderkey with a non-equality suppkey guard, the exact shape "
    "RewritePredicateSubquery exists for. Both rewritten joins "
    "shuffle on l_orderkey, the same key, so at 100 TB the three "
    "references co-partition into one exchange lineage; the "
    "supplier dimension broadcasts.",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    wl = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff("l_shipdate", "o_orderdate") > 180).alias("late"),
    )
    wl.createOrReplaceTempView("sq21_wl")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "sq21_supplier"
    )
    return spark.sql(
        """
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM sq21_supplier s
        JOIN sq21_wl l1 ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late
          AND EXISTS (
              SELECT 1 FROM sq21_wl l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM sq21_wl l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.late)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
        """
    )


@register(
    "q_dormant_balance",
    oracle="""
        SELECT CAST(c_custkey % 10 AS INTEGER) AS cgroup,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   AS totacctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*)
            FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY cgroup
        ORDER BY cgroup
    """,
    doc="TPC-H Q22 shape (dormant positive balances): customers whose "
    "balance beats the positive-balance average (uncorrelated SCALAR "
    "subquery — planned as a 1-row broadcast gate, computed once) "
    "and who placed NO order since 2000-01-01 (NOT EXISTS with a "
    "pushed-down date filter → anti join against a pre-filtered, "
    "much smaller orders slice). Grouped by the custkey decile as "
    "the fixture's stand-in for Q22's phone country code. The "
    "scalar average is an exact DECIMAL sum divided once by an "
    "exact count — one IEEE divide both engines compute "
    "bit-identically, so the > gate cannot flip. At 100 TB the "
    "anti join shuffles only customers + the date-filtered order "
    "keys; the scalar gate is a broadcast of one double.",
)
def q_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "sq22_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq22_orders")
    return spark.sql(
        """
        SELECT CAST(c_custkey % 10 AS INT) AS cgroup,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   AS totacctbal
        FROM sq22_customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*)
            FROM sq22_customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM sq22_orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY cgroup
        ORDER BY cgroup
        """
    )


@register(
    "q_value_concentration",
    oracle=f"""
        SELECT l_partkey AS p_partkey,
               CAST(SUM({_SQL_REV}) AS DOUBLE) AS part_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems
        FROM lineitem
        GROUP BY l_partkey
        HAVING 5 * (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)
                 * SUM({_SQL_REV}) >
               7 * (SELECT SUM({_SQL_REV}) FROM lineitem)
        ORDER BY part_revenue DESC, p_partkey
        LIMIT 20
    """,
    doc="TPC-H Q11 shape (value concentration): parts whose revenue "
    "exceeds 1.4x the MEAN per-part revenue — the scalar-subquery-"
    "inside-HAVING form the decorrelation family was missing (Q22 "
    "gates a WHERE on a scalar; Q11 gates a GROUP), with TWO "
    "uncorrelated scalars (total revenue, part count) each computed "
    "once and broadcast into the having-filter above the aggregate. "
    "The mean-relative gate is the Apriori relative-support lesson "
    "applied here by construction: Q11's literal fixed fraction "
    "returns 0 rows the moment the part dimension outgrows it "
    "(measured: 20 rows at sf0.001, 0 at sf0.01+), while 1.4x-mean "
    "survives every scale (3/68/671 qualifying parts). The "
    "threshold is CROSS-MULTIPLIED (5 * n_parts * part_sum > 7 * "
    "total_sum, exact DECIMAL sums x exact counts) so no engine "
    "ever divides. Top-20 by revenue with the partkey "
    "tiebreak (rounding-free: the ordering key is the exact decimal "
    "sum cast to double only at output). At 100 TB both scans push "
    "the same two columns; the gate is one broadcast scalar.",
)
def q_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sq11_lineitem"
    )
    return spark.sql(
        f"""
        SELECT l_partkey AS p_partkey,
               CAST(SUM({_SQL_REV}) AS DOUBLE) AS part_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems
        FROM sq11_lineitem
        GROUP BY l_partkey
        HAVING 5 * (SELECT COUNT(DISTINCT l_partkey) FROM sq11_lineitem)
                 * SUM({_SQL_REV}) >
               7 * (SELECT SUM({_SQL_REV}) FROM sq11_lineitem)
        ORDER BY part_revenue DESC, p_partkey
        LIMIT 20
        """
    )


@register(
    "q_priority_late_orders",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND datediff('day', o_orderdate, l_shipdate) > 90)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking): per priority, the "
    "count of one quarter's orders with AT LEAST ONE late lineitem "
    "(shipped >90 days after the order date — the fixture has no "
    "commit/receipt dates). The EXISTS correlates on the join key "
    "AND references the outer o_orderdate inside its predicate — "
    "the correlated-non-equi-condition case RewritePredicateSubquery "
    "must carry into the LeftSemi join condition (a shape the "
    "Q21 pair, correlated on equality only, does not exercise). "
    "The quarter filter pushes into the orders scan BEFORE the semi "
    "join, so the probe side is ~1/26th of the table; the EXISTS "
    "semantics mean multiplicity-free counting — at most one "
    "contribution per order no matter how many lineitems are late. "
    "At 100 TB: one pruned orders scan, one semi join on "
    "l_orderkey, one 5-key aggregate.",
)
def q_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sq4_orders"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sq4_lineitem"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM sq4_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM sq4_lineitem
              WHERE l_orderkey = o_orderkey
                AND datediff(l_shipdate, o_orderdate) > 90)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )

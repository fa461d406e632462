"""Graph analytics queries: PageRank over the customer–supplier graph.

The graph: an undirected (symmetrized) bipartite customer↔supplier
relation — an edge wherever a customer's order contains a supplier's
line item. PageRank over it scores commercial centrality; in a
training-data pipeline the identical shape ranks dedup clusters or
crawl hosts by link authority.

Determinism: see ``operators/graph.py`` — rank mass is integer
(SCALE = 10^12 units), every operation is truncating bigint division
or an associative integer sum, so Spark and the DuckDB oracle (five
programmatically-generated iteration CTEs of the same arithmetic)
agree hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import SCALE, pagerank_eager, sssp_eager
from ..sources.tables import load_table
from .catalog import register
from .llm import _cached_df

_ITER = 5


def _pagerank_oracle() -> str:
    cte = [
        """
        WITH arcs AS (
            SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        edges AS (
            SELECT src, dst FROM arcs
            UNION SELECT dst AS src, src AS dst FROM arcs
        ),
        outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS (
            SELECT node, ({SCALE} // nn.n) AS rank FROM nodes, nn
        )""".replace("{SCALE}", str(SCALE))
    ]
    for i in range(_ITER):
        cte.append(
            f"""
        c{i} AS (
            SELECT e.dst AS node, SUM(r.rank // d.deg) AS s
            FROM edges e
            JOIN r{i} r ON e.src = r.node
            JOIN outdeg d ON e.src = d.src
            GROUP BY e.dst
        ),
        r{i + 1} AS (
            SELECT nodes.node,
                   (15 * ({SCALE} // (SELECT n FROM nn))) // 100
                     + (85 * COALESCE(c{i}.s, 0)) // 100 AS rank
            FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node
        )"""
        )
    return (
        ",".join(cte)
        + f"""
        SELECT node, CAST(rank AS BIGINT) AS rank
        FROM r{_ITER}
        ORDER BY rank DESC, node
        LIMIT 20
    """
    )


def _bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer<->supplier edge list shared by the graph
    queries: an edge wherever a customer's order contains a supplier's
    line item, both directions."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    arcs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return arcs.union(
        arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


@register(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    doc=f"PageRank, {_ITER} iterations, over the symmetrized "
    "customer-supplier bipartite graph (edge = customer ordered from "
    "supplier); top-20 nodes by rank. Integer-exact formulation "
    "(operators/graph.py): rank mass in 10^12-unit bigints, "
    "contributions rank div outdeg, damping (85*s) div 100 — "
    "truncating integer division + associative sums, so the 5-CTE "
    "DuckDB replica hash-matches bit-for-bit under any partitioning. "
    "Per iteration: ONE join of the persisted degree-annotated edge "
    "list against current ranks + ONE groupBy(dst) — the textbook "
    "two-shuffle Pregel step; lineage stays 10 stages here, and the "
    "production note is checkpoint-every-5-iterations to truncate it "
    "at web scale. Result cached per (session, sf) like the other "
    "iterative relations; final top-20 via TakeOrdered, no global "
    "sort.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        return pagerank_eager(_bipartite_edges(spark, sf_dir), iterations=_ITER)

    ranks = _cached_df(spark, ("pagerank", sf_dir), build)
    return ranks.orderBy(F.desc("rank"), "node").limit(20)


_SSSP_HOPS = 6


@register(
    "q_sssp",
    oracle=f"""
        WITH RECURSIVE arcs AS (
            SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        edges AS (
            SELECT src, dst FROM arcs
            UNION SELECT dst AS src, src AS dst FROM arcs
        ),
        walk(node, hops) AS (
            SELECT 'c1', 0
            UNION
            SELECT e.dst, w.hops + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.hops < {_SSSP_HOPS}
        )
        SELECT node, CAST(MIN(hops) AS INTEGER) AS hops
        FROM walk GROUP BY node
    """,
    doc=f"Single-source shortest path (BFS levels) from customer c1 "
    f"over the symmetrized customer-supplier graph, capped at "
    f"{_SSSP_HOPS} hops: (node, min hop count) for every node reached. "
    "Per hop: one frontier-edges join + one left-anti join against the "
    "settled set (operators/graph.py sssp — the third Pregel-style "
    "iterative pattern, reusing PageRank's lineage-truncation "
    "machinery); the loop ALSO early-exits on an empty frontier, "
    "making the hop cap a bound, not a schedule. Distances are exact "
    "integers, so the hop-capped recursive-CTE oracle (UNION-distinct "
    "walk, MIN(hops) per node) hash-matches bit-for-bit under any "
    "partitioning.",
)
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        return sssp_eager(
            _bipartite_edges(spark, sf_dir), "c1", max_hops=_SSSP_HOPS
        )

    return _cached_df(spark, ("sssp", sf_dir), build)

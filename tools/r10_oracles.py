#!/usr/bin/env python
"""Validated oracle drafts for the operators queued for the round-10
window (SURVEY §7.6 r10 plan): each entry pairs the Spark query shape
the r10 registration will use with its DuckDB oracle SQL, and this
tool runs them side-by-side with the driver's comparison semantics
(row count + column names + order-insensitive value hash) at any
fixture scale:

    python tools/r10_oracles.py                   # sf0.01
    DRIVER_SIM_SF_DIR=/root/testdata/sf0.1 python tools/r10_oracles.py

Candidates (all operators landed + property-tested in round 9; only
registration is deferred so the r9 window could keep all 43
directive names):

- q_similarity_topk_batch — brute batch search; PURE SQL oracle (the
  query vectors are rows of the embeddings table, so no pins at all).
- q_sssp_weighted — bounded Bellman-Ford over 1+((custkey+suppkey)%5)
  weights; hop-capped recursive CTE tracking path weight (distinct
  (node, d, hops) rows stay finite because weights are small ints).
- q_labelprop — 3 unrolled mode-per-node CTE iterations (windows are
  legal in non-recursive CTE chains, unlike recursive ones).
- q_triangles — same degree-ordered orientation joins in SQL.

q_ann_lsh_batch (also landed r9) is NOT here: its buckets come from
seeded numpy hyperplanes, so its oracle is a per-sf pinned expectation
to be measured with tools/pin_scales.py at registration time.

Validation run (round 9, this exact file): ALL MATCH at sf0.001,
sf0.01, AND sf0.1 for all four candidates (driver-semantics compare:
rows + sorted column names + order-insensitive canonical hash).

Registration note for q_triangles: the bipartite customer-supplier
graph is triangle-FREE (odd cycles impossible), which validates the
counting machinery end-to-end (zero everywhere, both engines) but is
a weak demonstration — register over a triangle-bearing projection
instead, e.g. the co-supplier graph (suppliers sharing a part,
supplier-part bipartite projected), whose oracle is the same SQL over
a different edges CTE.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")

LP_ITER = 3
SSSP_W_ROUNDS = 6


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer-supplier edges with deterministic small
    integer weights w = 1 + ((custkey + suppkey) % 5) — derivable
    identically in SQL, and small enough to keep the oracle's
    recursive walk finite (path weight <= 5 * rounds)."""
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    arcs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            (1 + (F.col("o_custkey") + F.col("l_suppkey")) % 5).alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )
    return arcs.union(arcs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))


SQL_WEIGHTED_EDGES = """
    arcs AS (
        SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
               MIN(1 + (o_custkey + l_suppkey) % 5) AS w
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT src, dst, w FROM arcs
        UNION ALL SELECT dst, src, w FROM arcs
    )
"""

SQL_PLAIN_EDGES = """
    arcs AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT src, dst FROM arcs
        UNION SELECT dst AS src, src AS dst FROM arcs
    )
"""


def q_similarity_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from os_ex_3_map_reduce_spark.operators import topk_to_query_batch
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvs = [
        [float(x) for x in r.embedding]
        for r in sorted(
            emb.where(F.col("vec_id") < 3).collect(), key=lambda r: r.vec_id
        )
    ]
    return topk_to_query_batch(emb, qvs, k=5)


ORACLE_SIMILARITY_TOPK_BATCH = """
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 3
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.qv::DOUBLE[]), 4) AS cosine
        FROM embeddings e, q
    ), ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(cosine AS DOUBLE) AS cosine,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
"""


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from os_ex_3_map_reduce_spark.operators.graph import sssp_weighted_eager

    return sssp_weighted_eager(
        _weighted_edges(spark, sf_dir), "c1", max_rounds=SSSP_W_ROUNDS
    )


ORACLE_SSSP_WEIGHTED = f"""
    WITH RECURSIVE {SQL_WEIGHTED_EDGES},
    walk(node, d, hops) AS (
        SELECT 'c1', CAST(0 AS BIGINT), 0
        UNION
        SELECT e.dst, w.d + e.w, w.hops + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.hops < {SSSP_W_ROUNDS}
    )
    SELECT node, CAST(MIN(d) AS BIGINT) AS dist
    FROM walk GROUP BY node
"""


def q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from os_ex_3_map_reduce_spark.operators.graph import label_propagation_eager
    from os_ex_3_map_reduce_spark.plans.graph_queries import _bipartite_edges

    return label_propagation_eager(
        _bipartite_edges(spark, sf_dir), iterations=LP_ITER
    )


def _labelprop_oracle() -> str:
    cte = [SQL_PLAIN_EDGES.strip().rstrip(",") , """
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    l0 AS (SELECT node, node AS label FROM nodes)"""]
    for i in range(LP_ITER):
        cte.append(f"""
    v{i} AS (
        SELECT e.dst AS node, l.label, COUNT(*) AS n
        FROM edges e JOIN l{i} l ON e.src = l.node
        GROUP BY 1, 2
    ),
    w{i} AS (
        SELECT node, label AS new_label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY n DESC, label) AS rk
        FROM v{i}
    ),
    l{i + 1} AS (
        SELECT l{i}.node, COALESCE(w{i}.new_label, l{i}.label) AS label
        FROM l{i} LEFT JOIN w{i}
          ON l{i}.node = w{i}.node AND w{i}.rk = 1
    )""")
    return (
        "WITH " + ",".join(cte)
        + f"\n    SELECT node, label FROM l{LP_ITER}"
    )


ORACLE_LABELPROP = _labelprop_oracle()


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from os_ex_3_map_reduce_spark.operators.graph import triangle_counts
    from os_ex_3_map_reduce_spark.plans.graph_queries import _bipartite_edges

    d = triangle_counts(_bipartite_edges(spark, sf_dir))
    out = d.persist()
    out.count()
    for df in getattr(d, "_osx3_persists", ()):
        try:
            df.unpersist()
        except Exception:
            pass
    return out


ORACLE_TRIANGLES = f"""
    WITH {SQL_PLAIN_EDGES.strip().rstrip(',')},
    und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
    ),
    deg AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
        ) GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b END AS u,
               CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a END AS v
        FROM und u
        JOIN deg da ON u.a = da.node
        JOIN deg db ON u.b = db.node
    ),
    tris AS (
        SELECT e1.u, e1.v, e2.v AS w
        FROM oriented e1
        JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN (SELECT least(u, v) AS v, greatest(u, v) AS w FROM oriented) c
          ON c.v = least(e1.v, e2.v) AND c.w = greatest(e1.v, e2.v)
    ),
    counts AS (
        SELECT node, COUNT(*) AS n FROM (
            SELECT u AS node FROM tris
            UNION ALL SELECT v FROM tris
            UNION ALL SELECT w FROM tris
        ) GROUP BY node
    )
    SELECT deg.node, CAST(COALESCE(counts.n, 0) AS BIGINT) AS n_triangles
    FROM deg LEFT JOIN counts ON deg.node = counts.node
"""

CANDIDATES = {
    "q_similarity_topk_batch": (q_similarity_topk_batch, ORACLE_SIMILARITY_TOPK_BATCH),
    "q_sssp_weighted": (q_sssp_weighted, ORACLE_SSSP_WEIGHTED),
    "q_labelprop": (q_labelprop, ORACLE_LABELPROP),
    "q_triangles": (q_triangles, ORACLE_TRIANGLES),
}


def canon(v) -> str:
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, np.floating):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    return str(v)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("r10-oracles")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from os_ex_3_map_reduce_spark.session import ensure_session_confs

    ensure_session_confs(spark)

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    names = sys.argv[1:] or list(CANDIDATES)
    failures = []
    for name in names:
        fn, sql = CANDIDATES[name]
        sdf = fn(spark, SF)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        spark_canon = sorted(
            tuple(canon(r[c]) for c in scols) for r in srows
        )
        res = con.execute(sql)
        ocols_raw = [d[0] for d in res.description]
        orows = res.fetchall()
        ocols = sorted(ocols_raw)
        idx = [ocols_raw.index(c) for c in ocols]
        duck_canon = sorted(
            tuple(canon(r[i]) for i in idx) for r in orows
        )
        h = lambda rows: hashlib.sha256(repr(rows).encode()).hexdigest()[:12]  # noqa: E731
        ok = (
            len(srows) == len(orows)
            and scols == ocols
            and h(spark_canon) == h(duck_canon)
        )
        status = "OK " if ok else "FAIL"
        print(
            f"{status} {name}: spark={len(srows)} oracle={len(orows)} "
            f"cols {scols == ocols} hash {h(spark_canon)} vs {h(duck_canon)}"
        )
        if not ok:
            failures.append(name)
            for a, b in list(zip(spark_canon, duck_canon))[:5]:
                if a != b:
                    print(f"   spark {a}\n   duck  {b}")
    print("RESULT:", "ALL MATCH" if not failures else f"FAILURES: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

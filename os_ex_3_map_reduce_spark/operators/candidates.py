"""Shared LSH candidate-pair generation.

Every banded-LSH operator (MinHash text dedup, SimHash chunk banding,
random-hyperplane vector LSH) reduces to the same shuffle shape: rows
tagged with bucket keys → gather each bucket → emit the bucket's
unordered id pairs. This helper keeps that shape in ONE place so the
scale properties hold everywhere:

- only (bucket_key, id) is shuffled — never payloads (texts, shingle
  sets, embeddings), which join back later against only the survivors;
- a single groupBy replaces a bucket self-join (no duplicated build
  side, no doubled shuffle of the bucketed relation);
- hot buckets are capped by a size filter on the gathered array —
  boilerplate-heavy web corpora otherwise produce a quadratic bucket;
- pairs are generated positionally (i < j) JVM-side from the gathered
  array, so a bucket of m ids emits exactly m·(m−1)/2 pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(
    buckets: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    max_bucket: int,
    a_name: str = "id_a",
    b_name: str = "id_b",
) -> DataFrame:
    """Distinct unordered id pairs co-bucketed under any bucket key.

    ``buckets`` holds one row per (bucket key, member id). Returns
    columns ``a_name`` < ``b_name``, deduplicated across bucket keys.
    """
    grouped = (
        buckets.groupBy(*bucket_cols)
        .agg(F.collect_list(id_col).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                "ids",
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size("ids")),
                    lambda y: F.struct(
                        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                    ),
                ),
            )
        )
    )
    return (
        grouped.select(pair.alias("p"))
        .select(F.col("p.a").alias(a_name), F.col("p.b").alias(b_name))
        .dropDuplicates([a_name, b_name])
    )

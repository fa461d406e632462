"""WRITTEN inverted index — BM25 serving with pruned term lookup.

The live BM25 pipeline (plans/llm._bm25_top) re-tokenizes the corpus on
every query. Production search serving inverts that once: postings
(term -> doc, tf, df) materialize to disk and a query reads ONLY the
posting lists of its terms. This module brings the engine's written-
index discipline (ivf_write / nsw_write: partition the relation by the
lookup key's bucket, one file per bucket dir, prune asserted from
executed numFiles) to the TEXT axis:

- ``postings/`` — (term, doc_id, tf, df) rows, df denormalized in at
  write time so a lookup never needs a second relation, partitioned by
  ``tb = pmod(xxhash64(term), n_buckets)``. A query touching b
  distinct term buckets reads b files; the per-term parquet filter
  prunes further inside them (dictionary/stats on the sorted term
  column).
- ``lengths/`` — (doc_id, dl) for the BM25 length normalization.
- ``meta/``   — one row: (n_docs, total_tokens, n_buckets), the
  FROZEN offline model (exactly the standing-query precedent: idf and
  avgdl freeze at index-build time; refresh = rebuild).

Scoring uses the ONE shared expression
:func:`~..functions.text.bm25_term_score`, so the live pipeline and
the index-serving path cannot drift — asserted in-query by
q_bm25_indexed's live_match column and in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bm25_term_score, tokens


def postings_write(
    docs: DataFrame,
    path: str,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the inverted index at ``path`` (see module doc).
    The pre-write ``repartition("tb")`` + per-partition term sort give
    one file per bucket dir with a sorted term column — files-read ==
    buckets-probed, and the term predicate prunes row groups inside
    each file."""
    docs2 = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    )
    stats = docs2.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("t")).alias("total_tokens"),
    ).collect()[0]
    w = docs2.select("doc_id", F.explode("t").alias("term"))
    tf = w.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = w.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    post = (
        tf.join(df, "term")
        .withColumn(
            "tb",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
        .repartition("tb")
        .sortWithinPartitions("term", "doc_id")
    )
    post.write.mode("overwrite").partitionBy("tb").parquet(
        f"{path}/postings"
    )
    docs2.select("doc_id", F.size("t").alias("dl")).write.mode(
        "overwrite"
    ).parquet(f"{path}/lengths")
    spark = docs.sparkSession
    spark.createDataFrame(
        [(int(stats.n_docs), int(stats.total_tokens), int(n_buckets))],
        "n_docs long, total_tokens long, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def term_buckets(spark, terms: list[str], n_buckets: int) -> list[int]:
    """The buckets a query's terms hash to — computed by the SAME
    engine expression the writer used (one tiny 1-row-per-term job;
    a bounded driver constant, like every probe-list pick)."""
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets))
            .cast("int")
            .alias("tb")
        )
        .collect()
    )
    return sorted({int(r.tb) for r in rows})


def bm25_search_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """BM25 top-k against a written index: read ONLY the query terms'
    bucket files (scan pruning numFiles-asserted in tests), join doc
    lengths, score with the shared expression against the FROZEN meta
    stats, exact-decimal sum, TakeOrdered. Byte-equal to the live
    pipeline on the same corpus (the no-drift claim q_bm25_indexed
    proves in-band)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    buckets = term_buckets(spark, query_terms, int(meta.n_buckets))
    post = spark.read.parquet(f"{path}/postings").where(
        F.col("tb").isin(buckets) & F.col("term").isin(query_terms)
    )
    dl = spark.read.parquet(f"{path}/lengths")
    terms = post.join(dl, "doc_id").withColumn(
        "term_score",
        bm25_term_score(
            F.col("tf"),
            F.col("df"),
            F.col("dl"),
            F.lit(int(meta.n_docs)),
            F.lit(int(meta.total_tokens)),
        ),
    )
    scored = terms.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        F.sum("term_score").alias("s"),
    )
    return scored.orderBy(F.desc("s"), F.asc("doc_id")).limit(k)

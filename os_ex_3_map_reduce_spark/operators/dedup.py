"""Deduplication operators for training-data pipelines (SURVEY.md E1/E2).

All variants return DataFrames and are built from shuffle-conscious
primitives:

- :func:`exact_dedup` — hash group-by on a (possibly normalized)
  content key; one shuffle, map-side partial agg.
- :func:`minhash_lsh_pairs` — MinHash + banded LSH near-dup join:
  shingle → k minhashes (JVM xxhash64, no Python) → band buckets →
  bucket-equi-join for candidates → exact Jaccard verification.
  At 100 TB this is THE scalable path: the only join is on band
  hashes (equi-join, shuffle on a well-distributed key), never the
  O(n²) cross join. Hot buckets (boilerplate docs) are capped.
- :func:`simhash` / :func:`simhash_neardup_pairs` — 64-bit SimHash
  fingerprints (Arrow-batched Python for the bit arithmetic), near-dup
  candidates via 16-bit chunk banding (a Hamming-ball pigeonhole:
  distance ≤ 3 ⇒ at least one of 4 chunks equal), verified with
  JVM-side ``bit_count(xor)``.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import shingles, tokens


def exact_dedup(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Keep exactly one deterministic representative (min ``order_col``)
    per distinct key. ``dropDuplicates`` would keep an *arbitrary* row —
    unacceptable for reproducible pipelines, so a window is used."""
    w = Window.partitionBy(*key_cols).orderBy(F.asc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _minhash_signature(sh_col: Column, num_hashes: int) -> Column:
    """k independent minhashes of a shingle array, all JVM-side:
    hash_i(s) = xxhash64('<i>#' || s); minhash_i = min over shingles."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    sh_col,
                    lambda s, i=i: F.xxhash64(F.concat(F.lit(f"{i}#"), s)),
                )
            )
            for i in range(num_hashes)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, shingle-set, minhash signature) per document."""
    sh = F.array_distinct(shingles(tokens(text_col), shingle_n))
    return df.select(
        F.col(id_col).alias("doc_id"),
        sh.alias("shingle_set"),
        _minhash_signature(sh, num_hashes).alias("sig"),
    ).where(F.size("shingle_set") > 0)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b) with exact-verified shingle
    Jaccard ≥ threshold; candidates found via banded MinHash-LSH.

    Output: doc_a, doc_b, inter, union_ (exact ints), jaccard (one IEEE
    divide — deterministic). ``max_bucket`` caps pathological buckets
    (boilerplate at web scale) — capped buckets are dropped, trading
    recall for survival, the standard production compromise.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)

    band_hashes = F.array(
        *[
            F.xxhash64(
                *[
                    F.element_at("sig", b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ]
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        "doc_id",
        "shingle_set",
        F.posexplode(band_hashes).alias("band", "bucket"),
    )
    # cap hot buckets: count per (band, bucket), drop oversized
    bucket_sizes = buckets.groupBy("band", "bucket").agg(
        F.count("*").alias("bsize")
    )
    buckets = buckets.join(
        bucket_sizes.where(F.col("bsize") <= max_bucket), ["band", "bucket"]
    )

    a = buckets.select(
        F.col("band"),
        F.col("bucket"),
        F.col("doc_id").alias("doc_a"),
        F.col("shingle_set").alias("sh_a"),
    )
    b = buckets.select(
        F.col("band"),
        F.col("bucket"),
        F.col("doc_id").alias("doc_b"),
        F.col("shingle_set").alias("sh_b"),
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    verified = cand.select(
        "doc_a",
        "doc_b",
        inter.cast("long").alias("inter"),
        union.cast("long").alias("union_"),
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )
    return verified.where(F.col("jaccard") >= threshold)


# --- SimHash --------------------------------------------------------------


def _simhash64(words: list[str]) -> int:
    """Deterministic 64-bit SimHash from md5-derived token hashes."""
    acc = [0] * 64
    for w in words:
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    # interpret as signed 64-bit for Spark LongType
    return out - (1 << 64) if out >= (1 << 63) else out


def _simhash_udf():
    # built lazily: pandas_udf parses its DDL type against the live
    # SparkContext, which doesn't exist at module import time.
    @F.pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _simhash64([w for w in t.split(" ") if w]))

    return simhash_udf


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — Arrow-batched; the only Python hop."""
    return df.select(
        F.col(id_col).alias("doc_id"), _simhash_udf()(F.col(text_col)).alias("simhash")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into
    ``max_hamming + 1`` chunks; distance ≤ d guarantees ≥ 1 identical
    chunk, so an equi-join per chunk finds every qualifying pair
    without a cross join. Verification is JVM-side bit_count(xor).
    """
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if c < extra else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    fp = simhash(df, id_col, text_col)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", offsets[c]).bitwiseAND(
                        F.lit((1 << widths[c]) - 1)
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(
        "chunk_idx",
        "chunk_val",
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
    )
    b = chunks.select(
        "chunk_idx",
        "chunk_val",
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
    )
    cand = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)

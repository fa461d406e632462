"""Deduplication operators for training-data pipelines (SURVEY.md E1/E2).

All variants return DataFrames and are built from shuffle-conscious
primitives:

- :func:`exact_dedup` — hash group-by on a (possibly normalized)
  content key; one shuffle, map-side partial agg.
- :func:`minhash_lsh_pairs` — MinHash + banded LSH near-dup join:
  shingle → k minhashes (Arrow-batched numpy kernel: one blake2b per
  shingle, k affine permutations vectorized over uint64) → band
  buckets → per-bucket pair generation → exact Jaccard verification.
  At 100 TB this is THE scalable path: the only shuffles are on band
  hashes and id pairs (well-distributed keys), never the O(n²) cross
  join. Hot buckets (boilerplate docs) are capped.

  Why a pandas UDF and not pure JVM expressions: a k-hash minhash as
  nested higher-order functions (transform+array_min over an inlined
  shingle expression) runs on Spark's *interpreted* expression path —
  measured ~30 s for 5 000 short docs on 32 cores, vs ~0.5 s for the
  numpy kernel. This is the documented "UDFs are the slow path —
  unless the built-in form can't codegen" exception.
- :func:`simhash` / :func:`simhash_neardup_pairs` — 64-bit SimHash
  fingerprints (Arrow-batched Python for the bit arithmetic), near-dup
  candidates via 16-bit chunk banding (a Hamming-ball pigeonhole:
  distance ≤ 3 ⇒ at least one of 4 chunks equal), verified with
  JVM-side ``bit_count(xor)``. The all-JVM alternative (explode
  tokens → F.md5 → conv() halves → 64 codegen'd bit-sum aggregates)
  was measured at 3.6 s vs the Arrow kernel's 0.48 s on sf0.1 — the
  per-token string md5 + 64 agg expressions over the exploded relation
  cost far more than one Arrow hop, so the kernel stays.

  Round-6 perf audit of the full simhash pair pipeline at sf0.1
  (5 000 docs, 18 079 pairs): 1.97 s in the bench (best-of-2), ~2.5 s
  median under profiling load, of which ~0.7 s is the fingerprint UDF;
  the rest is the 3-exchange machinery (repartition, bucket group-by,
  pair dedup) whose per-stage cost dominates at this tiny scale and
  amortizes at real scale. A/B'd alternatives, both worse: groupBy +
  ``applyInPandas`` pair generation (no collect_list) 3.7 s — more
  Python groups, same shuffles; all-JVM 3.6 s (above). The
  collect_list + mapInPandas shape stays; physical plan verified one
  ArrowEvalPython node (the fingerprint UDF is NOT re-evaluated by the
  8-way chunk projection).

  Round-7 exchange fusion (VERDICT r6 #4): pair-dedup is now fused
  into the bucket kernel — each pair is emitted only at its first
  matching chunk index, so emission is globally unique and the third
  exchange (``dropDuplicates``) disappears. Interleaved A/B at sf0.1,
  3 reps each, identical 18 079-pair output: fused 1.41/1.42/1.52 s
  vs unfused 1.62/1.67/1.82 s (−14%, and one fewer stage to schedule
  at scale). ``fuse_dedup=False`` keeps the old shape for the capped-
  bucket recovery semantics documented on the function.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .candidates import candidate_pairs



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


def _affine_params(num_hashes: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Deterministic (a_i, b_i) for k affine uint64 permutations
    h_i(x) = a_i*x + b_i mod 2^64 (a_i odd ⇒ bijective). Seeded from
    blake2b of the index — no RNG state, reproducible across runs."""
    import numpy as np

    a = np.empty(num_hashes, dtype=np.uint64)
    b = np.empty(num_hashes, dtype=np.uint64)
    for i in range(num_hashes):
        da = hashlib.blake2b(f"minhash-a-{i}".encode(), digest_size=8).digest()
        db = hashlib.blake2b(f"minhash-b-{i}".encode(), digest_size=8).digest()
        a[i] = np.uint64(int.from_bytes(da, "big") | 1)
        b[i] = np.uint64(int.from_bytes(db, "big"))
    return a, b


def _shingle_sig_udf(num_hashes: int, shingle_n: int, mode: str = "word"):
    """Arrow-batched kernel: text → (distinct shingle set, k-minhash sig).

    One blake2b-64 per distinct shingle, then all k minhashes as a
    vectorized (k × m) affine transform + min over m. Built lazily —
    pandas_udf needs a live SparkContext to parse its return type.
    ``mode``: "word" = word n-grams over single-space tokens; "char" =
    character n-grams over the raw string.
    """
    import numpy as np

    @F.pandas_udf("struct<shingle_hashes: array<long>, sig: array<long>>")
    def kernel(texts: pd.Series) -> pd.DataFrame:
        A, B = _affine_params(num_hashes)
        out_sh: list[list[int]] = []
        out_sig: list[list[int]] = []
        with np.errstate(over="ignore"):
            for t in texts:
                if mode == "char":
                    units: list[str] = list(t) if t else []
                else:
                    units = [w for w in t.split(" ") if w] if t else []
                if len(units) < shingle_n:
                    out_sh.append([])
                    out_sig.append([])
                    continue
                if mode == "char":
                    shs = {
                        t[i : i + shingle_n]
                        for i in range(len(t) - shingle_n + 1)
                    }
                else:
                    shs = {
                        " ".join(units[i : i + shingle_n])
                        for i in range(len(units) - shingle_n + 1)
                    }
                h = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.blake2b(s.encode(), digest_size=8).digest(),
                            "big",
                        )
                        for s in shs
                    ),
                    dtype=np.uint64,
                    count=len(shs),
                )
                sig = (A[:, None] * h[None, :] + B[:, None]).min(axis=1)
                out_sig.append(sig.view(np.int64).tolist())
                out_sh.append(np.sort(h.view(np.int64)).tolist())
        return pd.DataFrame({"shingle_hashes": out_sh, "sig": out_sig})

    return kernel


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    shingle_mode: str = "word",
) -> DataFrame:
    """(id, shingle-hash set, minhash signature) per document.

    Shingle semantics mirror the DuckDB oracle exactly: split on a
    single space, word ``shingle_n``-grams (or char n-grams), distinct,
    docs with fewer than ``shingle_n`` units contribute nothing.

    The shingle set is represented by its sorted 64-bit blake2b hashes,
    not the strings: |hash set| = |string set| and hash-set
    intersection sizes equal string-set intersection sizes unless two
    distinct shingles of the same pair collide in 64 bits — probability
    ≈ m²/2⁶⁵ ≈ 1e-14 for m≈600-shingle docs, far below any gate —
    while verification joins move 8-byte longs instead of strings and
    intersect with long equality.
    """
    kernel = _shingle_sig_udf(num_hashes, shingle_n, shingle_mode)
    return (
        df.select(F.col(id_col).alias("doc_id"), kernel(F.col(text_col)).alias("ss"))
        .select("doc_id", "ss.shingle_hashes", "ss.sig")
        .where(F.size("shingle_hashes") > 0)
    )


def _band_bucket_expr(num_hashes: int, bands: int):
    """The banded-LSH bucket keys of a ``sig`` column: one xxhash64 per
    band over that band's signature rows, band index folded into the
    hash so one flat ``bucket`` column distinguishes bands. Shared by
    the all-pairs path and the written-index path so their buckets are
    identical BY CONSTRUCTION — a lookup against an index probes
    exactly the buckets the all-pairs run would have co-grouped."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[
                    F.element_at("sig", b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    shingle_mode: str = "word",
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b) with exact-verified shingle
    Jaccard ≥ threshold; candidates found via banded MinHash-LSH.

    Output: doc_a, doc_b, inter, union_ (exact ints), jaccard (one IEEE
    divide — deterministic). ``max_bucket`` caps pathological buckets
    (boilerplate at web scale) — capped buckets are dropped, trading
    recall for survival, the standard production compromise.

    Plan shape (scale-driven):

    1. Repartition the input before shingling — per-row CPU work must
       not serialize on however few partitions the scan produced (a
       small parquet file reads as ONE split; at 100 TB the same logic
       spreads hot small tables).
    2. Persist the (id, shingle_hashes, sig) relation: it is consumed by
       the banding branch and by both verification joins; without
       persist Spark re-runs the shingle pipeline per consumer (the
       production analog is materializing the signature table to
       storage once).
    3. Banding is SLIM: only (band_bucket, doc_id) is shuffled — one
       groupBy gathers each bucket's ids, the cap is a size filter on
       the gathered array, and candidate pairs are generated
       JVM-side from the array (positional i<j, so no self-join and
       no duplicate unordered pairs within a bucket).
    4. Cross-band dedup and Jaccard verification shuffle only id
       pairs; shingle sets are joined back in last, touching only
       surviving candidates.
    """
    spark = df.sparkSession
    sigs = minhash_signatures(
        df.repartition(spark.sparkContext.defaultParallelism),
        id_col,
        text_col,
        num_hashes,
        shingle_n,
        shingle_mode,
    ).persist()
    # NOTE on the persist lifecycle: ``sigs`` has three lazy consumers
    # (banding + both verification joins), so it must stay cached until
    # the returned pairs are materialized. Callers that materialize
    # eagerly should use :func:`minhash_lsh_pairs_eager`, which counts
    # the pairs and unpersists the signature relation immediately —
    # otherwise each invocation leaves cached blocks behind until LRU
    # eviction.

    buckets = sigs.select(
        "doc_id", F.explode(_band_bucket_expr(num_hashes, bands)).alias("bucket")
    )
    cand = candidate_pairs(
        buckets, ["bucket"], "doc_id", max_bucket, "doc_a", "doc_b"
    )
    sh_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("shingle_hashes").alias("sh_a"))
    sh_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("shingle_hashes").alias("sh_b"))
    withsets = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    verified = withsets.select(
        "doc_a",
        "doc_b",
        inter.cast("long").alias("inter"),
        union.cast("long").alias("union_"),
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )
    pairs = verified.where(F.col("jaccard") >= threshold)
    # expose the internal cache handle for eager callers (not part of
    # the public result schema)
    pairs._osx3_sigs = sigs  # type: ignore[attr-defined]
    return pairs


def minhash_lsh_pairs_eager(df: DataFrame, **kwargs) -> DataFrame:
    """:func:`minhash_lsh_pairs`, materialized: persists the (small)
    verified-pairs relation, forces it with one count, and unpersists
    the signature relation so repeated invocations don't accumulate
    cached blocks. The returned DataFrame serves any number of
    downstream consumers from cache."""
    pairs = minhash_lsh_pairs(df, **kwargs)
    sigs = pairs._osx3_sigs  # type: ignore[attr-defined]
    out = pairs.persist()
    out.count()
    sigs.unpersist()
    return out


def minhash_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    shingle_mode: str = "word",
    max_bucket: int = 1000,
) -> None:
    """Materialize a reusable near-dup INDEX over a corpus: the
    signature relation (doc_id, shingle_hashes, sig) under
    ``{path}/sigs`` and the banded bucket relation (bucket, doc_id)
    under ``{path}/buckets`` — dedup-at-ingest for a training-data
    lake (the E2 analog of :func:`~.similarity.ivf_write`). A daily
    pipeline shingles the CORPUS exactly once; every future delta
    batch is checked by :func:`minhash_index_lookup` without touching
    corpus text again.

    Hot buckets (> ``max_bucket`` corpus members — boilerplate at web
    scale) are dropped at WRITE time, so every future lookup skips
    them for free instead of re-detecting them per batch — the same
    recall-for-survival trade :func:`minhash_lsh_pairs` applies
    per-run, made once."""
    spark = df.sparkSession
    sigs = minhash_signatures(
        df.repartition(spark.sparkContext.defaultParallelism),
        id_col,
        text_col,
        num_hashes,
        shingle_n,
        shingle_mode,
    ).persist()
    sigs.write.mode("overwrite").parquet(f"{path}/sigs")
    buckets = sigs.select(
        "doc_id", F.explode(_band_bucket_expr(num_hashes, bands)).alias("bucket")
    )
    sizes = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    buckets.join(
        sizes.where(F.col("n") <= max_bucket), "bucket"
    ).select("bucket", "doc_id").write.mode("overwrite").parquet(
        f"{path}/buckets"
    )
    sigs.unpersist()


def minhash_index_append(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    shingle_mode: str = "word",
) -> None:
    """Grow a written near-dup index with a delta batch: shingle + sign
    the delta ONLY and append its rows to both relations — no recompute
    of the existing corpus (the E2 analog of
    :func:`~.similarity.ivf_append`; signatures are a pure per-row
    function of (text, seeded hash family), so append(B) after
    write(A) equals write(A ∪ B) up to the write-time hot-bucket cap,
    which append does NOT re-apply globally — a bucket that becomes
    hot only through accumulated appends is re-capped at the next full
    rewrite, the standard compaction-time fix)."""
    spark = df.sparkSession
    sigs = minhash_signatures(
        df.repartition(spark.sparkContext.defaultParallelism),
        id_col,
        text_col,
        num_hashes,
        shingle_n,
        shingle_mode,
    ).persist()
    sigs.write.mode("append").parquet(f"{path}/sigs")
    sigs.select(
        "doc_id", F.explode(_band_bucket_expr(num_hashes, bands)).alias("bucket")
    ).write.mode("append").parquet(f"{path}/buckets")
    sigs.unpersist()


def minhash_index_lookup(
    new_df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    shingle_mode: str = "word",
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup-at-ingest: exact-verified near-dup matches of a DELTA
    batch against a WRITTEN corpus index, corpus text never re-read.

    The delta is shingled/signed once (the only Python work); its band
    buckets equi-join the index's bucket relation (slim: 8-byte keys
    and ids only — the same no-payload-shuffle discipline as
    :func:`minhash_lsh_pairs`); surviving candidates verify exact
    shingle-set Jaccard against the index's stored ``shingle_hashes``.
    Because :func:`_band_bucket_expr` is shared, a lookup probes
    exactly the buckets an all-pairs run would have co-grouped —
    recall relative to the all-pairs path differs only by the
    write-time hot-bucket cap (equivalence property-tested in
    tests/test_llm_ops.py).

    Output: (new_doc, corpus_doc, inter, union_, jaccard), jaccard ≥
    ``threshold``, exact ints + one IEEE divide — SQL-oracle-able."""
    spark = new_df.sparkSession
    new_sigs = minhash_signatures(
        new_df.repartition(spark.sparkContext.defaultParallelism),
        id_col,
        text_col,
        num_hashes,
        shingle_n,
        shingle_mode,
    ).persist()
    new_buckets = new_sigs.select(
        F.col("doc_id").alias("new_doc"),
        F.explode(_band_bucket_expr(num_hashes, bands)).alias("bucket"),
    )
    idx_buckets = spark.read.parquet(f"{path}/buckets")
    cand = (
        new_buckets.join(idx_buckets, "bucket")
        .select("new_doc", F.col("doc_id").alias("corpus_doc"))
        .where(F.col("new_doc") != F.col("corpus_doc"))
        .dropDuplicates(["new_doc", "corpus_doc"])
    )
    idx_sh = spark.read.parquet(f"{path}/sigs").select(
        F.col("doc_id").alias("corpus_doc"),
        F.col("shingle_hashes").alias("sh_c"),
    )
    new_sh = new_sigs.select(
        F.col("doc_id").alias("new_doc"), F.col("shingle_hashes").alias("sh_n")
    )
    withsets = cand.join(new_sh, "new_doc").join(idx_sh, "corpus_doc")
    inter = F.size(F.array_intersect("sh_n", "sh_c"))
    union = F.size("sh_n") + F.size("sh_c") - inter
    out = withsets.select(
        "new_doc",
        "corpus_doc",
        inter.cast("long").alias("inter"),
        union.cast("long").alias("union_"),
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)
    out._osx3_sigs = new_sigs  # type: ignore[attr-defined]
    return out


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Connected components by min-label propagation (the Pregel-style
    iterative pattern on DataFrames).

    Returns (id, label) for every vertex appearing in ``edges``, where
    ``label`` is the smallest vertex id in its component — the standard
    representative choice for near-dup cluster dedup (each cluster
    keeps doc ``label``; the rest are dropped).

    Each round: every vertex takes the min of its own and its
    neighbors' labels; converges in O(component diameter) rounds —
    near-dup clusters are shallow (pairs/triples), so 2–3 rounds in
    practice. ``localCheckpoint`` truncates lineage each round
    (iterative plans otherwise grow exponentially), and the convergence
    check is one aggregate, not a collect of the labels.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    if max_iter < 1:  # degenerate budget: identity labels, no rounds
        labels = (
            und.select(F.col("a").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint()
        )
        und.unpersist()
        return labels
    # Init fused with round 1 (r15 optimization, guide §1.2/§2.4): the
    # identity-label init and the first propagation round group on the
    # same key, so min(least(a, b)) over the vertex's edge rows IS the
    # round-1 state (least includes the vertex's own id — the identity
    # label — because every und row carries it as `a`). One exchange
    # builds what used to take two (vertex distinct + round-1 agg);
    # `changed` after this round is simply label != id.
    labels = (
        und.groupBy(F.col("a").alias("id"))
        .agg(F.min(F.least("a", "b")).alias("label"))
        .localCheckpoint()
    )
    changed = labels.where(F.col("label") != F.col("id")).count()
    for _ in range(max_iter - 1):
        if changed == 0:
            break
        neigh = und.join(labels, und.b == labels.id).select(
            und.a.alias("id"), "label"
        )
        # The convergence check rides the label aggregation instead of
        # a separate new-vs-old join (r15 optimization, guide §2.4):
        # every vertex's OLD label enters the union exactly once
        # (flagged), so max(label WHERE is_old) recovers it in the same
        # groupBy that takes the min — `changed` is then a scan of the
        # checkpointed result, no second shuffle. One exchange per
        # round instead of two; labels emitted are identical.
        new_labels = (
            neigh.withColumn("is_old", F.lit(0))
            .union(labels.withColumn("is_old", F.lit(1)))
            .groupBy("id")
            .agg(
                F.min("label").alias("label"),
                F.max(
                    F.when(F.col("is_old") == 1, F.col("label"))
                ).alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(
            F.col("label") != F.col("_old")
        ).count()
        labels = new_labels.select("id", "label")
    und.unpersist()
    return labels


# --- SimHash --------------------------------------------------------------


def _simhash64(words: list[str]) -> int:
    """Deterministic 64-bit SimHash from md5-derived token hashes.

    Reference implementation (kept for tests / documentation of the
    exact bit semantics); the vectorized kernel below must agree
    bit-for-bit.
    """
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
    import numpy as np

    shifts = np.arange(64, dtype=np.uint64)
    powers = np.uint64(1) << shifts

    @F.pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        # token→hash memo: corpora repeat tokens heavily, md5 is the
        # per-token cost worth amortizing.
        memo: dict[str, int] = {}

        def token_hash(w: str) -> int:
            h = memo.get(w)
            if h is None:
                h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                memo[w] = h
            return h

        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = [w for w in t.split(" ") if w]
            if not words:
                out[i] = 0
                continue
            hs = np.fromiter(
                (token_hash(w) for w in words), dtype=np.uint64, count=len(words)
            )
            bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            out[i] = powers[acc > 0].sum().astype(np.uint64).view(np.int64)
        return pd.Series(out)

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
    max_bucket: int = 10000,
    fuse_dedup: bool = True,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into
    ``max_hamming + 1`` chunks; distance ≤ d guarantees ≥ 1 identical
    chunk, so bucketing per chunk finds every qualifying pair without
    a cross join. Verification is JVM-side bit_count(xor). Fingerprints
    are persisted (three consumers) and the input repartitioned so the
    Python fingerprint kernel parallelizes.

    ``fuse_dedup=True`` (default) emits each pair ONLY at its first
    matching chunk index, which makes emission globally unique and
    deletes the final ``dropDuplicates`` exchange — the plan is then
    2 exchanges (UDF repartition + bucket groupBy) instead of 3. The
    first-match test is 8 shift-and-mask ops per surviving xor, done in
    the same numpy kernel that popcounts. Caveat: if a bucket exceeds
    ``max_bucket`` (hot-bucket skew guard), the fused shape misses
    pairs whose FIRST matching chunk was capped even when a later
    chunk's bucket survives, while the unfused shape recovers them;
    on real corpora the cap only triggers on degenerate boilerplate
    (never on the fixture), and a capped bucket already means accepting
    approximation. ``fuse_dedup=False`` keeps the recovering shape.
    """
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if c < extra else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    spark = df.sparkSession
    fp = simhash(
        df.repartition(spark.sparkContext.defaultParallelism), id_col, text_col
    )
    chunks = fp.select(
        F.struct("doc_id", "simhash").alias("m"),
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
    # Deliberately NOT candidates.candidate_pairs: the payload here is 8
    # bytes (the fingerprint itself), so carrying it into the buckets
    # and filtering hamming ≤ d during pair generation — BEFORE any
    # dedup shuffle — beats the slim-bucket + join-back shape:
    # correlated corpora generate O(n·bucket) raw pairs (4M+ at sf0.1)
    # and this plan materializes only the ~18k survivors. Pair
    # generation is a vectorized numpy kernel (triu indices + xor +
    # byte-table popcount) because the equivalent nested-HOF explode
    # runs interpreted at ~µs/pair.
    import numpy as np

    grouped = (
        chunks.groupBy("chunk_idx", "chunk_val")
        .agg(F.collect_list("m").alias("ms"))
        .where((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    )
    chunk_masks = np.array(
        [(1 << w) - 1 for w in widths], dtype=np.uint64
    )
    chunk_offsets = np.array(offsets, dtype=np.uint64)

    def pair_batches(batches):
        pop = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "hamming": pd.Series(dtype="int64"),
            }
        )
        for pdf in batches:
            outs = []
            for chunk_idx, ms in zip(pdf["chunk_idx"], pdf["ms"]):
                ids = np.fromiter((m["doc_id"] for m in ms), dtype=np.int64, count=len(ms))
                hs = np.fromiter(
                    (m["simhash"] for m in ms), dtype=np.int64, count=len(ms)
                ).view(np.uint64)
                iu, ju = np.triu_indices(len(ids), k=1)
                x = np.ascontiguousarray(hs[iu] ^ hs[ju])
                hd = pop[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
                keep = hd <= max_hamming
                if fuse_dedup and keep.any():
                    # unique global emission: keep a pair only where the
                    # CURRENT chunk is its first (lowest-index) matching
                    # chunk — every qualifying pair has >= 1 match, so
                    # argmax over the match matrix finds it
                    xk = x[keep]
                    matches = (
                        (xk[None, :] >> chunk_offsets[:, None])
                        & chunk_masks[:, None]
                    ) == 0
                    keep[keep] = matches.argmax(axis=0) == chunk_idx
                if keep.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_a": np.minimum(ids[iu[keep]], ids[ju[keep]]),
                                "doc_b": np.maximum(ids[iu[keep]], ids[ju[keep]]),
                                "hamming": hd[keep].astype(np.int64),
                            }
                        )
                    )
            yield pd.concat(outs) if outs else empty

    pairs = grouped.select("chunk_idx", "ms").mapInPandas(
        pair_batches, schema="doc_a long, doc_b long, hamming long"
    )
    return pairs if fuse_dedup else pairs.dropDuplicates(["doc_a", "doc_b"])


def minhash_index_compact(
    spark, path: str, max_bucket: int = 1000
) -> dict:
    """Compaction for an appended near-dup index: re-apply the GLOBAL
    hot-bucket cap and rewrite both relations coalesced. Appends only
    cap within their own batch (minhash_index_append docstring), so a
    bucket that crosses ``max_bucket`` through accumulated appends
    keeps serving quadratic candidates until this maintenance pass —
    the documented compaction-time fix, as a runnable op.

    Swap discipline (the ivf_index_compact fix, same ADVICE-r10
    class: the old rmtree-then-move left a no-index window and could
    degrade to a non-atomic cross-filesystem copy): the stage lives
    INSIDE the index directory so each relation swaps by two same-FS
    ``os.rename``s — old aside, stage in — and the old copy is
    deleted only after the new one is in place. A crash leaves each
    relation whole (old, new, or old recoverable under ``.old``),
    never partial; a reader can at worst pair new buckets with old
    sigs, which is semantically identical (compaction never changes
    sig content, only drops hot-bucket rows and coalesces files).
    Returns counts {buckets_before, buckets_after,
    hot_buckets_dropped} as evidence."""
    import os as _os
    import shutil
    import tempfile

    buckets = spark.read.parquet(f"{path}/buckets")
    sizes = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    hot = sizes.where(F.col("n") > max_bucket)
    n_before = buckets.count()
    n_hot = hot.count()
    kept = buckets.join(hot.select("bucket"), "bucket", "left_anti")
    stage = tempfile.mkdtemp(prefix="_idx_compact_", dir=path)
    kept.coalesce(8).write.mode("overwrite").parquet(f"{stage}/buckets")
    spark.read.parquet(f"{path}/sigs").coalesce(8).write.mode(
        "overwrite"
    ).parquet(f"{stage}/sigs")
    n_after = spark.read.parquet(f"{stage}/buckets").count()
    for rel in ("buckets", "sigs"):
        old = f"{path}/{rel}.old"
        shutil.rmtree(old, ignore_errors=True)  # prior-crash leftover
        _os.rename(f"{path}/{rel}", old)  # same-FS, instant
        _os.rename(f"{stage}/{rel}", f"{path}/{rel}")  # the swap
        shutil.rmtree(old)
    shutil.rmtree(stage, ignore_errors=True)
    return {
        "bucket_rows_before": n_before,
        "bucket_rows_after": n_after,
        "hot_buckets_dropped": n_hot,
    }


def semantic_dedup(
    emb_df: DataFrame,
    threshold: float = 0.4,
    k: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (the public Abbas et al.
    2023 construction): cluster the embeddings with one integer-exact
    k-means assignment step, then examine cosine similarity ONLY
    within each cluster and drop every vector that has a smaller-id
    cluster-mate with ``round(cosine, 4) >= threshold``.

    Returns the REMOVED rows — ``(cluster_id, vec_id, keeper_id,
    cosine)`` with ``keeper_id`` the smallest qualifying cluster-mate
    (a total, partitioning-invariant choice) and ``cosine`` the rounded
    score against that keeper.

    Scale shape: the clustering step is the q_kmeans_assign kernel —
    scan → Arrow projection → per-cluster grouping; the pair scan is
    ``applyInPandas`` per cluster, so the quadratic work is n_c² per
    cluster, never n². That per-cluster-fit is the SemDeDup recipe's
    own contract: k grows with the corpus (the paper runs ~50k
    clusters) precisely so clusters stay small enough to pair-scan;
    this implementation inherits the same knob. The k seed vectors are
    a k-row driver constant (q_kmeans_assign precedent), not data
    movement.

    Determinism: cluster assignment is exact int64 arithmetic on the
    1e-6 fixpoint grid (first-min argmin == lowest cluster id); pair
    scores are normalize-then-matmul float64 rounded half-away to 4
    decimals BEFORE thresholding — the same parity-proven recipe as
    :func:`~..operators.similarity.threshold_pairs`, so a DuckDB
    oracle recomputing with ``list_cosine_similarity`` matches
    hash-identically.
    """
    import numpy as np

    from .similarity import _lloyd_fixpoint, round_half_away

    seed_rows = sorted(
        emb_df.where(F.col(id_col) < k)
        .select(id_col, F.col(emb_col).cast("array<double>"))
        .collect(),
        key=lambda r: r[0],
    )
    seeds = _lloyd_fixpoint(np.array([list(r[1]) for r in seed_rows], dtype=np.float64))
    s_sq = (seeds * seeds).sum(axis=1)

    base = emb_df.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).cast("array<double>").alias("e"),
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["e"]])
            pts = _lloyd_fixpoint(mat)
            p_sq = (pts * pts).sum(axis=1)
            dists = p_sq[:, None] + s_sq[None, :] - 2 * (pts @ seeds.T)
            yield pd.DataFrame(
                {
                    "cluster_id": dists.argmin(axis=1).astype("int64"),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "e": pdf["e"],
                }
            )

    assigned = base.mapInPandas(
        assign, "cluster_id long, vec_id long, e array<double>"
    )

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        mat = np.stack(
            [np.asarray(e, dtype=np.float64) for e in pdf["e"].iloc[order]]
        )
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0  # zero vectors score 0 < any threshold
        mat = mat / norms
        sims = round_half_away(mat @ mat.T, 4)
        # qualifying (i < j) pairs; keeper(j) = FIRST qualifying i
        # (ids ascending), a total partitioning-invariant choice.
        qual = np.triu(sims >= threshold, k=1)
        removed_cols = np.flatnonzero(qual.any(axis=0))
        if not len(removed_cols):
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series(dtype="int64"),
                    "vec_id": pd.Series(dtype="int64"),
                    "keeper_id": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        keep_rows = qual[:, removed_cols].argmax(axis=0)
        return pd.DataFrame(
            {
                "cluster_id": np.repeat(
                    pdf["cluster_id"].iloc[0], len(removed_cols)
                ).astype("int64"),
                "vec_id": ids[removed_cols],
                "keeper_id": ids[keep_rows],
                "cosine": sims[keep_rows, removed_cols],
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(
        cluster_pairs,
        "cluster_id long, vec_id long, keeper_id long, cosine double",
    )

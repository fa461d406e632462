"""WRITTEN inverted index — BM25 serving with pruned term lookup and
Lucene-style segment appends.

The live BM25 pipeline (plans/llm._bm25_top) re-tokenizes the corpus on
every query. Production search serving inverts that once: postings
(term -> doc, tf, df) materialize to disk and a query reads ONLY the
posting lists of its terms. This module brings the engine's written-
index discipline (ivf_write / nsw_write: partition the relation by the
lookup key's bucket, one file per bucket dir, prune asserted from
executed numFiles) to the TEXT axis.

**Why appends need segments.** The vector indexes append partition-
locally (ivf_append / nsw_append rewrite only touched lists) because
assignment/linking is a pure local function. A text index is NOT like
that: df and avgdl are GLOBAL statistics — one new document changes
the idf of every existing posting of its terms, so an in-place append
would have to rewrite every affected bucket. The published answer is
Lucene's: the index is a sequence of IMMUTABLE segments, each carrying
its own postings + lengths + stats, and queries merge statistics at
read time. The merge is exact, not approximate, because every global
statistic is ADDITIVE over disjoint doc sets: ``df = Σ df_seg``,
``n_docs = Σ``, ``total_tokens = Σ`` — so
``append(Δ) ∘ write(A) ≡ write(A ∪ Δ)`` is a theorem here too
(property-tested), reached through segment algebra instead of
partition rewrites.

Layout at ``path``::

    MANIFEST                           JSON {"segments": [ids],
                                       "n_buckets": B, "stats":
                                       {id: [n_docs, total_tokens]}}
                                       — the single source of truth
                                       for which segments are live,
                                       plus the denormalized reader
                                       constants (zero meta-read
                                       Spark jobs per search/append)
    segments/<i>/postings/tb=<b>/...   one sorted file per term bucket
    segments/<i>/lengths/              (doc_id, dl)
    segments/<i>/meta/                 (n_docs, total_tokens, n_buckets)

**Atomic publication.** Readers never ``listdir``: they consult the
MANIFEST, which every mutation (write/append/merge) swaps into place
via the repo's tmp-then-``os.rename`` discipline (the same commit
point as sources/versioned.py:99 and sources/catalog_txn.py:72). A
segment directory is written FIRST and is unreferenced garbage until
the manifest rename lands, so a crash at any point leaves readers
seeing either the old or the new segment set — never both (the
double-count window a listdir-based reader would have during a
merge), never a partial one. Orphan segment dirs from crashed
mutations are invisible and swept by :func:`postings_vacuum`.

Scoring uses the ONE shared expression
:func:`~..functions.text.bm25_term_score`, so the live pipeline and
the index-serving path cannot drift — asserted in-query by
q_bm25_indexed's live_match column and in tests.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bm25_term_score, tokens


def _write_meta(
    seg_path: str, n_docs: int, total_tokens: int, n_buckets: int
) -> None:
    """The 1-row per-segment meta parquet, written DRIVER-SIDE via
    pyarrow (r15 optimization batch 2): the row is three driver-held
    ints, so a Spark ``repartition(1).write`` job is pure scheduling
    overhead (~1 job per segment write and per merge — 8 jobs inside
    one q_stream_bm25_ingest run). Schema pinned to the legacy Spark
    layout (long, long, int — the ``_seg_meta`` fallback contract,
    asserted in tests), and the dir is replaced wholesale to keep
    overwrite semantics."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"{seg_path}/meta"
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "n_docs": pa.array([int(n_docs)], pa.int64()),
                "total_tokens": pa.array([int(total_tokens)], pa.int64()),
                "n_buckets": pa.array([int(n_buckets)], pa.int32()),
            }
        ),
        f"{d}/part-00000.parquet",
    )


def _write_segment(
    docs: DataFrame,
    seg_path: str,
    n_buckets: int,
    id_col: str,
    text_col: str,
) -> tuple[int, int]:
    # tokenize ONCE: stats, postings, and lengths all read the cached
    # tokenized relation instead of re-running the tokenizer 3x over
    # the batch (at ingest rates the tokenizer IS the batch cost)
    docs2 = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    ).persist()
    try:
        w = docs2.select("doc_id", F.explode("t").alias("term"))
        tf = w.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        # df stays countDistinct over the exploded tokens — examined
        # and deliberately KEPT in the r15 optimization round: this
        # plans as partial (term, doc_id) dedup map-side + ONE
        # term-keyed exchange of ~tf-sized deduped rows. The two
        # "obvious" rewrites both lose: df = tf.groupBy(term).count()
        # re-runs the explode AND adds a second exchange (no
        # ReusedExchange — the optimizer strips the tf branch's
        # count(1) into a bare dedup agg, so the subtrees differ);
        # df = count().over(Window.partitionBy(term)) is one pass but
        # funnels every tf row of a hot term (any stopword at corpus
        # scale) through a single window task — skew-unsafe at 100 TB.
        # Interleaved A/B at sf0.1: join-from-tf 1.30x SLOWER, window
        # 1.05x (parity); plan evidence in plans/r15/.
        df = w.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        post = (
            tf.join(df, "term")
            .withColumn(
                "tb",
                F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast(
                    "int"
                ),
            )
            .repartition("tb")
            .sortWithinPartitions("term", "doc_id")
        )
        post.write.mode("overwrite").partitionBy("tb").parquet(
            f"{seg_path}/postings"
        )
        # segment stats RIDE the lengths write via an Observation
        # (r15 optimization batch 2) instead of a separate agg job:
        # n_docs/total_tokens are exactly count/sum(dl) of the rows
        # the write materializes, so the former stats-collect job
        # (one per segment — 5 per q_stream_bm25_ingest run) is free.
        # The postings write above is now what materializes the
        # persist; the lengths job reads the cache.
        from pyspark.sql import Observation

        obs = Observation()
        (
            docs2.select("doc_id", F.size("t").alias("dl"))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dl").alias("total_tokens"),
            )
            .write.mode("overwrite")
            .parquet(f"{seg_path}/lengths")
        )
        got = obs.get
        n_docs = int(got["n_docs"])
        total_tokens = int(got["total_tokens"] or 0)
    finally:
        docs2.unpersist()
    _write_meta(seg_path, n_docs, total_tokens, n_buckets)
    return n_docs, total_tokens


def _publish(
    path: str,
    seg_ids: list[int],
    n_buckets: int,
    stats: dict[int, tuple[int, int]],
) -> None:
    """Swap the live-segment manifest atomically: write to a tmp name
    in the same directory, then one ``os.rename`` — the commit point.
    Everything before the rename is unreferenced; everything after is
    the complete new view. Besides the live segment ids, the manifest
    denormalizes the GLOBAL constants every reader needs before it can
    plan (n_buckets) and each segment's (n_docs, total_tokens) — so an
    append or a search costs ZERO driver-side meta-read jobs (the
    per-segment meta parquet stays as the durable/inspectable copy;
    readers fall back to it for legacy manifest-less indexes)."""
    # unique per attempt: a fixed tmp name would let two overlapping
    # maintenance runs interleave writes into one staging file (the
    # swap itself is last-writer-wins by design — single-writer
    # maintenance — but the staging must never mix two writers' bytes)
    tmp = f"{path}/MANIFEST.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "segments": sorted(seg_ids),
                "n_buckets": int(n_buckets),
                "stats": {
                    str(i): [int(a), int(b)]
                    for i, (a, b) in stats.items()
                },
            },
            f,
        )
    os.rename(tmp, f"{path}/MANIFEST")


def _manifest(path: str) -> dict | None:
    try:
        with open(f"{path}/MANIFEST") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _seg_meta(spark, path: str, seg_ids: list[int]) -> tuple[int, dict]:
    """(n_buckets, {seg_id: (n_docs, total_tokens)}) — from the
    manifest when present (no Spark jobs), else from the per-segment
    meta parquet (legacy indexes)."""
    man = _manifest(path) or {}
    stats = {
        int(k): (int(v[0]), int(v[1]))
        for k, v in man.get("stats", {}).items()
    }
    n_buckets = man.get("n_buckets")
    missing = [i for i in seg_ids if i not in stats]
    if n_buckets is None or missing:
        for i in missing or seg_ids:
            m = spark.read.parquet(
                f"{path}/segments/{i}/meta"
            ).collect()[0]
            stats[i] = (int(m.n_docs), int(m.total_tokens))
            if n_buckets is None:
                n_buckets = int(m.n_buckets)
    return int(n_buckets), stats


def postings_write(
    docs: DataFrame,
    path: str,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the inverted index at ``path`` as segment 0 (see
    module doc) and publish the manifest. The pre-write
    ``repartition("tb")`` + per-partition term sort give one file per
    bucket dir with a sorted term column — files-read ==
    buckets-probed per segment, and the term predicate prunes row
    groups inside each file."""
    os.makedirs(path, exist_ok=True)
    st = _write_segment(
        docs, f"{path}/segments/0", n_buckets, id_col, text_col
    )
    _publish(path, [0], n_buckets, {0: st})


def segment_ids(path: str) -> list[int]:
    """The LIVE segment ids — read from the MANIFEST (module doc), so
    a reader racing a merge sees old-or-new, never both. Legacy
    manifest-less indexes fall back to the directory listing."""
    try:
        with open(f"{path}/MANIFEST") as f:
            return sorted(json.load(f)["segments"])
    except FileNotFoundError:
        root = f"{path}/segments"
        return sorted(
            int(d) for d in os.listdir(root) if d.isdigit()
        )


def postings_append(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Append a delta batch as a NEW immutable segment — existing
    segment files are untouched (byte-identical, file-listing-asserted
    in tests), exactly Lucene's ingestion path. Returns the new
    segment id. Statistics merge exactly at read time (module doc);
    what append does NOT do is merge small segments — that is
    :func:`postings_merge`'s ``max_segments`` policy, Lucene's
    background merge. The new segment dir is fully written BEFORE the
    manifest rename publishes it: a crash mid-append leaves an
    invisible orphan, never a half-visible segment."""
    spark = new_docs.sparkSession
    segs = segment_ids(path)
    n_buckets, stats = _seg_meta(spark, path, segs)
    new_id = segs[-1] + 1
    stats[new_id] = _write_segment(
        new_docs,
        f"{path}/segments/{new_id}",
        n_buckets,
        id_col,
        text_col,
    )
    _publish(path, segs + [new_id], n_buckets, stats)
    return new_id


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
    """BM25 top-k against a written (possibly multi-segment) index:
    per segment, read ONLY the query terms' bucket files (scan pruning
    numFiles-asserted in tests); merge statistics exactly across
    segments (df = sum of per-segment dfs over the PRUNED rows only —
    disjoint doc sets make every statistic additive); score with the
    shared expression; exact-decimal sum; TakeOrdered. Byte-equal to
    the live pipeline on the union corpus (the no-drift + the
    append-equals-rebuild claims, proven in-band and in tests)."""
    segs = segment_ids(path)
    n_buckets, stats = _seg_meta(spark, path, segs)
    n_docs = sum(stats[i][0] for i in segs)
    total_tokens = sum(stats[i][1] for i in segs)
    buckets = term_buckets(spark, query_terms, n_buckets)

    def pruned(i: int) -> DataFrame:
        return (
            spark.read.parquet(f"{path}/segments/{i}/postings")
            .where(
                F.col("tb").isin(buckets)
                & F.col("term").isin(query_terms)
            )
            .withColumn("seg", F.lit(i))
        )

    post = pruned(segs[0])
    for i in segs[1:]:
        post = post.unionByName(pruned(i))
    # exact global df from the pruned rows: per-segment df is constant
    # across a segment's rows for a term, and doc sets are disjoint
    df_g = (
        post.select("seg", "term", "df")
        .distinct()
        .groupBy("term")
        .agg(F.sum("df").alias("df_g"))
    )
    dl = spark.read.parquet(f"{path}/segments/{segs[0]}/lengths")
    for i in segs[1:]:
        dl = dl.unionByName(
            spark.read.parquet(f"{path}/segments/{i}/lengths")
        )
    terms = (
        post.drop("df")
        .join(F.broadcast(df_g), "term")
        .join(dl, "doc_id")
        .withColumn(
            "term_score",
            bm25_term_score(
                F.col("tf"),
                F.col("df_g"),
                F.col("dl"),
                F.lit(n_docs),
                F.lit(total_tokens),
            ),
        )
    )
    scored = terms.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_matched"),
        F.sum("term_score").alias("s"),
    )
    return scored.orderBy(F.desc("s"), F.asc("doc_id")).limit(k)


def postings_merge(spark, path: str, max_segments: int = 1) -> int:
    """Background SEGMENT MERGE (Lucene's tiered merge, one tier):
    compact segments into a fresh one WITHOUT re-tokenizing any
    document — tf rows and lengths union as-is, df re-aggregates by
    the same additivity that makes segmented search exact, and the
    merged meta is the sum of the parts.

    ``max_segments`` is the MERGE POLICY: a no-op (returns -1) while
    the live segment count is <= max_segments. When it fires, it
    merges only the SMALLEST ``count - max_segments + 1`` segments
    (by n_docs, id tiebreak — both read job-free from the manifest),
    leaving exactly max_segments live. That victim selection is the
    load-bearing scale property: a streaming foreachBatch calling
    this after every append pays O(recent deltas) per firing, and the
    big base segment is NEVER rewritten by routine firings (asserted
    byte-for-byte in tests) — merge-all would rewrite the whole
    100 TB corpus every few batches. ``max_segments=1`` degenerates
    to full compaction (every segment is a victim).

    Publication is ATOMIC via the manifest: the merged segment is
    fully written under the next id (unreferenced), ONE manifest
    rename flips readers from victims to the merged view, and only
    then are the victim dirs removed. A reader never sees victims and
    their merge together (the double-count hazard of a listdir-based
    view), and a crash mid-removal leaves only invisible orphans for
    :func:`postings_vacuum`. Search results are IDENTICAL before and
    after (the same theorem as append-equals-rebuild, tested).
    Returns the merged segment id."""
    import shutil

    segs = segment_ids(path)
    if len(segs) <= max_segments:
        return -1
    n_buckets, stats = _seg_meta(spark, path, segs)
    k = len(segs) - max_segments + 1
    victims = sorted(segs, key=lambda i: (stats[i][0], i))[:k]
    survivors = [i for i in segs if i not in victims]
    new_id = segs[-1] + 1

    def seg_post(i: int) -> DataFrame:
        return spark.read.parquet(
            f"{path}/segments/{i}/postings"
        ).withColumn("seg", F.lit(i))

    post = seg_post(victims[0])
    dl = spark.read.parquet(f"{path}/segments/{victims[0]}/lengths")
    for i in victims[1:]:
        post = post.unionByName(seg_post(i))
        dl = dl.unionByName(
            spark.read.parquet(f"{path}/segments/{i}/lengths")
        )
    # df re-derivation by ADDITIVITY (the same trick the search path
    # uses): per-segment df is constant across a segment's rows for a
    # term and doc sets are disjoint, so distinct (seg, term, df)
    # rows — which collapse map-side to ~vocab size because each
    # segment file is term-sorted — sum to the global df. A
    # countDistinct(doc_id) over the union would shuffle every
    # (term, doc_id) pair with zero map-side collapse.
    df_g = (
        post.select("seg", "term", "df")
        .distinct()
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    merged = (
        post.select("term", "doc_id", "tf")
        .join(df_g, "term")
        .withColumn(
            "tb",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
        .repartition("tb")
        .sortWithinPartitions("term", "doc_id")
    )
    merged.write.mode("overwrite").partitionBy("tb").parquet(
        f"{path}/segments/{new_id}/postings"
    )
    dl.write.mode("overwrite").parquet(
        f"{path}/segments/{new_id}/lengths"
    )
    merged_stats = (
        sum(stats[i][0] for i in victims),
        sum(stats[i][1] for i in victims),
    )
    _write_meta(
        f"{path}/segments/{new_id}",
        merged_stats[0],
        merged_stats[1],
        n_buckets,
    )
    # the commit point: victims -> merged view, survivors untouched
    _publish(
        path,
        survivors + [new_id],
        n_buckets,
        {**{i: stats[i] for i in survivors}, new_id: merged_stats},
    )
    for i in victims:
        shutil.rmtree(f"{path}/segments/{i}")
    return new_id


def postings_vacuum(path: str) -> list[int]:
    """Sweep ORPHAN segment dirs — ones present on disk but absent
    from the MANIFEST (left by a crash between a segment write and
    its manifest publish, or between a merge's publish and its
    old-dir removals). Safe for READERS because they only ever see
    manifest segments; NOT safe concurrently with WRITERS (ADVICE
    r11, same constraint vt_vacuum documents): an in-flight
    postings_write/merge's freshly written segment dir is an "orphan"
    until its manifest publishes, so a simultaneous vacuum would
    sweep it out from under the committer — run in a maintenance
    window. Manifest STAGINGS get an mtime age floor as a second
    guard (a live publisher's staging is seconds old; crash debris is
    not). Returns the swept segment ids."""
    import shutil
    import time as _time

    from ..sources.versioned import STAGING_AGE_FLOOR_SEC

    live = set(segment_ids(path))
    root = f"{path}/segments"
    orphans = sorted(
        int(d)
        for d in os.listdir(root)
        if d.isdigit() and int(d) not in live
    )
    for i in orphans:
        shutil.rmtree(f"{root}/{i}")
    # manifest stagings a crash left behind (invisible to readers —
    # the live MANIFEST is a different name — but sweepable garbage)
    now = _time.time()
    for f in os.listdir(path):
        if f.startswith("MANIFEST.tmp."):
            fp = os.path.join(path, f)
            try:
                if now - os.path.getmtime(fp) >= STAGING_AGE_FLOOR_SEC:
                    os.unlink(fp)
            except FileNotFoundError:
                pass  # another maintenance pass got there first
    return orphans


def phrase_occurrences(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact PHRASE matching via positional postings — the capability
    tf-bag retrieval (BM25) cannot express: "hash join" must match the
    two terms ADJACENT and IN ORDER, not merely co-present. The
    Lucene construction: each term's postings carry token positions;
    a phrase [t0..tn] matches at position p iff ti sits at p+i for
    every i, i.e. the intersection of the i-shifted position lists.

    Distributed shape: one posexplode produces the positional posting
    relation, filtered to the PHRASE TERMS ONLY before anything
    shuffles (the inverted-index discipline — at 100 TB the filter
    prunes the vocabulary to n terms); the n-way intersection is a
    fold of inner joins all keyed on (doc, shifted position), so
    every join after the first reuses the same hash partitioning —
    one exchange lineage, no re-shuffle per term. Returns
    (id_col, n_occ) with one row per matching doc. The written-index
    extension path is positions-in-postings (Lucene's proximity
    data, ~2x index size, same segment algebra as postings_write);
    the live pipeline here shares its semantics exactly.
    """
    if not terms:
        raise ValueError("phrase must have at least one term")
    w = docs.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    ).where(F.col("term").isin(terms))
    cur = w.where(F.col("term") == terms[0]).select(id_col, "pos")
    for i, t in enumerate(terms[1:], start=1):
        wi = w.where(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("pos")
        )
        cur = cur.join(wi, [id_col, "pos"])
    return cur.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_occ"))

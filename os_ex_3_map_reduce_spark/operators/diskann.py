"""DiskANN-style ON-DISK graph serving (Subramanya et al. NeurIPS'19,
the SSD-serving architecture the robust-prune operator exists for).

The paper's serving model has TWO storage tiers and the search is
designed around the asymmetry between them:

- **Disk (SSD) tier**: per-node blocks — the full-precision vector
  plus the node's (robust-pruned, low-out-degree) adjacency list —
  read ONLY when the walk actually visits the node. Out-degree is the
  I/O dial: robust prune keeps recall at low degree precisely so each
  visit reads a small block.
- **RAM tier**: the 32x-compressed PQ codes of the WHOLE corpus.
  Navigation never touches the disk vectors — candidate neighbors are
  scored approximately from their in-RAM codes (ADC), and only the
  best ``width`` candidates per round are promoted to a disk read.
- **Exact rerank for free**: every visited node's full vector was
  already paid for by its block read, so the final top-k reranks the
  visited set exactly, recovering most of the ADC approximation loss.

The Spark rendition keeps both tiers honest:

- the disk tier is a parquet relation partitioned by
  ``blk = vec_id % n_blocks`` with one file per block directory
  (the ``ivf_write`` repartition discipline), so a hop that visits
  ``b`` distinct blocks READS ``b`` files — asserted from the executed
  FileSourceScan's numFiles metric in tests, and accounted per hop by
  the search (``_osx3_io``);
- the RAM tier is the :func:`~.pq.pq_encode` code relation, cached by
  the caller (`.persist()` = "resident"); per-hop candidate lookups
  filter it by the bounded candidate id set;
- the walk state (Q x beam ids + scores) lives on the driver — the
  same bounded-constant discipline as every probe-list pick: the
  corpus never moves, only tiny id sets do. At 100 TB the node blocks
  and codes stay partitioned across the cluster and each hop's two
  lookups are pruned scans; for very large query batches, partition
  the batch across jobs (the state is per-query, nothing is shared).

Entry point is the corpus MEDOID (the vector closest to the exact
integer-summed corpus mean) — the Vamana entry rule, and the upgrade
q_robust_prune's low-degree findings call for; deterministic because
the mean comes from order-independent DECIMAL sums and the argmax is
(rounded cosine desc, vec_id asc).

Everything is deterministic end-to-end (half-away-rounded scores, id
tiebreaks, sorted frontier picks, hop caps), so results pin per scale
exactly like the other seeded ANN paths.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .nsw import nsw_build, robust_prune
from .pq import pq_encode
from .similarity import round_half_away


def _symmetrize(pruned: DataFrame) -> DataFrame:
    """Vamana's reverse-edge insertion: the pruned DIRECTED graph gets
    its reverse arcs so the walk can navigate against edge direction;
    out-degree stays bounded by 2*k_out without the paper's re-prune
    pass (fixture degrees land ~1.25x k_out, measured in
    q_robust_prune's in-band rows)."""
    return (
        pruned.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                    F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
                )
            ).alias("x"),
            "score",
        )
        .select(F.col("x.s").alias("src"), F.col("x.d").alias("dst"), "score")
        .groupBy("src", "dst")
        .agg(F.max("score").alias("score"))
    )


def corpus_medoid(
    emb_df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> int:
    """The id of the vector with the highest rounded cosine to the
    corpus mean (ties: smallest id) — DiskANN's fixed entry point.
    The mean is exact and partitioning-invariant: each component is
    cast to DECIMAL(38,6) (a deterministic half-up grid) and summed
    as exact decimals, so the broadcast mean constant — and with it
    the medoid — never depends on row order."""
    rel = emb_df.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).cast("array<double>").alias("e"),
    )
    first = rel.select(F.size("e").alias("d")).first()
    if first is None:
        raise ValueError("corpus_medoid: empty corpus")
    d = int(first.d)
    sums = rel.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.element_at("e", i + 1).cast("decimal(38,6)")).alias(f"s{i}")
            for i in range(d)
        ],
    ).collect()[0]
    n = int(sums["__n"])
    mean = np.array([float(sums[f"s{i}"]) for i in range(d)]) / n
    from ..functions.vectors import cosine_to_query

    top = (
        rel.select(
            "vec_id",
            F.round(cosine_to_query("e", [float(x) for x in mean]), 4).alias(
                "c"
            ),
        )
        .orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(1)
        .collect()
    )
    return int(top[0].vec_id)


def diskann_write(
    emb_df: DataFrame,
    centroids: "np.ndarray",
    codebooks: "np.ndarray",
    path: str,
    k_graph: int = 8,
    k_out: int = 4,
    alpha: float = 1.2,
    n_blocks: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> None:
    """Materialize the two-tier DiskANN index at ``path``:

    - ``nodes/``  — the disk tier: (vec_id, e, nbrs) blocks,
      partitioned by ``blk = vec_id % n_blocks``, ONE file per block
      dir (repartition-by-partition-column before write, the
      ``ivf_write`` discipline) so files-read == blocks-visited;
    - ``codes/`` — the RAM tier: PQ codes of every vector;
    - ``meta/``  — one row: (medoid, n_blocks).

    The graph is build -> robust-prune(alpha, k_out) -> reverse-edge
    insertion; adjacency is packed per node as a SORTED id array
    (neighbor priority is ADC's job at search time, not the layout's).
    """
    rel = emb_df.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).cast("array<double>").alias("e"),
    )
    graph = _symmetrize(
        robust_prune(
            rel,
            nsw_build(rel, centroids, k_graph=k_graph, emb_col="e"),
            alpha=alpha,
            k_out=k_out,
            emb_col="e",
        )
    )
    adj = graph.groupBy("src").agg(
        F.array_sort(F.collect_list("dst")).alias("nbrs")
    )
    nodes = (
        rel.join(adj, rel.vec_id == adj.src, "left")
        .select(
            "vec_id",
            "e",
            F.coalesce("nbrs", F.array().cast("array<bigint>")).alias("nbrs"),
        )
        .withColumn("blk", (F.col("vec_id") % n_blocks).cast("int"))
    )
    nodes.repartition("blk").write.mode("overwrite").partitionBy(
        "blk"
    ).parquet(f"{path}/nodes")
    pq_encode(rel, codebooks, id_col="vec_id", emb_col="e").write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    medoid = corpus_medoid(rel, id_col="vec_id", emb_col="e")
    # Driver-side pyarrow write (r16; the save_centroids /_write_meta
    # precedent): the meta row is two driver-held ints — a Spark
    # repartition(1) write job was pure scheduling overhead. Same
    # schema (long, int); the reader below uses a dataset read, so
    # legacy Spark-written meta dirs stay readable.
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"{path}/meta"
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "medoid": pa.array([int(medoid)], pa.int64()),
                "n_blocks": pa.array([int(n_blocks)], pa.int32()),
            }
        ),
        f"{d}/part-00000.parquet",
    )


def read_node_blocks(
    nodes_df: DataFrame, ids: list[int], n_blocks: int
) -> DataFrame:
    """The per-hop disk read: filter the block-partitioned node
    relation to the frontier's ids. The ``blk`` predicate prunes at
    the partitioned scan — a hop touching ``b`` distinct blocks reads
    exactly ``b`` files (executed-plan numFiles asserted in tests);
    the ``vec_id`` predicate lands as a parquet pushed filter inside
    them. Split out of the search loop so tests can assert the
    pruning on the identical plan the search executes."""
    blocks = sorted({int(i) % n_blocks for i in ids})
    return nodes_df.where(
        F.col("blk").isin(blocks) & F.col("vec_id").isin([int(i) for i in ids])
    )


def diskann_search_batch(
    spark,
    path: str,
    codebooks: "np.ndarray",
    query_vectors: list[list[float]],
    k: int = 5,
    beam: int = 8,
    width: int = 2,
    max_hops: int = 16,
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """Batched DiskANN beam search against a written two-tier index.

    Per round (all Q queries together): each query promotes its best
    ``width`` unvisited candidates (by in-RAM ADC score) to a DISK
    read — one pruned scan of ``nodes/`` for the union of frontiers —
    then scores the newly exposed neighbors from their in-RAM codes
    and trims its candidate list back to ``beam``. ``width`` is the
    I/O-per-round dial (DiskANN's beam width ``W``): W=1 is the
    greedy minimum-I/O walk (more rounds), larger W amortizes rounds
    against more reads. Terminates when no query has an unvisited
    candidate left, or at ``max_hops``.

    The final top-k RERANKS each query's visited set by exact
    full-vector cosine — the vectors came back with the block reads,
    so exactness over the visited set costs zero extra I/O (the
    paper's trick for recovering ADC loss).

    Returns (query_id, vec_id, score, rank) with ``score`` the EXACT
    rounded cosine. I/O ledger on ``_osx3_io``: per-hop
    (files_read, nodes_read) plus totals — files_read is arithmetic
    (distinct blocks) and equals the executed scan's numFiles by the
    write layout (asserted in tests)."""
    m, ksub, dsub = codebooks.shape
    Q = np.asarray(query_vectors, dtype=np.float64)
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    if not np.all(norms > 0):
        raise ValueError("diskann_search_batch: zero-norm query vector")
    Qn = Q / norms
    nq = len(Qn)
    # per-query ADC lookup tables (m x ksub), driver-side constants
    luts = [
        np.stack(
            [codebooks[j] @ Qn[qi, j * dsub : (j + 1) * dsub] for j in range(m)]
        )
        for qi in range(nq)
    ]
    import pyarrow.parquet as _pq

    meta = _pq.read_table(f"{path}/meta")  # dir read: legacy parts OK
    medoid = int(meta["medoid"][0].as_py())
    n_blocks = int(meta["n_blocks"][0].as_py())
    nodes_rel = spark.read.parquet(f"{path}/nodes")
    codes_rel = (
        codes_df
        if codes_df is not None
        else spark.read.parquet(f"{path}/codes")
    )

    def adc_scores(code_rows: dict[int, np.ndarray], qi: int) -> dict[int, float]:
        if not code_rows:
            return {}
        ids = sorted(code_rows)
        codes = np.stack([code_rows[i] for i in ids])
        s = round_half_away(
            luts[qi][np.arange(m), codes].sum(axis=1), 4
        )
        return {i: float(v) for i, v in zip(ids, s)}

    def fetch_codes(ids: list[int]) -> dict[int, np.ndarray]:
        if not ids:
            return {}
        rows = codes_rel.where(
            F.col("vec_id").isin([int(i) for i in ids])
        ).collect()
        return {
            int(r.vec_id): np.asarray(r.code, dtype=np.int64) for r in rows
        }

    # driver walk state: per query, every seen candidate's ADC score,
    # the visited subset's exact score, bounded by beam + reads
    cand: list[dict[int, float]] = [dict() for _ in range(nq)]
    visited: list[dict[int, float]] = [dict() for _ in range(nq)]
    seed_codes = fetch_codes([medoid])
    for qi in range(nq):
        cand[qi].update(adc_scores(seed_codes, qi))
    io: list[tuple[int, int]] = []  # (files_read, nodes_read) per hop
    for _ in range(max_hops):
        frontiers: list[list[int]] = []
        for qi in range(nq):
            unvisited = [
                (s, i)
                for i, s in cand[qi].items()
                if i not in visited[qi]
            ]
            # candidate list is trimmed to beam each round; pick the
            # best `width` of what survives, deterministically
            unvisited.sort(key=lambda t: (-t[0], t[1]))
            frontiers.append([i for _, i in unvisited[:width]])
        all_ids = sorted({i for f in frontiers for i in f})
        if not all_ids:
            break
        block_df = read_node_blocks(nodes_rel, all_ids, n_blocks)
        rows = {int(r.vec_id): r for r in block_df.collect()}
        io.append((len({i % n_blocks for i in all_ids}), len(all_ids)))
        new_ids: set[int] = set()
        for qi in range(nq):
            for i in frontiers[qi]:
                r = rows[i]
                e = np.asarray(r.e, dtype=np.float64)
                nrm = np.linalg.norm(e)
                exact = float(
                    round_half_away(
                        np.array([(e / nrm) @ Qn[qi] if nrm > 0 else 0.0]), 4
                    )[0]
                )
                visited[qi][i] = exact
                for nb in r.nbrs:
                    if int(nb) not in cand[qi]:
                        new_ids.add(int(nb))
        nb_codes = fetch_codes(sorted(new_ids))
        for qi in range(nq):
            fresh = {
                int(nb)
                for i in frontiers[qi]
                for nb in rows[i].nbrs
                if int(nb) not in cand[qi]
            }
            scored = adc_scores(
                {i: nb_codes[i] for i in fresh if i in nb_codes}, qi
            )
            cand[qi].update(scored)
            # trim the candidate list back to beam (visited entries
            # kept regardless — they are the rerank set)
            ranked = sorted(cand[qi].items(), key=lambda t: (-t[1], t[0]))
            keep = {i for i, _ in ranked[:beam]} | set(visited[qi])
            cand[qi] = {i: s for i, s in cand[qi].items() if i in keep}
    out_rows = []
    for qi in range(nq):
        ranked = sorted(visited[qi].items(), key=lambda t: (-t[1], t[0]))
        for rk, (i, s) in enumerate(ranked[:k], start=1):
            out_rows.append((qi, i, s, rk))
    out = spark.createDataFrame(
        out_rows, "query_id int, vec_id long, score double, rank int"
    )
    out._osx3_io = {  # type: ignore[attr-defined]
        "hops": len(io),
        "per_hop": io,
        "files_read": sum(f for f, _ in io),
        "nodes_read": sum(n for _, n in io),
    }
    return out

"""DiskANN two-tier on-disk serving (operators/diskann.py): block-read
pruning asserted from executed numFiles, the I/O ledger's arithmetic
tied to the physical layout, exact rerank scores, medoid determinism,
and degenerate corpora."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from os_ex_3_map_reduce_spark.operators.diskann import (
    corpus_medoid,
    diskann_search_batch,
    diskann_write,
    read_node_blocks,
)
from os_ex_3_map_reduce_spark.operators.pq import pq_train
from os_ex_3_map_reduce_spark.operators.similarity import (
    round_half_away,
    train_centroids_sample,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = train_centroids_sample(emb, 16)
    cbs = pq_train(emb, m=32, ksub=16)
    path = str(tmp_path_factory.mktemp("diskann") / "idx")
    diskann_write(emb, cents, cbs, path)
    return emb, cbs, path


def _scanned_files(df):
    plan = df._jdf.queryExecution().executedPlan()
    plan.executeCollect()

    def find_scan(node):
        if node.metrics().contains("numFiles"):
            return node
        if node.nodeName() == "AdaptiveSparkPlan":
            return find_scan(node.executedPlan())
        if "QueryStage" in node.getClass().getSimpleName():
            return find_scan(node.plan())
        kids = node.children()
        for i in range(kids.size()):
            hit = find_scan(kids.apply(i))
            if hit is not None:
                return hit
        return None

    scan = find_scan(plan)
    assert scan is not None, "no FileSourceScan leaf with numFiles metric"
    return int(scan.metrics().apply("numFiles").value())


def test_one_file_per_block_dir(spark, index):
    """The write discipline behind the whole I/O claim: every blk=
    directory holds exactly one parquet file, so files-read ==
    blocks-visited."""
    _, _, path = index
    nodes = spark.read.parquet(f"{path}/nodes")
    per_dir = (
        nodes.select(F.input_file_name().alias("f"), "blk")
        .distinct()
        .groupBy("blk")
        .count()
        .collect()
    )
    assert len(per_dir) == 16
    assert all(r["count"] == 1 for r in per_dir)


def test_block_read_prunes_at_scan(spark, index):
    """A frontier touching b of the 16 blocks READS b files — the
    executed FileSourceScan numFiles metric, not plan text."""
    _, _, path = index
    nodes = spark.read.parquet(f"{path}/nodes")
    ids = [0, 16, 32, 5]  # blocks {0, 5}: 3 ids collide on block 0
    df = read_node_blocks(nodes, ids, 16)
    assert sorted(int(r.vec_id) for r in df.collect()) == sorted(ids)
    assert _scanned_files(df) == 2
    assert _scanned_files(nodes) == 16


def test_io_ledger_matches_layout(spark, index):
    """The search's arithmetic ledger is the physical truth: per hop,
    files_read == distinct blocks of that hop's node reads, and the
    totals add up."""
    emb, cbs, path = index
    qvs = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id") < 2).collect()
    ]
    res = diskann_search_batch(
        spark, path, cbs, qvs, k=5, beam=16, width=2, max_hops=8
    )
    res.collect()
    io = res._osx3_io
    assert io["hops"] == len(io["per_hop"]) <= 8
    assert io["files_read"] == sum(f for f, _ in io["per_hop"])
    assert io["nodes_read"] == sum(n for _, n in io["per_hop"])
    # every hop's file count is bounded by its node count and by the
    # block universe — the two invariants the accounting rests on
    assert all(f <= min(n, 16) for f, n in io["per_hop"])


def test_self_query_and_exact_rerank(spark, index):
    """A corpus vector used as the query must come back rank-1 at
    score 1.0, and every returned score must equal the independently
    recomputed rounded exact cosine (the rerank is exact, not ADC)."""
    emb, cbs, path = index
    probe = emb.where(F.col("vec_id") == 7).collect()[0]
    qv = [float(x) for x in probe.embedding]
    res = diskann_search_batch(
        spark, path, cbs, [qv], k=5, beam=16, width=4, max_hops=16
    )
    rows = sorted(res.collect(), key=lambda r: r.rank)
    assert rows[0].vec_id == 7 and rows[0].score == 1.0
    by_id = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    q = np.asarray(qv)
    qn = q / np.linalg.norm(q)
    for r in rows:
        e = by_id[int(r.vec_id)]
        expect = float(
            round_half_away(np.array([(e / np.linalg.norm(e)) @ qn]), 4)[0]
        )
        assert r.score == expect


def test_width_dial_monotone_io(spark, index):
    """The paper's beam-width trade, measured: wider beams read more
    nodes per round and finish in fewer (or equal) rounds."""
    emb, cbs, path = index
    qvs = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id") < 3).collect()
    ]
    r1 = diskann_search_batch(
        spark, path, cbs, qvs, k=5, beam=16, width=1, max_hops=16
    )
    r4 = diskann_search_batch(
        spark, path, cbs, qvs, k=5, beam=16, width=4, max_hops=16
    )
    r1.collect(), r4.collect()
    io1, io4 = r1._osx3_io, r4._osx3_io
    assert io4["hops"] <= io1["hops"]
    assert io4["nodes_read"] >= io1["nodes_read"]


def test_medoid_partitioning_invariant(spark):
    """The DECIMAL-sum mean makes the medoid independent of row order
    and shuffle width."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    got = []
    try:
        for p in ("3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", p)
            got.append(corpus_medoid(emb.repartition(int(p))))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert got[0] == got[1]


def test_tiny_corpus_no_crash(spark, tmp_path):
    """Corpus smaller than beam/width: the walk exhausts the graph and
    returns what is reachable, never errors."""
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .where(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
    )
    cents = train_centroids_sample(emb, 4)
    cbs = pq_train(emb, m=32, ksub=4)
    path = str(tmp_path / "tiny")
    diskann_write(emb, cents, cbs, path, n_blocks=4)
    qv = [
        [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0].embedding]
    ]
    res = diskann_search_batch(
        spark, path, cbs, qv, k=5, beam=16, width=4, max_hops=16
    )
    rows = res.collect()
    assert 1 <= len(rows) <= 5
    assert rows[0].vec_id == 0

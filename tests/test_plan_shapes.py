"""Physical-plan shape assertions — the 100 TB scale contract.

Correctness says a query returns the right rows; these tests say it
returns them with the right *plan*: small dims broadcast, filters and
projections pushed into the parquet scan, aggregations partial before
the shuffle, top-k without a global sort. A regression here is a
performance bug even while every value stays correct.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from os_ex_3_map_reduce_spark.plans import all_queries
from os_ex_3_map_reduce_spark.plans.explain import (
    explain_str,
    pushed_filters,
    read_schema,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_broadcast_join_is_broadcast(spark, qs):
    plan = explain_str(qs["q_join_broadcast"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # the fact table must not shuffle for the join itself
    assert "SortMergeJoin" not in plan


def test_sortmerge_join_hint_respected(spark, qs):
    plan = explain_str(qs["q_join_sortmerge"](spark, SF))
    assert "SortMergeJoin" in plan


def test_filter_and_projection_reach_the_scan(spark, qs):
    df = qs["q_filter_project"](spark, SF)
    assert pushed_filters(df).count("PushedFilters: []") == 0, (
        "no filters were pushed to the parquet scan:\n" + explain_str(df)
    )
    # column pruning: lineitem has 16 columns; the scan must read fewer.
    rs = read_schema(df)
    assert rs and "l_comment" not in rs


def test_agg_is_partial_before_shuffle(spark, qs):
    """Two HashAggregate nodes (partial + final) ⇒ map-side combine."""
    plan = explain_str(qs["q_agg_pricing_summary"](spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_topk_avoids_global_sort(spark, qs):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k then driver merge), not a full sort-exchange of all rows."""
    plan = explain_str(qs["q_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_wordcount_flagship_shape(spark, qs):
    plan = explain_str(qs["q_wordcount"](spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial+final count
    assert "TakeOrderedAndProject" in plan  # top-10 without global sort


def test_similarity_topk_has_no_shuffle(spark, qs):
    """Brute-force query-vector top-k is scan → project → take-ordered;
    a shuffle here would mean the operator doesn't scale linearly."""
    plan = explain_str(qs["q_similarity_topk"](spark, SF))
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark, qs):
    """EXISTS must plan as a semi join (no row multiplication), and the
    tiny filtered build side should broadcast."""
    plan = explain_str(qs["q_join_semi"](spark, SF))
    assert "LeftSemi" in plan


def test_multiway_join_broadcasts_all_dims(spark, qs):
    """region/nation/supplier are tiny: the 3-way dim chain must be all
    broadcast joins — zero shuffles of the fact table for joining."""
    plan = explain_str(qs["q_join_multiway"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_exact_dedup_single_shuffle(spark, qs):
    """Dedup via window: exactly one hash-partition exchange on the key
    (plus possibly one for the final join); never a cartesian."""
    plan = explain_str(qs["q_dedup_exact"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_agg_exact_and_two_stage(spark, qs):
    """Salted aggregation must equal the direct group-by exactly, and
    its plan must contain the two aggregation stages over the salt."""
    from .conftest import SF_CORRECT

    got = {
        (r.event_type, r.n, round(r.sum_value, 6))
        for r in qs["q_salted_agg"](spark, SF_CORRECT).collect()
    }
    direct = {
        (r.event_type, r.n, round(r.sum_value, 6))
        for r in qs["q_events_hourly"](spark, SF_CORRECT)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sum_value"), 10).alias("sum_value"))
        .collect()
    }
    assert {g[0] for g in got} == {d[0] for d in direct}
    assert {(g[0], g[1]) for g in got} == {(d[0], d[1]) for d in direct}


def test_approx_distinct_error_bounded(spark, qs):
    from .conftest import SF_CORRECT

    from os_ex_3_map_reduce_spark.sources.tables import load_table

    row = qs["q_approx_distinct"](spark, SF_CORRECT).first()
    li = load_table(spark, SF_CORRECT, "lineitem")
    exact_orders = li.select("l_orderkey").distinct().count()
    exact_parts = li.select("l_partkey").distinct().count()
    assert abs(row.approx_orders - exact_orders) / exact_orders < 0.05
    assert abs(row.approx_parts - exact_parts) / exact_parts < 0.05


def test_shipping_priority_shape(spark, qs):
    """TPC-H Q3 shape: filtered dim broadcasts; date predicates reach
    the scans; the limit plans as TakeOrdered."""
    df = qs["q_shipping_priority"](spark, SF)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    pf = pushed_filters(df)
    assert "o_orderdate" in pf and "l_shipdate" in pf and "c_mktsegment" in pf


def test_range_join_is_broadcast_nlj(spark, qs):
    """Pure inequality join against a tiny bands table: the fact side
    must not shuffle — BroadcastNestedLoopJoin, never a cartesian or a
    sort-merge on a fabricated key."""
    plan = explain_str(qs["q_join_range"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_has_no_join_operator(spark, qs):
    """The as-of join is implemented join-free (union + window carry-
    forward): one hash partition by user, linear in rows. Any *Join node
    in the plan means the scalable strategy regressed."""
    plan = explain_str(qs["q_join_asof"](spark, SF))
    assert "Window" in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node


def test_gapfill_filter_pushed(spark, qs):
    """The sparse-slice predicate must reach the parquet scan; the dense
    spine is built from a 2-row agg, not a driver loop."""
    df = qs["q_time_gapfill"](spark, SF)
    assert "value" in pushed_filters(df)


def test_cents_agg_invariant_to_partitioning(spark, qs):
    """The integer-cents fast path must be bit-identical under any
    shuffle/input partitioning (int sums are associative; the decimal
    final merge is exact) — the property the decimal rule used to buy."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(repr, qs["q_agg_pricing_summary"](spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = sorted(map(repr, qs["q_agg_pricing_summary"](spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_lateral_decorrelates(spark, qs):
    """The correlated LATERAL aggregate must decorrelate to a plain
    aggregate + join — never a per-row re-execution (no nested-loop,
    no cartesian)."""
    plan = explain_str(qs["q_lateral"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_approx_percentiles_rank_error(spark, qs):
    """GK-sketch estimates must be actual data values within the
    accuracy-implied rank neighborhood of the exact percentile."""
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    got = {r.o_orderpriority: r for r in
           qs["q_approx_percentiles"](spark, SF).collect()}
    orders = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    for prio, grp in orders.groupby("o_orderpriority"):
        vals = sorted(grp["o_totalprice"])
        n = len(vals)
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            est = got[prio][col]
            # rank window: accuracy=1e4 → eps=1e-4; allow ±(eps*n + 1)
            lo = max(0, int(q * n) - int(1e-4 * n) - 2)
            hi = min(n - 1, int(q * n) + int(1e-4 * n) + 2)
            assert vals[lo] <= est <= vals[hi], (prio, col, est)


def test_exact_pair_similarity_builds_without_driver_jobs(spark):
    """topk_pairs/threshold_pairs must be fully lazy plans: no
    toPandas/collect of the embedding relation during plan construction
    (the round-1 implementation materialized the whole table on the
    driver to build a broadcast matrix — a driver OOM at scale)."""
    from os_ex_3_map_reduce_spark.operators.similarity import (
        threshold_pairs,
        topk_pairs,
    )
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    sc = spark.sparkContext
    sc.setJobGroup("similarity-construct", "plan construction must be lazy")
    try:
        df1 = topk_pairs(emb, k=20)
        df2 = threshold_pairs(emb, threshold=0.4)
        jobs = sc.statusTracker().getJobIdsForGroup("similarity-construct")
        assert jobs == [], f"plan construction ran driver-side jobs: {jobs}"
    finally:
        sc.setJobGroup(None, None)
    # and the plans still execute correctly (non-empty, no exchange of
    # raw pairs beyond the packed-block join)
    assert df1.count() == 20
    assert df2.count() > 0


def test_block_outer_product_single_shuffle_no_broadcast(spark):
    """The replicate-and-gather block product must plan as ONE exchange
    (the groupBy gather) with no broadcast and no nested-loop join: the
    round-2 theta-join shape broadcast the ENTIRE packed dataset
    (BroadcastNestedLoopJoin) and re-exchanged it via an explicit
    repartition — both scale hazards this rewrite removed."""
    from os_ex_3_map_reduce_spark.operators.similarity import threshold_pairs
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    plan = threshold_pairs(emb, threshold=0.4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert plan.count("Exchange") <= 1, plan


def test_aqe_splits_skewed_join_partition(spark):
    """SURVEY 2.4 claims AQE handles skewed joins at runtime — prove it:
    a 90%-hot-key sort-merge join must re-plan with the hot partition
    SPLIT (SortMergeJoin(skew=true) in the final adaptive plan), the
    runtime complement to the explicit salted_join primitive."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 97 END AS k", "id AS v"
        )
        right = spark.range(0, 97).selectExpr("id AS k", "id * 2 AS w")
        j = left.hint("merge").join(right, "k")
        assert len(j.collect()) == 300_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """The other AQE runtime lever (SURVEY 2.4): a tiny aggregate shuffled
    into 32 partitions must read back coalesced (AQEShuffleRead
    'coalesced' in the final plan) — small-partition overhead is folded
    at runtime instead of hand-tuning shuffle.partitions per query."""
    df = spark.range(0, 10_000).selectExpr("id % 5 AS k").groupBy("k").count()
    # collect() (not .count()) so the inspected queryExecution is the one
    # that actually ran and finalized adaptively
    assert len(df.collect()) == 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_bucketed_join_has_no_exchange_on_key(spark, qs):
    """q_join_bucketed: both sides pre-bucketed+sorted on the key, so
    the pinned sort-merge join must carry NO exchange and no sort on
    the join inputs — the bucket layout does the co-location."""
    plan = (
        qs["q_join_bucketed"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan, plan


def test_range_frame_rewrite_equals_native_frame(spark, qs):
    """q_window_range_frame is executed as prefix scans + as-of boundary
    lookup (O(n log n)) instead of Spark's native sliding RANGE frame
    (O(n x avg-frame): aggregates can't retract, the frame replays per
    row). The rewrite must be row-for-row identical to the native
    operator — including value-peer handling at both band edges."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 10000).cast("long")
    native = orders.select(
        "o_orderkey",
        F.count("*").over(w).alias("n_in_band"),
        (F.sum(cents).over(w).cast("double") / 10000).alias("band_sum"),
    )
    got = sorted(map(tuple, qs["q_window_range_frame"](spark, SF).collect()))
    want = sorted(map(tuple, native.collect()))
    assert got == want


def test_salted_join_spreads_keys_and_preserves_semantics(spark):
    """salted_join must (a) join on (key, salt) — visible in the plan —
    and (b) return exactly the plain join's rows, including left-join
    unmatched rows exactly once despite the small side's replication."""
    from pyspark.sql import functions as F
    from os_ex_3_map_reduce_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(300)] + [(1000, 99, "orphan")],
        "pk long, k long, payload string",
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "sk long, name string"
    )
    for how in ("inner", "left"):
        got = sorted(
            map(
                tuple,
                salted_join(
                    big, small, on=[("k", "sk")], distribute_by=["pk"], how=how
                )
                .select("pk", "k", "payload", "name")
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                big.join(small, big.k == small.sk, how)
                .select("pk", "k", "payload", "name")
                .collect(),
            )
        )
        assert got == want, how
    # salt participates in the join keys (spreads each hot key)
    plan = explain_str(
        salted_join(big, small, on=[("k", "sk")], distribute_by=["pk"])
    )
    assert "__salt" in plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(big, small, on=[("k", "sk")], distribute_by=["pk"], how="full")


def test_block_pair_results_invariant_to_blocking(spark):
    """Exact-pair results must not depend on the physical blocking: any
    num_blocks and any shuffle-partition setting produce identical rows
    (the local-top-k ordering matches the global ordering, so block
    boundaries can't swallow a boundary pair)."""
    from os_ex_3_map_reduce_spark.operators.similarity import (
        threshold_pairs,
        topk_pairs,
    )
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    ref_top = sorted(map(tuple, topk_pairs(emb, k=20, num_blocks=4).collect()))
    ref_thr = sorted(map(tuple, threshold_pairs(emb, 0.4, num_blocks=4).collect()))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for blocks, parts in ((1, "3"), (7, "5"), (16, "64")):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            assert (
                sorted(map(tuple, topk_pairs(emb, k=20, num_blocks=blocks).collect()))
                == ref_top
            ), (blocks, parts)
            assert (
                sorted(
                    map(tuple, threshold_pairs(emb, 0.4, num_blocks=blocks).collect())
                )
                == ref_thr
            ), (blocks, parts)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout must show up as PartitionFilters in
    the scan (directory pruning — at 100 TB the difference between
    reading one partition and reading the lake). Also asserts the
    pruned read returns exactly the partition's rows."""
    from os_ex_3_map_reduce_spark.sources.io import write_table
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = str(tmp_path / "orders_by_priority")
    write_table(orders, out, partition_by=["o_orderpriority"])

    pri = orders.select("o_orderpriority").first()[0]
    back = spark.read.parquet(out).where(F.col("o_orderpriority") == pri)
    plan = explain_str(back)
    assert "PartitionFilters: [" in plan
    # the partition predicate must appear as a partition filter (pruned
    # at planning), not only as a post-scan data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderpriority" in pf
    want = orders.where(F.col("o_orderpriority") == pri).count()
    assert back.count() == want


def test_binaryfile_ingest_matches_local_decode(spark):
    """The binaryFile-source ingestion must equal the local
    encode→decode per doc (real codec both ways)."""
    from os_ex_3_map_reduce_spark.operators.multimodal import (
        binaryfile_image_stats,
        fake_decode_image,
        staged_bmp_dir,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: (r.byte_len, r.height, r.width, r.mean_pixel)
        for r in binaryfile_image_stats(spark, staged_bmp_dir(spark, sf)).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in docs.limit(5).collect()]
    assert len(got) == docs.count()
    for doc_id, text in rows:
        img = fake_decode_image(text.encode(), 4, 4)
        assert got[doc_id] == (102, 4, 4, float(img.astype("int64").sum()) / 48)


def test_bloom_probe_prunes_before_the_shuffle(spark, qs):
    """The bloom pre-filter must run BELOW the exact join's exchange so
    pruned rows never shuffle (the operator's whole point), and stay
    whole-stage-codegen JVM work: a one-row broadcast attach
    (nested-loop on a single row), no Python eval. Formatted-plan node
    numbers are execution order (smaller = deeper = earlier), so the
    bloom attach must number below the sort-merge semi join."""
    import re

    plan = explain_str(qs["q_bloom_semijoin"](spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    bnlj = re.search(r"\((\d+)\) BroadcastNestedLoopJoin", plan)
    smj = re.search(r"\((\d+)\) SortMergeJoin", plan)
    assert bnlj and smj, plan
    assert int(bnlj.group(1)) < int(smj.group(1)), plan


def test_sessionize_single_partitioning_reused(spark, qs):
    """Both window passes and the final session aggregate run on ONE
    hash partitioning by user_id: exactly one exchange node in the
    plan (formatted explain prints each node twice — tree line plus
    detail header — so count the numbered detail headers)."""
    import re

    plan = explain_str(qs["q_sessionize"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_simhash_fused_pairgen_has_two_exchanges(spark, qs):
    """Round-7 exchange fusion: pair emission is globally unique (each
    pair surfaces only at its first matching chunk), so the plan has
    exactly the UDF repartition + the bucket group-by — a third
    exchange node reappearing means dropDuplicates crept back in."""
    import re

    plan = explain_str(qs["q_simhash_neardup"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_pii_redact_is_narrow_map_only(spark, qs):
    """De-identification is a pure projection: no exchange, no UDF —
    the whole query must stay inside one whole-stage-codegen scan."""
    import re

    plan = explain_str(qs["q_pii_redact"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_profile_stats_is_single_pass(spark, qs):
    """One scan of documents: the 5x exact-distinct profile plans as an
    Expand + two-phase agg over a single FileScan — a second scan means
    the per-column stats were computed as separate jobs."""
    import re

    plan = explain_str(qs["q_profile_stats"](spark, SF))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Expand" in plan  # count-distinct expansion, not N scans


def test_zorder_cluster_aggregates_jvm_side(spark, qs):
    """The Morton code must be pure JVM expression work: no Python eval
    nodes, bounds attached via broadcast (BroadcastNestedLoopJoin over
    one row), and the cell aggregation partial before its shuffle."""
    plan = explain_str(qs["q_zorder_cluster"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2


def test_incremental_agg_merges_partials(spark, qs):
    """The union-of-partial-states shape: two branch aggregations (each
    partial+final) then the merge agg — and the split predicate reaches
    both parquet scans as a pushed filter."""
    df = qs["q_incremental_agg"](spark, SF)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 4, plan
    assert pushed_filters(df).count("PushedFilters: []") <= 1, (
        "cutoff predicate not pushed into the orders scans:\n" + plan
    )


def test_kmeans_assign_points_never_hash_shuffle(spark, qs):
    """Centroid assignment closes over the k seed vectors and computes
    every distance + the argmin inside ONE Arrow-batched kernel pass:
    the points never hash-shuffle — only 8-group aggregate rows cross
    an exchange (final agg + output sort = at most 2), and the kernel
    is vectorized (MapInPandas), never row-at-a-time Python."""
    import re

    plan = explain_str(qs["q_kmeans_assign"](spark, SF))
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


def test_setsim_prefix_stays_jvm_side(spark, qs):
    """The exact set-similarity join is groupBy/join shuffles over
    built-in expressions only — no Python eval anywhere."""
    plan = explain_str(qs["q_setsim_prefix"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_time_interpolate_reuses_one_partitioning(spark, qs):
    """Both carry-forward window directions share one hash partitioning
    by event_type — never a global-order (single-partition) window —
    and the sparse-slice predicate reaches the events scan."""
    import re

    df = qs["q_time_interpolate"](spark, SF)
    plan = explain_str(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan, plan
    assert "value" in pushed_filters(df)
    # hourly agg + window partitioning (+ possibly the span agg/spine
    # join) — a regression to per-direction re-shuffles would exceed 4
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4, plan


def test_sample_weighted_scan_is_two_level(spark, qs):
    """The distributed prefix sum must window the DATA under a hash
    partitioning on the range bucket (parallel local scans) and attach
    bucket offsets via broadcast — the only single-partition window
    allowed is the tiny per-bucket-totals tier."""
    plan = explain_str(qs["q_sample_weighted"](spark, SF))
    assert "hashpartitioning(__bkt" in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # offsets join, not shuffled


def test_event_transitions_window_is_partitioned(spark, qs):
    """The LEAD window must run under hashpartitioning(user_id) — a
    global-order window (SinglePartition) would serialize the scan."""
    plan = explain_str(qs["q_event_transitions"](spark, SF))
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan, plan


def test_gini_ranks_inside_nation_partitions(spark, qs):
    """Lorenz ranks come from a nation-partitioned window (every nation
    sorts independently) and the name lookup broadcasts — no global
    sort of customers, no shuffled dim join."""
    plan = explain_str(qs["q_gini"](spark, SF))
    assert "hashpartitioning(c_nationkey" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_mad_robust_broadcasts_stats_not_data(spark, qs):
    """Both percentile passes broadcast their 5-row statistics back to
    the scan — the events rows themselves never shuffle-join."""
    plan = explain_str(qs["q_mad_robust"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_batched_ann_is_one_scan_one_exchange(spark, qs):
    """q_ann_ivf_batch's scale contract: Q queries share ONE scan of the
    pruned assignment (a single ArrowEvalPython/mapInPandas kernel —
    never one scan per query) and the only exchange in the plan is the
    per-query top-k window's hash partition on query_id over the
    k-bounded partial results."""
    # simple mode: each node appears exactly once (formatted mode lists
    # every node twice — tree + detail section)
    plan = explain_str(qs["q_ann_ivf_batch"](spark, SF), "simple")
    # one scoring kernel, not Q of them
    assert plan.count("MapInPandas") == 1, plan
    # exactly one exchange: the bounded window shuffle (the probe filter
    # and partial top-k add none)
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}:\n{plan}"
    # Spark's rank-limit pushdown keeps a WindowGroupLimit on BOTH
    # sides of that exchange — the plan-level partial top-k
    assert plan.count("WindowGroupLimit") == 2, plan
    # one scan of one relation: Q queries never multiply the scan
    assert plan.count("Scan parquet") == 1, plan


def test_sssp_iteration_is_two_joins_no_cartesian(spark, qs):
    """q_sssp's per-hop contract: frontier expansion joins (an equi-join
    on src plus a left-anti join on node), never a cartesian product or
    a broadcast of the full edge relation; the settled relation stays
    cached between hops."""
    df = qs["q_sssp"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    # the final relation is served from the eager materialization
    assert "InMemoryTableScan" in plan or "Scan ExistingRDD" in plan, plan


def test_ivfpq_batch_is_one_codes_kernel_one_exchange(spark, qs):
    """q_ann_ivfpq_topk's scale contract (round 10): Q queries share ONE
    masked ADC kernel over the pruned CODES relation (never one pass
    per query, never the float vectors), the only exchange is the
    per-query top-k window over k-bounded partials, and the rank-limit
    pushdown keeps WindowGroupLimit on both sides of it."""
    plan = explain_str(qs["q_ann_ivfpq_topk"](spark, SF), "simple")
    assert plan.count("MapInPandas") == 1, plan
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}:\n{plan}"
    assert plan.count("WindowGroupLimit") == 2, plan


def test_ivf_append_probe_prunes_partitions(spark, qs):
    """q_ann_ivf_append's scale contract (round 10): the search runs
    against the WRITTEN list_id-partitioned layout, so the probe filter
    must land as a partition filter on the scan — the append path never
    rescans the corpus."""
    df = qs["q_ann_ivf_append"](spark, SF)
    plan = explain_str(df, "formatted")
    assert "PartitionFilters: [list_id" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_cc_starcontract_materializes_fixed_point(spark, qs):
    """q_cc_starcontract returns the eagerly materialized label fixed
    point (its per-round star operators ran at build time with
    checkpoint-truncated lineage); the serving plan must be a cache
    read, with no cartesian product anywhere in the lineage."""
    df = qs["q_cc_starcontract"](spark, SF)
    plan = explain_str(df)
    assert "InMemoryTableScan" in plan or "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan


def test_shard_shuffle_window_is_shard_partitioned(spark, qs):
    """q_shard_shuffle's scale contract: the rank window is PARTITIONED
    BY shard — N parallel scans, never a single global sort of the
    corpus (the naive shuffle implementation)."""
    plan = explain_str(qs["q_shard_shuffle"](spark, SF), "simple")
    # one exchange: hashpartitioning on the shard key for the window
    assert "hashpartitioning" in plan, plan
    # no global (SinglePartition-ordered) window anywhere
    assert "SinglePartition" not in plan, plan


def test_dedup_ingest_shuffles_ids_not_payloads(spark, qs):
    """q_dedup_ingest's scale contract: candidate generation equi-joins
    slim (bucket, id) relations — document TEXT must never reach a
    shuffle (shingle sets join back only against survivors), and the
    corpus side arrives via the written index's parquet scans."""
    df = qs["q_dedup_ingest"](spark, SF)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    # the index relations are read from parquet (sigs + buckets)
    assert plan.count("Scan parquet") >= 2, plan[:1500]
    # no exchange moves the raw text column: 'text' appears only in
    # scan projections feeding the Arrow shingling kernel
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_range_search_batch_has_no_shuffle(spark, qs):
    """Brute batch range search is scan → Arrow kernel → done:
    qualifying rows are final where they are scored, so the plan must
    contain NO exchange and no window — output cost is pure
    selectivity. (The registered query's plan; the kernel itself is
    shared with the IVF range path.)"""
    from os_ex_3_map_reduce_spark.operators import range_search_batch
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    qvs = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id") < 3).collect()
    ]
    plan = explain_str(range_search_batch(emb, qvs, threshold=0.25))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan


def test_gram_matrix_single_exchange(spark):
    """The Gram aggregation must shuffle ONLY the d(d+1)/2 + d partial
    rows per batch (one hash exchange for the tiny groupBy) — never
    the corpus, and no window/sort anywhere."""
    import re

    from os_ex_3_map_reduce_spark.operators import gram_matrix_int
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    plan = explain_str(gram_matrix_int(load_table(spark, SF, "embeddings")))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Window" not in plan


def test_sq_search_bounded_shuffle(spark):
    """SQ batch search mirrors the IVF/PQ batch contract: the only
    exchange carries the k-rows-per-(query,batch) partials into the
    final per-query window — one exchange, one window."""
    import re

    from os_ex_3_map_reduce_spark.operators import (
        sq_encode,
        sq_search_batch,
        sq_train,
    )
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    params = sq_train(emb)
    qvs = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id") < 3).collect()
    ]
    plan = explain_str(sq_search_batch(sq_encode(emb, params), params, qvs, k=5))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Window" in plan


def test_linkpred_broadcasts_middles_and_takeordered(spark):
    """Link prediction's hub-capped degree relation must BROADCAST
    into the wedge join (shuffling the arc list against a tiny capped
    dimension would be a plan bug), and the top-k must plan as
    TakeOrdered, not a global sort."""
    from os_ex_3_map_reduce_spark.operators.graph import link_prediction_ra
    from os_ex_3_map_reduce_spark.plans.graph_queries import _bipartite_edges

    out = link_prediction_ra(_bipartite_edges(spark, SF), max_middle_degree=32)
    plan = explain_str(out)
    for held in out._osx3_persists:
        held.unpersist()
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_scd2_history_single_exchange_reused_partitioning(spark, qs):
    """SCD2 gaps-and-islands: both row_number windows, the run groupBy
    (keys are a SUPERSET of the window partitioning) and the version
    window must all reuse ONE hash exchange on o_custkey — a second
    exchange means the run aggregation stopped riding the window's
    partitioning. No global sort, no join."""
    import re

    plan = explain_str(qs["q_scd2_history"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_lm_perplexity_broadcasts_model(spark, qs):
    """The vocab-bounded bigram model must BROADCAST into the
    per-occurrence scoring join — shuffling the exploded bigram
    relation against a model thousands of times smaller would be the
    classic unbroadcast-dimension bug."""
    plan = explain_str(qs["q_lm_perplexity"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_dsir_broadcasts_model_and_takeordered(spark, qs):
    """q_dsir_select's 64-bucket model must BROADCAST into the
    per-occurrence scoring join (shuffling billions of exploded
    feature occurrences against a 64-row model would be the classic
    unbroadcast-dimension bug), and the top-50 must be TakeOrdered
    (distributed partial top-k), not a global Sort+window."""
    plan = explain_str(qs["q_dsir_select"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_rerank_broadcasts_candidates(spark, qs):
    """q_ann_rerank's refine stage must broadcast the Q x C candidate
    relation into the hash join against the vector table — the float
    vectors must never shuffle for a re-rank."""
    plan = explain_str(qs["q_ann_rerank"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_secondary_sort_rides_shuffle_sort(spark, qs):
    """q_mapreduce_secondary_sort: exactly ONE exchange (the key
    repartition) with the group ordering done by Sort WITHIN
    partitions — a global Sort or a second exchange means the
    composite-key pattern degraded to sort-everything."""
    import re

    plan = explain_str(qs["q_mapreduce_secondary_sort"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    sorts = re.findall(r"\(\d+\) Sort(?!MergeJoin)", plan)
    assert sorts, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_hits_halfstep_is_join_plus_partial_agg(spark, qs):
    """q_hits: every half-step is one arc-join + one map-side-combined
    groupBy; no cartesian products, and the per-kind top-10 window
    runs over the two-partition kind split, not a global sort."""
    plan = explain_str(qs["q_hits"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "partial" in plan.lower(), plan


def test_mor_read_broadcasts_delete_relation(spark):
    """Merge-on-read snapshot scan: the position-delete relation joins
    as a BROADCAST left-anti (the deletion-vector assumption — deletes
    are small between compactions); the data side must NOT shuffle to
    apply its own deletes."""
    import tempfile

    from os_ex_3_map_reduce_spark.sources.versioned import (
        vt_delete_mor,
        vt_read,
        vt_write,
    )

    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("grp")
    )
    path = tempfile.mkdtemp(prefix="osx3_planmor_") + "/t"
    vt_write(df, path, "k", nbuckets=4)
    vt_delete_mor(spark, path, "grp = 3")
    plan = explain_str(vt_read(spark, path))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_kmv_sketch_state_is_bounded_two_level(spark, qs):
    """q_sketch_theta_union: the distinct() must partial-aggregate
    before its exchange (map-side combine on (group, hash)), and the
    bottom-k must run as windows over partition-id prefilters — no
    global Sort of the data and no cartesian products."""
    plan = explain_str(qs["q_sketch_theta_union"](spark, SF))
    assert "partial" in plan.lower(), plan
    assert "CartesianProduct" not in plan
    # stage 1 of bottom-k is the shuffle-free Arrow fold
    assert "MapInPandas" in plan, plan


def test_quantile_merge_samples_before_sorting(spark, qs):
    """q_sketch_quantile_merge: the only single-partition work is over
    the <= k-row samples; lineitem itself must reach the plan through
    the two-level bottom-k (partition-id windows), not a global
    sort."""
    plan = explain_str(qs["q_sketch_quantile_merge"](spark, SF))
    assert "MapInPandas" in plan, plan
    assert "CartesianProduct" not in plan


def test_interval_join_is_equi_on_grid_cell(spark, qs):
    """q_join_interval: the overlap theta-join must reduce to an
    EQUI-join on the grid cell (hash/sort-merge exchange on `cell`) —
    a BroadcastNestedLoopJoin or CartesianProduct means the reduction
    regressed to quadratic."""
    plan = explain_str(qs["q_join_interval"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan and "cell" in plan, plan


def test_nsw_build_is_one_link_kernel_one_scan(spark):
    """nsw_build's scale contract: the per-list linking kernel runs
    ONCE over ONE corpus scan (the symmetrize step explodes both edge
    directions in a single pass — a self-union there would duplicate
    the whole upstream subtree and run the linking twice), the global
    per-src top-k rides the rank-limit pushdown (WindowGroupLimit on
    both sides of its exchange), and nothing is cartesian."""
    from os_ex_3_map_reduce_spark.operators.nsw import nsw_build
    from os_ex_3_map_reduce_spark.operators.similarity import (
        train_centroids_sample,
    )
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    cents = train_centroids_sample(emb, 16)
    plan = explain_str(nsw_build(emb, cents, k_graph=8), "simple")
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert plan.count("Scan parquet") == 1, plan
    # list-group, pair-dedup, per-src window, symmetrized final dedup
    n = plan.count("Exchange")
    assert n == 4, f"expected 4 exchanges, saw {n}:\n{plan}"
    assert plan.count("WindowGroupLimit") == 2, plan
    assert "CartesianProduct" not in plan


def test_nsw_search_hop_is_joins_never_cartesian(spark):
    """nsw_search_batch's per-hop contract: frontier expansion is an
    equi-join on the edge src plus anti-joins against the beam — the
    only cross join is the broadcast 1-row entry seed; the returned
    relation is the hop-capped beam served off checkpoint-truncated
    lineage (no plan growth with hops)."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.nsw import (
        nsw_build,
        nsw_search_batch,
    )
    from os_ex_3_map_reduce_spark.operators.similarity import (
        train_centroids_sample,
    )
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = train_centroids_sample(emb, 16)
    edges = nsw_build(emb, cents, k_graph=8).persist()
    qvs = [
        [float(x) for x in r.embedding]
        for r in sorted(
            emb.where(F.col("vec_id") < 2).collect(), key=lambda r: r.vec_id
        )
    ]
    res = nsw_search_batch(emb, edges, qvs, k=5, beam=8, max_hops=3)
    plan = explain_str(res)
    assert "CartesianProduct" not in plan, plan
    # lineage truncation: the beam state is served from a checkpoint,
    # not a 3-hop join tree
    assert "Scan ExistingRDD" in plan, plan
    edges.unpersist()


def test_bm25_is_takeordered_with_broadcast_stats(spark, qs):
    """q_bm25_topk's scale contract: top-k is TakeOrdered (never a
    global sort of the scored docs), the corpus-stats relation enters
    as a broadcast 1-row nested-loop, and nothing is cartesian."""
    plan = explain_str(qs["q_bm25_topk"](spark, SF), "simple")
    assert "TakeOrdered" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_matryoshka_both_stages_takeordered(spark, qs):
    """q_ann_matryoshka's scale contract: coarse prefix stage and
    full-dim rerank are both TakeOrdered (never a global sort), and
    nothing is cartesian — the 50-candidate rerank join stays tiny."""
    plan = explain_str(qs["q_ann_matryoshka"](spark, SF), "simple")
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_regional_volume_broadcasts_all_dims(spark, qs):
    """q_regional_volume (TPC-H Q5 shape): every dimension side
    broadcasts (5 BroadcastHashJoins at fixture scale — at warehouse
    scale orders/lineitem meet in a sort-merge, but the fact table
    must never cartesian or double-shuffle), and the plan has no
    cartesian product."""
    plan = explain_str(qs["q_regional_volume"](spark, SF), "simple")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan


# --- correlated-subquery / decorrelation family (plans/subqueries.py) ----


def test_small_qty_subquery_is_decorrelated(spark, qs):
    """q_small_qty_revenue (TPC-H Q17 shape): the correlated scalar
    subqueries must NOT survive to the physical plan — Catalyst
    rewrites them into a per-partkey aggregate joined back, so the
    plan shows partial aggregation and l_partkey joins but no
    ScalarSubquery node (which would mean per-row re-execution)."""
    plan = explain_str(qs["q_small_qty_revenue"](spark, SF), "simple")
    assert "ScalarSubquery" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_large_orders_in_plans_as_semi_join(spark, qs):
    """q_large_orders (Q18): the IN + grouped-HAVING subquery must
    plan as a LeftSemi join against the post-HAVING aggregate, not a
    nested-loop membership probe."""
    plan = explain_str(qs["q_large_orders"](spark, SF), "simple")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_waiting_suppliers_exists_pair_is_semi_plus_anti(spark, qs):
    """q_waiting_suppliers (Q21): EXISTS → LeftSemi, NOT EXISTS →
    LeftAnti, both shuffling on the same l_orderkey key — never a
    per-row subquery loop."""
    plan = explain_str(qs["q_waiting_suppliers"](spark, SF), "simple")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dormant_balance_gate_and_anti_join(spark, qs):
    """q_dormant_balance (Q22): the uncorrelated scalar average stays
    a one-row Subquery gate (computed once, broadcast into the
    filter), the NOT EXISTS becomes a LeftAnti join, and the date
    filter is pushed into the orders scan feeding it."""
    df = qs["q_dormant_balance"](spark, SF)
    plan = explain_str(df, "simple")
    assert "Subquery" in plan, plan
    assert "LeftAnti" in plan, plan
    pf = pushed_filters(df)
    assert "o_orderdate" in pf, pf


def test_modularity_broadcasts_labels_no_cartesian(spark, qs):
    """q_modularity: the part label dimension broadcasts onto the edge
    list (never shuffles the edges on a label key), the only
    nested-loop is the 1-row m broadcast, and both community roll-ups
    are partial-aggregated before their 25-key shuffle."""
    plan = explain_str(qs["q_modularity"](spark, SF), "simple")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan


# --- fifth-continuation analytics (evaluation + mining stack) -------------


def test_auc_and_lift_avoid_global_single_task_windows(spark, qs):
    """q_auc_ranks / q_lift_deciles rank through the distributed
    two-level prefix sum: any ordered window in the plan must be
    bucket-partitioned (or bounded), never `Window [ORDER BY v]` over
    the full value relation without a partition key. The bounded
    report windows (10-row deciles) are exempt by size."""
    for name in ("q_auc_ranks",):
        plan = explain_str(qs[name](spark, SF), "simple")
        # the two-level prefix sum partitions tier-1 by __bkt
        assert "__bkt" in plan, plan


def test_theil_sen_median_selection_is_bucket_partitioned(spark, qs):
    """VERDICT r10 #4: the old q_theil_sen ranked ALL O(days^2) slope
    pairs through one `row_number() OVER (ORDER BY m, ...)` global
    window — a single-task shuffle of ~2.9M rows. The rewrite selects
    the median by count-below-boundary: the only row_number window
    must partition by the slope bucket (__bkt), and the data-bearing
    relation must never sort under an unpartitioned window. The tiny
    per-bucket-totals tier (one row per bucket) keeps the same
    allowance as q_sample_weighted's two-level scan."""
    plan = explain_str(qs["q_theil_sen"](spark, SF), "simple")
    assert "__bkt" in plan, plan
    for line in plan.splitlines():
        if "row_number()" in line:
            # the rank window's spec must lead with the bucket key,
            # not an ORDER BY over the whole relation
            assert "windowspecdefinition(__bkt" in line, line


def test_apriori_broadcasts_candidates_into_counting_join(spark, qs):
    """q_apriori_itemsets: the level-3 counting join must broadcast
    the (tiny, closure-pruned) candidate relation against the fact
    relation — candidates never shuffle the baskets."""
    plan = explain_str(qs["q_apriori_itemsets"](spark, SF), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivm_join_agg_partial_aggregates(spark, qs):
    """q_ivm_join_agg: every view/delta aggregation is map-side
    combined (partial+final HashAggregate pairs), and the dims
    broadcast."""
    plan = explain_str(qs["q_ivm_join_agg"](spark, SF), "simple")
    assert plan.count("HashAggregate") >= 6, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_pattern_match_single_user_partitioning(spark, qs):
    """q_pattern_match: both windows and the session aggregate ride
    ONE hashpartitioning(user_id) exchange — the regex stage adds no
    shuffle."""
    plan = explain_str(qs["q_pattern_match"](spark, SF), "formatted")
    assert plan.count("hashpartitioning(user_id") <= 2, plan


def test_kaplan_meier_windows_after_bounded_aggregate(spark, qs):
    """q_kaplan_meier: the ordered KM windows run on the per-day
    aggregate (<=366 rows, a design constant) — the window input must
    be the aggregated relation, with the raw fact aggregation
    map-side combined before it."""
    plan = explain_str(qs["q_kaplan_meier"](spark, SF), "simple")
    assert plan.count("HashAggregate") >= 2, plan
    assert "Window" in plan, plan


def test_case_edit_audit_single_scan_partial_agg(spark, qs):
    """The tripwire must stay one column-pruned scan + map-side-combined
    aggregate: partial+final HashAggregate (or sort-based fallback for
    the decoded-string columns), exactly one parquet scan of documents,
    only the text column read, zero joins."""
    df = qs["q_case_edit_audit"](spark, SF)
    plan = explain_str(df)
    # formatted explain prints each node twice (tree + detail): one
    # scan node therefore appears at most twice in the string
    assert plan.count("Scan parquet") <= 2
    rs = read_schema(df)
    assert rs and "doc_id" not in rs and "lang" not in rs
    assert "Join" not in plan
    assert (
        plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2
    )


def test_betweenness_tree_broadcasts_totals_no_pair_blowup(spark, qs):
    """The decomposition never touches pairs: the totals relation joins
    by broadcast (BroadcastNestedLoopJoin over 1-row sides), no
    SortMergeJoin and no CartesianProduct over row-scaled relations."""
    plan = explain_str(qs["q_betweenness_tree"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan


def test_l_diversity_one_pass_ladder(spark, qs):
    """The 3-level ladder unions BEFORE the shuffle and aggregates with
    map-side combine; customer is scanned (once per union leg at most —
    Spark does not yet share the scan) with only the 3 needed columns."""
    df = qs["q_l_diversity"](spark, SF)
    plan = explain_str(df)
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
    rs = read_schema(df)
    assert rs and "c_name" not in rs and "c_comment" not in rs


def test_t_closeness_broadcasts_distribution(spark, qs):
    """The global sensitive distribution (5 rows) and corpus total
    (1 row) must broadcast; the only shuffles are the grouped
    aggregations and the group-size window — never a group x segment
    cross join over row-scaled relations."""
    plan = explain_str(qs["q_t_closeness"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan
    assert plan.count("HashAggregate") >= 2


def test_closeness_tree_weighted_broadcasts_totals_no_pair_blowup(spark, qs):
    """Weighted twin keeps the unweighted contract: never touches
    pairs — totals join by broadcast, no SortMergeJoin, no
    CartesianProduct over row-scaled relations, and the customer scan
    reads only the two needed columns."""
    df = qs["q_closeness_tree_weighted"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan
    rs = read_schema(df)
    assert rs and "c_name" not in rs and "c_acctbal" not in rs


def test_tree_diameter_weighted_bounded_domain_agg(spark, qs):
    """The only large-data step must be the map-side-combined
    groupBy(nation, weight) count (partial+final HashAggregate); the
    per-customer relation never feeds a Window directly — windows run
    on the bounded expanded relation — and nothing plans a
    SortMergeJoin or CartesianProduct."""
    df = qs["q_tree_diameter_weighted"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "Window" in plan
    rs = read_schema(df)
    assert rs and "c_name" not in rs and "c_mktsegment" not in rs

"""Generic map_reduce operator + job control parity tests.

Mirrors the reference's test practice (SURVEY.md §5.1): golden output
via the sample client, determinism across the multiThreadLevel analog,
and progress monotonicity from a polling loop.
"""

from __future__ import annotations

import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from os_ex_3_map_reduce_spark.operators.job import (
    JobState,
    Stage,
    start_map_reduce_job,
)
from os_ex_3_map_reduce_spark.operators.map_reduce import (
    MapReduceClient,
    run_map_reduce,
)
from os_ex_3_map_reduce_spark.plans.mapreduce_queries import WordCountClient
from os_ex_3_map_reduce_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _wordcount_via_dataframe(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def test_wordcount_client_matches_dataframe_plan(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("text")
    got = sorted(
        (r.w, r.cnt) for r in run_map_reduce(docs, WordCountClient()).collect()
    )
    want = sorted((r.w, r.cnt) for r in _wordcount_via_dataframe(spark).collect())
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("parallelism", [1, 2, 8])
def test_determinism_across_parallelism(spark, parallelism):
    """multiThreadLevel sweep analog (SURVEY.md §5.1): identical sorted
    output at every reduce-side parallelism."""
    docs = load_table(spark, SF_SMOKE, "documents").select("text")
    got = sorted(
        tuple(r)
        for r in run_map_reduce(
            docs, WordCountClient(), num_shuffle_partitions=parallelism
        ).collect()
    )
    want = sorted((r.w, r.cnt) for r in _wordcount_via_dataframe(spark).collect())
    assert got == want


class ExplodingClient(MapReduceClient):
    """map emits 0..N (only tokens len>3, twice); reduce emits 0..N
    (nothing for odd counts, two rows for even) — exercises the full
    flatMap/UDTF freedom of emit2/emit3."""

    intermediate_schema = "w string, one long"
    output_schema = "w string, kind string, cnt long"

    def map(self, row):
        out = []
        for w in row.text.split(" "):
            if len(w) > 3:
                out.append((w, 1))
                out.append((w, 1))
        return out

    def reduce(self, key, group: pd.DataFrame):
        n = int(group["one"].sum())
        if n % 2 == 1:
            return []
        return [(key[0], "total", n), (key[0], "half", n // 2)]


def test_zero_to_n_emission(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("text")
    rows = run_map_reduce(docs, ExplodingClient()).collect()
    assert rows, "expected some even-count tokens"
    by_word: dict[str, dict[str, int]] = {}
    for r in rows:
        by_word.setdefault(r.w, {})[r.kind] = r.cnt
    for w, kinds in by_word.items():
        assert set(kinds) == {"total", "half"}
        assert kinds["total"] == 2 * kinds["half"]
        assert kinds["total"] % 2 == 0
        assert len(w) > 3


def test_job_control_lifecycle(spark):
    """R9–R12: async start, state polling, idempotent wait, close."""
    docs = load_table(spark, SF_SMOKE, "documents").select("text")
    handle = start_map_reduce_job(spark, WordCountClient(), docs)

    states: list[JobState] = []
    deadline = time.time() + 120
    while handle._thread.is_alive() and time.time() < deadline:
        states.append(handle.state())
        time.sleep(0.05)
    handle.wait()
    handle.wait()  # idempotent (reference guards double-join)

    rows = handle.result()
    want = sorted((r.w, r.cnt) for r in _wordcount_via_dataframe(spark).collect())
    assert sorted(tuple(r) for r in rows) == want

    final = handle.state()
    assert final.stage is Stage.REDUCE and final.percentage == 100.0
    # (stage, percentage) advances monotonically: stage only ever moves
    # UNDEFINED → MAP → SHUFFLE → REDUCE, and within a stage the
    # percentage never decreases (the canonical course test's contract).
    order = [Stage.UNDEFINED, Stage.MAP, Stage.SHUFFLE, Stage.REDUCE]
    seen = [(order.index(s.stage), s.percentage) for s in states]
    assert seen == sorted(seen), f"progress regressed: {seen}"
    assert all(0.0 <= p <= 100.0 for _, p in seen)

    handle.close()
    assert handle.state().stage is Stage.UNDEFINED


def test_progress_degrades_without_status_store(spark):
    """statusStore() is a private JVM API (pinned to Spark 4.1.2 in the
    source): if it drifts, SHUFFLE%% must degrade to the quantized 0
    report and skipped-detection to 'not skipped' — never an error
    (round-2 verdict #8)."""
    from os_ex_3_map_reduce_spark.operators.job import start_job

    df = (
        spark.range(0, 10_000, 1, 4)
        .selectExpr("id % 13 as k")
        .groupBy("k")
        .count()
    )
    handle = start_job(spark, df, description="status-store drift probe")
    handle.wait()

    def broken_store():
        raise AttributeError("'JavaSparkContext' object has no attribute 'sc'")

    handle._stage_store = broken_store
    assert handle._shuffle_percentage(0, 1) == 0.0
    assert handle._is_skipped(0) is False
    final = handle.state()  # finished job: served from the result path
    assert final.percentage == 100.0
    handle.close()


def test_shuffle_percentage_is_pairs_moved(spark):
    """SHUFFLE progress = reduce-side records fetched / map-side records
    written (the reference's shuffled-pairs accounting), not a 0/100
    quantization: on a finished shuffle both counters are equal, so the
    helper must report exactly 100 from the real metrics."""
    from os_ex_3_map_reduce_spark.operators.job import start_job

    df = (
        spark.range(0, 200_000, 1, 8)
        .selectExpr("id % 97 as k", "id as v")
        .groupBy("k")
        .count()
    )
    handle = start_job(spark, df, description="shuffle accounting probe")
    handle.wait()
    tracker = spark.sparkContext.statusTracker()
    sids = sorted(
        sid
        for jid in tracker.getJobIdsForGroup(handle._group)
        for sid in tracker.getJobInfo(jid).stageIds
        if not handle._is_skipped(sid)
        and tracker.getStageInfo(sid) is not None
        and tracker.getStageInfo(sid).numTasks > 0
    )
    assert len(sids) >= 2, f"expected a 2-stage shuffle job, got {sids}"
    pct = handle._shuffle_percentage(sids[0], sids[-1])
    assert pct == 100.0, pct
    # and the underlying counters really are record counts, not a flag:
    # map-side partial agg emits one partial per (partition, key), all
    # of which the single reduce stage fetches.
    store = handle._stage_store()
    wrote = store.lastStageAttempt(sids[0]).shuffleWriteRecords()
    read = store.lastStageAttempt(sids[-1]).shuffleReadRecords()
    assert wrote == read >= 97
    handle.close()


def test_key_normalizer_reduce_sees_whole_equivalence_class(spark):
    """SURVEY.md §7.4 contract, asserted directly: with a key_normalizer
    (the K2::operator< partial-comparator analog), reduce must be called
    ONCE per equivalence class, with the NORMALIZED key and a group
    containing every RAW K2 spelling of that class."""
    from os_ex_3_map_reduce_spark.operators.map_reduce import normalized_key

    class ClassAuditClient(MapReduceClient):
        intermediate_schema = "w string, one long"
        output_schema = "k string, n_rows long, raw_keys string"
        key_normalizer = staticmethod(
            lambda c: normalized_key(c, trim=True, fold_case=True, prefix_len=3)
        )

        def map(self, row):
            return [(row.w, 1)]

        def reduce(self, key, group: pd.DataFrame):
            # key must already be normalized; group keeps raw spellings
            # and must NOT contain the internal normalized-key column
            assert list(group.columns) == ["w", "one"]
            raws = sorted(set(group["w"]))
            return [(key[0], int(group["one"].sum()), "|".join(raws))]

    rows = [("Foobar",), ("FOOBAZ ",), (" fooqux",), ("barone",), ("BARTWO",)]
    df = spark.createDataFrame(rows, "w string")
    got = {
        r.k: (r.n_rows, r.raw_keys)
        for r in run_map_reduce(df, ClassAuditClient()).collect()
    }
    assert got == {
        # trim → lower → first 3 chars: one class per prefix
        "foo": (3, "|".join(sorted({"Foobar", "FOOBAZ ", " fooqux"}))),
        "bar": (2, "BARTWO|barone"),
    }


def test_sorted_group_scan_boundary_spanning_groups(spark):
    """Secondary sort's hard case: a group larger than one Arrow batch
    must arrive as SEVERAL step() calls and still fold to the same
    answer. Force 7-row batches (groups of 40 rows span many), run the
    order-gap fold, and compare against the declarative window
    equivalent — also under a different partition count (the fold must
    be partitioning-invariant because each key is wholly in one
    partition)."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.map_reduce import sorted_group_scan
    from os_ex_3_map_reduce_spark.plans.mapreduce_queries import OrderGapFold

    rows = spark.range(0, 200).select(
        (F.col("id") % 5).alias("o_custkey"),
        (F.col("id") * 7 % 365).alias("epoch_day"),
        F.col("id").alias("o_orderkey"),
        F.date_format(
            F.date_add(F.lit("1970-01-01"), (F.col("id") * 7 % 365).cast("int")),
            "yyyy-MM-dd",
        ).alias("date_str"),
    )
    schema = (
        "o_custkey bigint, n_orders bigint, first_date string, "
        "last_date string, max_gap_days bigint"
    )
    want_df = (
        rows.withColumn(
            "gap",
            F.col("epoch_day")
            - F.lag("epoch_day").over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("o_custkey")
                .orderBy("epoch_day", "o_orderkey")
            ),
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("date_str").alias("first_date"),
            F.max("date_str").alias("last_date"),
            F.coalesce(F.max("gap"), F.lit(0)).alias("max_gap_days"),
        )
    )
    want = {tuple(r) for r in want_df.collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        for nparts in (1, 3):
            got = {
                tuple(r)
                for r in sorted_group_scan(
                    rows,
                    ["o_custkey"],
                    ["epoch_day", "o_orderkey"],
                    OrderGapFold(),
                    schema,
                    num_partitions=nparts,
                ).collect()
            }
            assert got == want, f"nparts={nparts}"
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_sorted_group_scan_multi_emit_and_empty_finish(spark):
    """The fold's finish() may emit 0..N rows (the reference's emit3
    contract): a fold that drops single-row groups and splits others
    into per-row echoes exercises both ends."""
    from os_ex_3_map_reduce_spark.operators.map_reduce import (
        SortedGroupFold,
        sorted_group_scan,
    )

    class EchoFold(SortedGroupFold):
        def init(self, key):
            return []

        def step(self, state, chunk):
            return state + [int(v) for v in chunk["v"]]

        def finish(self, key, state):
            if len(state) <= 1:
                return []
            return [(key[0], v) for v in state]

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 9), ("c", 3), ("c", 4), ("c", 5)],
        "k string, v int",
    )
    got = sorted(
        tuple(r)
        for r in sorted_group_scan(
            df, ["k"], ["v"], EchoFold(), "k string, v int", num_partitions=2
        ).collect()
    )
    assert got == [("a", 1), ("a", 2), ("c", 3), ("c", 4), ("c", 5)]

"""Structured Streaming surface over the events table (SURVEY.md E7).

The reference is strictly batch [SURVEY.md §1.1]; this is mandated
extension surface. Events are replayed through the file source (the
production shape: a stream lands as files/partitions; at 100 TB this is
a Kafka/file-stream source with the same downstream plan).

Design choices:

- ``availableNow`` trigger: process the full backlog as a bounded
  stream then stop — gives deterministic, batch-equivalent results the
  DuckDB oracle can check, while exercising the real streaming planner
  (StateStore aggregation, watermarks, session windows).
- ``complete`` output mode for windowed aggregations in catalog
  queries: emits every window, so results equal the batch aggregation.
  Append-mode + watermark behavior (late-data drop, state eviction) is
  exercised in tests via a two-run checkpointed replay, where batch
  boundaries are explicit and deterministic.
- Event time is ``ts_utc`` derived from the raw ``ts`` column by the
  dtype-adaptive ``event_time_expr`` (sources/tables.py) — the fixture
  has served both int64-nanos and timestamp[us] over its lifetime.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_confs

_STAGED_CACHE: dict[tuple[str, int], str] = {}


def _cleanup_at_exit(path: str) -> None:
    """Remove a staged temp dir when the process exits.

    Deletion is deferred (not eager) because returned DataFrames are
    lazy scans over these directories — the caller may materialize them
    any time during the session. Process exit is the earliest safe
    point; repeated runs in one process reuse ``_STAGED_CACHE`` instead
    of re-staging, so the high-water disk usage is one copy per
    (sf_dir, variant) plus one snapshot chain per CDC run.
    """
    atexit.register(shutil.rmtree, path, ignore_errors=True)


def staged_events_dir(sf_dir: str, copies: int = 1) -> str:
    """A temp directory holding ``copies`` copies of the events file.

    The streaming file source requires a *directory* basePath (pointing
    it at the bare ``events.parquet`` file breaks on plans — e.g.
    session windows — that re-resolve the relation). Staging into a dir
    is also the production shape: a stream lands as files/partitions.
    With copies=2 every event arrives twice — a deterministic duplicate
    stream for exercising stateful dedup.
    """
    key = (sf_dir, copies)
    if key not in _STAGED_CACHE:
        d = Path(tempfile.mkdtemp(prefix=f"osx3_events{copies}_"))
        _cleanup_at_exit(str(d))
        for i in range(copies):
            shutil.copy(f"{sf_dir}/events.parquet", d / f"part-{i}.parquet")
        _STAGED_CACHE[key] = str(d)
    return _STAGED_CACHE[key]


def _stage_split_one_pass(
    df, d: Path, split_expr, n_files: int
) -> None:
    """Write ``df`` as ``part-0..n-1.parquet`` under ``d``, one file
    per value of ``split_expr``, in ONE job: tag each row with its
    split id, hash-repartition on it (each id lives in exactly one
    task), and ``partitionBy`` so every id directory receives exactly
    one file — then lift the files out of the ``_split=i`` dirs. The
    previous per-split loop scanned the source ``n_files`` times with
    a coalesce(1) write each (measured 5.5 s cold for the events split
    at sf0.1 vs ~1.5 s one-pass); at any real scale the n-scans shape
    is the bug, not the constant."""
    stage = d / "_stage"
    (
        df.withColumn("_split", split_expr.cast("int"))
        .repartition(n_files, F.col("_split"))
        .write.partitionBy("_split")
        .parquet(str(stage))
    )
    for i in range(n_files):
        part = next((stage / f"_split={i}").glob("part-*.parquet"))
        shutil.move(str(part), d / f"part-{i}.parquet")
    shutil.rmtree(stage)


def staged_events_split_dir(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> str:
    """The events table split into ``n_files`` parquet files by
    ``event_id % n_files`` — a DISJOINT partition of the stream (vs
    :func:`staged_events_dir`'s duplicate copies), one micro-batch per
    file under ``maxFilesPerTrigger=1``. Used by incremental-state
    queries (e.g. the streaming KMV sketch) where each event must
    arrive exactly once but batch membership must be arbitrary."""
    key = (f"{sf_dir}::events_split", n_files)
    if key not in _STAGED_CACHE:
        ensure_session_confs(spark)
        d = Path(tempfile.mkdtemp(prefix="osx3_events_split_"))
        _cleanup_at_exit(str(d))
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        _stage_split_one_pass(
            ev, d, F.col("event_id") % n_files, n_files
        )
        _STAGED_CACHE[key] = str(d)
    return _STAGED_CACHE[key]


def doubled_events_dir(spark: SparkSession, sf_dir: str) -> str:
    return staged_events_dir(sf_dir, copies=2)


def staged_documents_delta_dir(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> str:
    """The odd-doc_id half of the documents table staged as ``n_files``
    parquet files — the delta side of the ingest-dedup stream, one
    micro-batch per file under ``maxFilesPerTrigger=1``. Each doc lands
    in exactly one file (deterministic ``(doc_id // 2) % n_files``
    split), so the streamed lookup emits each (new_doc, corpus_doc)
    match exactly once without needing stream-side dedup state."""
    key = (f"{sf_dir}::docs_delta", n_files)
    if key not in _STAGED_CACHE:
        ensure_session_confs(spark)
        d = Path(tempfile.mkdtemp(prefix="osx3_docs_delta_"))
        _cleanup_at_exit(str(d))
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
            F.col("doc_id") % 2 == 1
        )
        _stage_split_one_pass(
            docs, d, (F.col("doc_id") / 2).cast("long") % n_files, n_files
        )
        _STAGED_CACHE[key] = str(d)
    return _STAGED_CACHE[key]


def staged_embeddings_delta_dir(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> str:
    """The odd-vec_id half of the embeddings table staged as
    ``n_files`` parquet files — the vector-delta side of a streaming
    retrieval pipeline (one micro-batch per file under
    ``maxFilesPerTrigger=1``), mirroring
    :func:`staged_documents_delta_dir`. Deterministic
    ``(vec_id // 2) % n_files`` split: each vector lands in exactly
    one file, so per-vector alert rows are emitted exactly once
    without stream-side dedup state."""
    key = (f"{sf_dir}::emb_delta", n_files)
    if key not in _STAGED_CACHE:
        ensure_session_confs(spark)
        d = Path(tempfile.mkdtemp(prefix="osx3_emb_delta_"))
        _cleanup_at_exit(str(d))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
            F.col("vec_id") % 2 == 1
        )
        _stage_split_one_pass(
            emb, d, (F.col("vec_id") / 2).cast("long") % n_files, n_files
        )
        _STAGED_CACHE[key] = str(d)
    return _STAGED_CACHE[key]


def sentinel_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events staging dir plus one far-future sentinel event in its own,
    later-modified file.

    Replayed with ``max_files_per_trigger=1`` the sentinel lands in a
    second micro-batch, advancing the watermark past every real event —
    which is what lets APPEND-mode outer joins and final windows flush
    their state deterministically under a bounded availableNow replay
    (the final no-data micro-batch evicts-and-emits; without a
    watermark-advancing batch, unmatched outer rows would stay unemitted
    at query stop). The sentinel carries ``user_id = -1`` / ``event_id
    = -1`` so downstream plans can filter it; ts is max(real ts) + 10 h.
    This is the streaming analog of a punctuation/flush marker.
    """
    import os

    key = (sf_dir, -1)
    if key not in _STAGED_CACHE:
        ensure_session_confs(spark)
        d = Path(tempfile.mkdtemp(prefix="osx3_events_sentinel_"))
        _cleanup_at_exit(str(d))
        shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
        ev = spark.read.parquet(str(d / "part-0.parquet"))
        max_ts = ev.agg(F.max("ts")).first()[0]
        # dtype-adaptive sentinel time: raw ts may be int64 nanos or a
        # (NTZ) timestamp depending on fixture generation — add 10 h in
        # the matching unit, then cast back to the file's exact ts type
        # so the sentinel file unions cleanly with the real one.
        if isinstance(max_ts, int):
            sent_ts = max_ts + 10 * 3600 * 10**9
        else:
            import datetime as _dt

            sent_ts = max_ts + _dt.timedelta(hours=10)
        sent = ev.limit(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(sent_ts).cast(ev.schema["ts"].dataType).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        ).select(*ev.columns)
        stage = d / "_sentinel_stage"
        sent.coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), d / "part-1-sentinel.parquet")
        shutil.rmtree(stage)
        # the file source orders batches by modification time: pin the
        # sentinel strictly after the main file
        now = os.stat(d / "part-0.parquet").st_mtime
        os.utime(d / "part-1-sentinel.parquet", (now + 10, now + 10))
        _STAGED_CACHE[key] = str(d)
    return _STAGED_CACHE[key]


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    path: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source replay of the events table with event-time column.

    ``max_files_per_trigger`` splits the bounded replay into one
    micro-batch per file (availableNow honors it) — used with
    :func:`sentinel_events_dir` to stage watermark-advancing batches.
    """
    ensure_session_confs(spark)
    src = path or staged_events_dir(sf_dir)
    schema = spark.read.parquet(src).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(src)
    from ..sources.tables import event_time_expr

    return raw.withColumn("ts_utc", event_time_expr(raw))


def run_stream_to_memory(
    df: DataFrame,
    mode: str = "complete",
    checkpoint: str | None = None,
    shuffle_partitions: int | None = 8,
    progress_out: list | None = None,
) -> str:
    """Run a bounded stream (availableNow) into an in-memory sink and
    return the sink table name (query has terminated on return).

    ``shuffle_partitions`` bounds the STATE partition count for this
    query (streaming can't AQE-coalesce, and every state store pays
    fixed setup/commit cost per partition per batch — measured ~2× on
    windowed aggs and stream-stream joins at test scale). It is set
    for the query's planning only and restored afterwards. On a real
    cluster size it to ~2-3× total cores BEFORE the first checkpoint —
    the count is frozen into checkpoint state forever.
    """
    name = "s" + uuid.uuid4().hex[:10]
    spark = df.sparkSession
    before = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        new = min(int(before), shuffle_partitions)
        spark.conf.set("spark.sql.shuffle.partitions", str(new))
    try:
        writer = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
        )
        if checkpoint is not None:
            writer = writer.option("checkpointLocation", checkpoint)
        q = writer.start()
        q.awaitTermination()
        if progress_out is not None:
            # per-micro-batch progress snapshots (numInputRows, state
            # rows, durations) — the streaming analog of the batch
            # JobHandle.state() introspection (reference R11)
            progress_out.extend(q.recentProgress)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    return name


# --- windowed aggregation builders (shared by catalog + tests) -----------


def tumbling_counts(stream: DataFrame) -> DataFrame:
    from ..plans.relational import dsum

    return stream.groupBy(
        F.window("ts_utc", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"), dsum("value", "sum_value"))


def sliding_counts(stream: DataFrame) -> DataFrame:
    return stream.groupBy(
        F.window("ts_utc", "1 hour", "30 minutes").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))


def session_counts(stream: DataFrame, gap: str = "10 minutes") -> DataFrame:
    return stream.groupBy(
        F.session_window("ts_utc", gap).alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))


def stream_stream_followup_join(
    left: DataFrame,
    right: DataFrame,
    within: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: for each event, the *later* events of
    the same user within ``within`` (follow-up actions).

    Both sides carry watermarks and the join condition bounds event
    time on both sides — the two requirements that let the streaming
    planner size its join state and evict rows; without them state
    grows forever. Under a full bounded replay the emitted matches
    equal the batch self-join, which is what the SQL oracle checks.

    ``how='left_outer'`` additionally emits null-extended rows for
    events with no follow-up — but ONLY as the watermark passes their
    state-eviction bound, so a bounded replay needs a final
    watermark-advancing batch (see :func:`sentinel_events_dir`) for the
    output to be complete and deterministic.
    """
    a = left.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts_utc").alias("a_ts"),
    ).withWatermark("a_ts", "1 hour")
    b = right.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("event_type").alias("b_type"),
        F.col("ts_utc").alias("b_ts"),
    ).withWatermark("b_ts", "1 hour")
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {within}")),
        how,
    )


def run_stream_foreach_batch_parquet(
    df: DataFrame,
    out_dir: str,
    checkpoint: str,
    shuffle_partitions: int | None = 8,
    fail_after_write_batch_id: int | None = None,
) -> None:
    """Bounded availableNow run into an idempotent parquet foreachBatch
    sink — the exactly-once file-sink pattern for sinks without their
    own transactional commit.

    Exactly-once by IDEMPOTENCE, the standard foreachBatch contract:
    each micro-batch overwrites its own ``batch_id=N`` directory, and
    the checkpoint records batch completion AFTER the write — so a
    batch replayed on failure/restart rewrites the same directory with
    the same deterministic content instead of appending duplicates, and
    a completed batch is never re-run. Readers see the union of
    batch_id partitions. (With a transactional table format the
    batch_id would instead be committed into the table's log — same
    idempotence argument, atomic visibility too.)

    ``fail_after_write_batch_id`` is a fault-injection point for
    recovery testing: the writer raises AFTER the named batch's parquet
    write succeeds but BEFORE the checkpoint commits it — the exact
    window a real driver crash exposes. A restarted query (any new
    SparkSession/driver over the same checkpoint) must replay that
    batch idempotently; tests/test_streaming.py drives this across a
    genuine JVM boundary.
    """
    spark = df.sparkSession
    before = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        new = min(int(before), shuffle_partitions)
        spark.conf.set("spark.sql.shuffle.partitions", str(new))
    try:

        def write_batch(bdf: DataFrame, batch_id: int) -> None:
            bdf.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
            if fail_after_write_batch_id is not None and batch_id == int(
                fail_after_write_batch_id
            ):
                raise RuntimeError(
                    f"injected crash after write of batch {batch_id}"
                )

        q = (
            df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


#: Parquet schema of the staged CDC change files (base snapshot columns
#: plus the CDC envelope: op + monotone version).
CDC_CHANGES_SCHEMA = (
    "o_orderkey long, op string, version long, "
    "o_orderpriority string, o_totalprice double"
)


def cdc_changes_dir(spark: SparkSession, sf_dir: str) -> str:
    """Three CDC change files against the orders snapshot, mtimes pinned
    so ``maxFilesPerTrigger=1`` replays them as three sequenced
    micro-batches (the file source orders batches by modification time,
    same mechanism as :func:`sentinel_events_dir`):

    - batch 0: keys ``%10==0`` updated TWICE at versions 0 and 1
      (same batch — exercises ``latest_wins`` in-batch arbitration);
    - batch 1: keys ``%10==1`` deleted (v2); keys ``%10==2`` inserted
      as ``key+10M`` (v2);
    - batch 2: keys ``%10==0`` re-updated (v3 — a later batch
      overriding batch 0's update proves cross-batch sequencing), and
      the even half of the inserts (orig key ``%20==2``) deleted (v3 —
      delete-after-insert across batches).

    Versions are totally ordered per key, so the final snapshot is also
    invariant to how the files get grouped into micro-batches — the
    mtime pinning makes the replay deterministic, the version design
    makes the answer robust even if it weren't.
    """
    import os

    key = (sf_dir, -2)
    if key not in _STAGED_CACHE:
        ensure_session_confs(spark)
        d = Path(tempfile.mkdtemp(prefix="osx3_cdc_changes_"))
        _cleanup_at_exit(str(d))
        base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        k = F.col("o_orderkey")
        # insert-key offset derived from the snapshot's max key, so
        # synthetic inserts can never collide with real keys at any
        # scale factor (a fixed 10M constant would collide once the
        # fixture outgrows it); oracle SQL derives the same offset via
        # (SELECT MAX(o_orderkey) + 1 FROM orders).
        insert_off = base.agg(F.max("o_orderkey")).first()[0] + 1

        def emit(df: DataFrame, fname: str, mtime_off: int) -> None:
            stage = d / "_stage"
            df.coalesce(1).write.parquet(str(stage))
            part = next(stage.glob("part-*.parquet"))
            shutil.move(str(part), d / fname)
            shutil.rmtree(stage)
            now = os.stat(d / fname).st_mtime
            os.utime(d / fname, (now + mtime_off, now + mtime_off))

        def upd(version: int, pri: str, price_add: float) -> DataFrame:
            return base.where(k % 10 == 0).select(
                "o_orderkey",
                F.lit("U").alias("op"),
                F.lit(version).cast("long").alias("version"),
                F.lit(pri).alias("o_orderpriority"),
                (F.col("o_totalprice") + price_add).alias("o_totalprice"),
            )

        c0 = upd(0, "STALE", 99.0).unionByName(upd(1, "REPRICED-1", 1.0))
        dels = base.where(k % 10 == 1).select(
            "o_orderkey",
            F.lit("D").alias("op"),
            F.lit(2).cast("long").alias("version"),
            "o_orderpriority",
            "o_totalprice",
        )
        ins = base.where(k % 10 == 2).select(
            (k + insert_off).alias("o_orderkey"),
            F.lit("U").alias("op"),
            F.lit(2).cast("long").alias("version"),
            F.lit("INSERTED").alias("o_orderpriority"),
            F.lit(50.0).alias("o_totalprice"),
        )
        c1 = dels.unionByName(ins)
        undel = base.where((k % 10 == 2) & (k % 20 == 2)).select(
            (k + insert_off).alias("o_orderkey"),
            F.lit("D").alias("op"),
            F.lit(3).cast("long").alias("version"),
            F.lit("INSERTED").alias("o_orderpriority"),
            F.lit(50.0).alias("o_totalprice"),
        )
        c2 = upd(3, "REPRICED-2", 2.0).unionByName(undel)
        emit(c0, "changes-0.parquet", 0)
        emit(c1, "changes-1.parquet", 10)
        emit(c2, "changes-2.parquet", 20)
        _STAGED_CACHE[key] = str(d)
    return _STAGED_CACHE[key]


def staged_base_snapshot_dir(
    spark: SparkSession, sf_dir: str, table: str, columns: tuple[str, ...]
) -> str:
    """One-time-per-process parquet staging of a table projection — the
    immutable ``v0`` a CDC pipeline starts from. Staging it once per
    (sf_dir, table, columns) mirrors production, where the base
    snapshot already exists on storage before the stream starts; it
    also keeps repeat runs (the bench's timed reps) from re-paying a
    full base rewrite that is fixture setup, not pipeline cost."""
    key = (f"{sf_dir}:{table}:{','.join(columns)}", -3)
    if key not in _STAGED_CACHE:
        ensure_session_confs(spark)
        d = tempfile.mkdtemp(prefix="osx3_base_snap_")
        _cleanup_at_exit(d)
        spark.read.parquet(f"{sf_dir}/{table}.parquet").select(
            *columns
        ).write.mode("overwrite").parquet(f"{d}/v0")
        _STAGED_CACHE[key] = f"{d}/v0"
    return _STAGED_CACHE[key]


def run_stream_cdc_apply(
    changes: DataFrame,
    base: DataFrame,
    key: str,
    version_col: str,
    op_col: str = "op",
    shuffle_partitions: int | None = 8,
    base_v0_dir: str | None = None,
) -> DataFrame:
    """Apply a bounded CDC change stream to a snapshot and return the
    final snapshot — the standard change-capture-to-table pipeline,
    composed from two already-proven pieces: ``merge_upsert`` (one
    full-outer-join shuffle per batch) inside a ``foreachBatch`` sink.

    Snapshot versions are immutable directories ``v0..vN``: batch *b*
    reads ``v{b}``, collapses its rows per key with :func:`latest_wins`
    (highest ``version_col`` wins — late-arriving lower versions inside
    one batch lose), merges, and writes ``v{b+1}``. Exactly-once by
    idempotence, same argument as the parquet foreachBatch sink: a
    failure-replayed batch re-reads the SAME input version and
    overwrites the SAME output version with deterministic content, and
    the checkpoint marks completion only after the write. Micro-batches
    are sequenced by the engine, so the version chain never forks.

    At 100 TB the snapshot is bucketed by the key and each merge
    rewrites only affected partitions (dynamic partition overwrite);
    a table format (Delta/Iceberg) replaces the version-directory chain
    with a transactional log — the same per-batch join plan either way.

    ``base_v0_dir`` points at an ALREADY-STAGED immutable v0 (see
    :func:`staged_base_snapshot_dir`) — the production shape, where the
    base snapshot pre-exists the stream; when omitted, ``base`` is
    written as this run's v0 first. Either way v0 is immutable, so the
    idempotence argument is unchanged.
    """
    import os
    import re

    from ..operators.merge import latest_wins, merge_upsert

    spark = changes.sparkSession
    root = tempfile.mkdtemp(prefix="osx3_cdc_")
    _cleanup_at_exit(root)
    snap = f"{root}/snap"
    if base_v0_dir is None:
        base_v0_dir = f"{snap}/v0"
        base.write.parquet(base_v0_dir)

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        src = base_v0_dir if batch_id == 0 else f"{snap}/v{batch_id}"
        cur = bdf.sparkSession.read.parquet(src)
        one = latest_wins(bdf, key=key, version_col=version_col, op_col=op_col)
        nxt = merge_upsert(cur, one, key=key, op_col=op_col)
        nxt.write.mode("overwrite").parquet(f"{snap}/v{batch_id + 1}")

    before = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        new = min(int(before), shuffle_partitions)
        spark.conf.set("spark.sql.shuffle.partitions", str(new))
    try:
        q = (
            changes.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    versions = [
        int(m.group(1))
        for p in (os.listdir(snap) if os.path.isdir(snap) else [])
        if (m := re.fullmatch(r"v(\d+)", p))
    ]
    # empty change stream with an external v0: the snapshot IS v0
    latest_dir = f"{snap}/v{max(versions)}" if versions else base_v0_dir
    return spark.read.parquet(latest_dir)


# --- custom stateful operator (applyInPandasWithState) --------------------


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count
    and value sum, carried in a GroupState across micro-batches.

    This is the engine's arbitrary-stateful surface — the streaming
    analog of the reference's reduce-with-context (user code + mutable
    per-key state), for logic windowed aggregation can't express.
    Emission is one row per (user, batch) with the *cumulative* totals,
    so the final state of a bounded replay is ``max(n_events)`` per
    user regardless of how the source files were split into batches —
    which is what makes an exact batch-SQL oracle possible.

    State is per-key and partitioned by the group key: on a 1000-node
    cluster each executor holds only its keys' state (RocksDB-backed
    StateStore in production), so state size scales out with the
    cluster, never with a single node.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def late_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events staging dir that REPLAYS LATE DATA: three files, mtime-
    ordered so ``maxFilesPerTrigger=1`` yields a deterministic batch
    sequence —

    - batch 0: every real event;
    - batch 1: one watermark-advancer row at max(ts) + 10 h (the
      sentinel pattern), pushing the watermark far past every real
      event;
    - batch 2: LATE COPIES — every event of the corpus's earliest
      1-hour bucket, re-sent with ``event_id + 1_000_000_000`` and the
      ORIGINAL ts, which is now far below the watermark.

    A watermarked aggregation must drop all of batch 2
    (``numRowsDroppedByWatermark`` in the progress records equals the
    copy count); a broken watermark would double the earliest hour's
    counts and hash-fail against the batch oracle, which never sees
    the copies.
    """
    import os

    # string key: the integer key space is taken ((sf_dir, copies) for
    # plain staging, -1 sentinel, -2 CDC changes — reusing -2 here once
    # aliased this dir to the CDC staging when both ran in one session)
    key = (sf_dir, "late")
    if key not in _STAGED_CACHE:
        ensure_session_confs(spark)
        d = Path(tempfile.mkdtemp(prefix="osx3_events_late_"))
        _cleanup_at_exit(str(d))
        shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
        ev = spark.read.parquet(str(d / "part-0.parquet"))
        from ..sources.tables import event_time_expr

        ts_utc = event_time_expr(ev)
        max_ts = ev.agg(F.max("ts")).first()[0]
        if isinstance(max_ts, int):
            adv_ts = max_ts + 10 * 3600 * 10**9
        else:
            import datetime as _dt

            adv_ts = max_ts + _dt.timedelta(hours=10)
        adv = ev.limit(1).select(
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(adv_ts).cast(ev.schema["ts"].dataType).alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("advancer").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        ).select(*ev.columns)
        first_bucket = ev.agg(
            F.min(F.date_trunc("hour", ts_utc)).alias("b")
        ).first()[0]
        late = (
            ev.where(F.date_trunc("hour", ts_utc) == F.lit(first_bucket))
            .withColumn(
                "event_id", (F.col("event_id") + F.lit(1_000_000_000)).cast("long")
            )
            .select(*ev.columns)
        )
        for name, df in (("part-1-advancer", adv), ("part-2-late", late)):
            stage = d / f"_{name}_stage"
            df.coalesce(1).write.parquet(str(stage))
            part = next(stage.glob("part-*.parquet"))
            shutil.move(str(part), d / f"{name}.parquet")
            shutil.rmtree(stage)
        now = os.stat(d / "part-0.parquet").st_mtime
        os.utime(d / "part-1-advancer.parquet", (now + 10, now + 10))
        os.utime(d / "part-2-late.parquet", (now + 20, now + 20))
        _STAGED_CACHE[key] = str(d)
    return _STAGED_CACHE[key]

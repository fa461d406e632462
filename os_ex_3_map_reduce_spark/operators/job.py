"""Async job control plane: reference parity for R9–R13.

Maps the reference API [R:MapReduceFramework.h] onto Spark's scheduler:

- ``startMapReduceJob(...)`` (async, returns immediately)
  → :func:`start_job`: triggers the action on an ``InheritableThread``
  tagged with a job group; returns a :class:`JobHandle`.
- ``waitForJob(handle)`` (idempotent join) → :meth:`JobHandle.wait`.
- ``getJobState(handle)`` → :meth:`JobHandle.state`: snapshots
  ``{stage ∈ UNDEFINED|MAP|SHUFFLE|REDUCE, percentage}`` from
  ``SparkContext.statusTracker()``. The reference packs stage+counters
  into one atomic u64 for a consistent lock-free snapshot
  [R:MapReduceFramework.cpp]; here the status tracker is already a
  consistent snapshot source. Stage mapping: for a 2-stage shuffle job,
  the map-side stage (shuffle write, which also sorts — R4) reports
  MAP; the window between map-stage completion and first reduce task
  finishing reports SHUFFLE (Spark's fetch phase) with a pairs-moved
  percentage — reduce-side ``shuffleReadRecords`` over map-side
  ``shuffleWriteRecords``, the same accounting as the reference's
  shuffled-pairs counter; the reduce-side stage reports REDUCE.
  ``(stage, percentage)`` is monotone non-decreasing across polls
  (stage order UNDEFINED < MAP < SHUFFLE < REDUCE; cumulative task and
  record counters within each stage).
- ``closeJobHandle(handle)`` → :meth:`JobHandle.close` (waits first if
  needed, like the canonical implementation, then drops references).

Observability only — never correctness-bearing (SURVEY.md §3.3).
"""

from __future__ import annotations

import enum
import threading
import uuid
from dataclasses import dataclass
from typing import Any, Callable

from pyspark import InheritableThread
from pyspark.sql import DataFrame, SparkSession


class Stage(enum.Enum):
    UNDEFINED = "UNDEFINED"
    MAP = "MAP"
    SHUFFLE = "SHUFFLE"
    REDUCE = "REDUCE"


@dataclass
class JobState:
    stage: Stage
    percentage: float


class JobHandle:
    """Handle for an asynchronously running Spark action."""

    def __init__(self, spark: SparkSession, group: str, thread: threading.Thread):
        self._spark = spark
        self._group = group
        self._thread = thread
        self._result: list[Any] | None = None
        self._error: BaseException | None = None
        self._closed = False

    # -- waitForJob parity: blocking, idempotent ---------------------------
    def wait(self, timeout: float | None = None) -> None:
        if self._thread.is_alive():
            self._thread.join(timeout)
        if self._error is not None:
            raise self._error

    def result(self) -> list[Any]:
        """The OutputVec analog: collected rows (after wait)."""
        self.wait()
        assert self._result is not None
        return self._result

    # -- getJobState parity ------------------------------------------------
    def _stage_store(self):
        # JVM AppStatusStore: the only place per-stage shuffle metrics
        # live (the Python StatusTracker exposes task counts only).
        # PRIVATE API — ``sc.statusStore()`` and the AppStatusStore
        # methods used here (lastStageAttempt / shuffleWriteRecords /
        # shuffleReadRecords / status) are not public Python surface;
        # verified against Spark 4.1.2. Every caller wraps access in
        # try/except: if a future Spark renames them, SHUFFLE progress
        # degrades to the quantized 0-until-reduce-starts report and
        # skipped-stage detection to "not skipped" — progress stays
        # monotone and state() never raises (tested:
        # test_progress_degrades_without_status_store).
        return self._spark.sparkContext._jsc.sc().statusStore()

    def _is_skipped(self, sid: int) -> bool:
        """A stage whose exchange output was reused is SKIPPED: it will
        never complete tasks, so it must not anchor phase accounting."""
        try:
            return (
                self._stage_store().lastStageAttempt(sid).status().toString()
                == "SKIPPED"
            )
        except Exception:
            return False  # not in the store yet → pending, not skipped

    def _shuffle_percentage(self, map_sid: int, red_sid: int) -> float:
        """Pairs-moved shuffle accounting, mirroring the reference's
        contract (shuffled pairs / total intermediate pairs): records
        the reduce-side stage has fetched over records the map-side
        stage wrote. Both counters are cumulative, so the percentage is
        monotone non-decreasing across polls."""
        try:
            store = self._stage_store()
            wrote = store.lastStageAttempt(map_sid).shuffleWriteRecords()
            read = store.lastStageAttempt(red_sid).shuffleReadRecords()
        except Exception:
            return 0.0  # stage data not published yet
        if wrote <= 0:
            return 100.0  # empty shuffle — nothing to move
        return min(100.0, 100.0 * read / wrote)

    def state(self) -> JobState:
        if self._closed:
            return JobState(Stage.UNDEFINED, 0.0)
        if not self._thread.is_alive() and (self._result is not None):
            return JobState(Stage.REDUCE, 100.0)
        tracker = self._spark.sparkContext.statusTracker()
        job_ids = tracker.getJobIdsForGroup(self._group)
        if not job_ids:
            return JobState(Stage.UNDEFINED, 0.0)
        stages: list[tuple[int, int, int]] = []  # (stageId, done, total)
        for jid in job_ids:
            jinfo = tracker.getJobInfo(jid)
            if jinfo is None:
                continue
            for sid in jinfo.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if (
                    sinfo is not None
                    and sinfo.numTasks > 0
                    and not self._is_skipped(sid)
                ):
                    stages.append((sid, sinfo.numCompletedTasks, sinfo.numTasks))
        if not stages:
            return JobState(Stage.UNDEFINED, 0.0)
        stages.sort()
        map_sid, map_done, map_total = stages[0]
        if map_done < map_total:
            return JobState(Stage.MAP, 100.0 * map_done / map_total)
        if len(stages) == 1:
            return JobState(Stage.SHUFFLE, 0.0)
        red_sid, red_done, red_total = stages[-1]
        if red_done == 0:
            return JobState(Stage.SHUFFLE, self._shuffle_percentage(map_sid, red_sid))
        return JobState(Stage.REDUCE, 100.0 * red_done / red_total)

    # -- closeJobHandle parity ---------------------------------------------
    def close(self) -> None:
        if not self._closed:
            self.wait()
            self._closed = True
            self._result = None


def start_job(
    spark: SparkSession,
    df_or_thunk: DataFrame | Callable[[], DataFrame],
    description: str = "map_reduce job",
) -> JobHandle:
    """Start an async job materializing ``df`` (startMapReduceJob parity).

    Returns immediately; the action (collect → the OutputVec analog)
    runs on an InheritableThread inside its own job group so the status
    tracker can attribute stages to this handle.
    """
    group = f"mrjob-{uuid.uuid4().hex[:12]}"
    handle: JobHandle

    def body() -> None:
        try:
            spark.sparkContext.setJobGroup(group, description, interruptOnCancel=True)
            df = df_or_thunk() if callable(df_or_thunk) else df_or_thunk
            handle._result = df.collect()
        except BaseException as exc:  # surfaced on wait()
            handle._error = exc
        finally:
            spark.sparkContext.setJobGroup("", "")

    thread = InheritableThread(target=body, daemon=True)
    handle = JobHandle(spark, group, thread)
    thread.start()
    return handle


def start_map_reduce_job(
    spark: SparkSession,
    client,
    input_df: DataFrame,
    multi_thread_level: int | None = None,
) -> JobHandle:
    """Full signature parity with the reference's entry point
    ``startMapReduceJob(client, inputVec, outputVec, multiThreadLevel)``
    [R:MapReduceFramework.h] — outputVec becomes ``handle.result()``.
    """
    from .map_reduce import run_map_reduce

    return start_job(
        spark,
        lambda: run_map_reduce(input_df, client, multi_thread_level),
        description=f"map_reduce({type(client).__name__})",
    )

"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``).

The reference's only source is an in-memory vector handed to the job
[SURVEY.md R1]; the modern Spark analog of "bring your own source" is
the Python DataSource API: the engine plans one InputPartition per
split and executors read partitions in parallel — the same dynamic-
split contract the reference implemented with an atomic counter, now
expressed declaratively.

``SyntheticEventsDataSource`` is a deterministic generator (a Knuth
multiplicative hash over a row range), so catalog queries over it are
exactly reproducible on any engine — the DuckDB oracle replays the
identical arithmetic over ``generate_series``. Batches are yielded as
pyarrow RecordBatches (the API's vectorized path), never per-row
Python tuples.

At 100 TB this is the shape of a custom feed connector (an internal
record service, a proprietary format): partition planning controls
parallelism, and each partition reads independently with no driver
involvement beyond planning.
"""

from __future__ import annotations

import sys

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Knuth's multiplicative hash constant (public domain, TAOCP vol. 3).
_MULT = 2654435761
_MOD = 2**32


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("osx3_synth").option("n", N).option("parts", P)``.

    Columns: ``id`` (0..n-1), ``bucket`` (hash % 16), ``value``
    (hash % 1000) where ``hash = (id * 2654435761) % 2^32``.
    """

    @classmethod
    def name(cls) -> str:
        return "osx3_synth"

    def schema(self) -> str:
        return "id bigint, bucket int, value bigint"

    def reader(self, schema) -> "_SyntheticReader":
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema) -> "_SyntheticStreamReader":
        return _SyntheticStreamReader(self.options)


class _SyntheticReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100_000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        import math

        per = max(1, math.ceil(self.n / self.parts))
        return [
            InputPartition((lo, min(self.n, lo + per)))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        lo, hi = partition.value
        ids = np.arange(lo, hi, dtype=np.int64)
        h = (ids * _MULT) % _MOD
        yield pa.record_batch(
            [
                pa.array(ids, type=pa.int64()),
                pa.array((h % 16).astype(np.int32), type=pa.int32()),
                pa.array((h % 1000).astype(np.int64), type=pa.int64()),
            ],
            names=["id", "bucket", "value"],
        )


def _gen_rows(lo: int, hi: int):
    # a LIST iterator, not a generator: the streaming prefetch cache
    # copy.copy()s the iterator it hands to the planner, and generators
    # are not copyable (TypeError: cannot pickle 'generator' object)
    return iter(
        [
            (i, int(h % 16), int(h % 1000))
            for i in range(lo, hi)
            for h in ((i * _MULT) % _MOD,)
        ]
    )


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: offsets are row positions;
    each micro-batch serves ``step`` rows until ``n`` are exhausted,
    after which empty batches signal caught-up (so
    ``processAllAvailable()`` terminates deterministically).

    The *simple* stream API reads on the DRIVER (prefetch) — right for
    low-throughput control/feed streams; a high-volume connector would
    implement the partition-planned ``DataSourceStreamReader`` instead
    so executors fetch offset ranges in parallel, exactly like the
    batch reader above. ``readBetweenOffsets`` replays any committed
    range for recovery — the generator is pure, so replayed batches
    are byte-identical (exactly-once friendly).
    """

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100_000))
        self.step = int(options.get("step", 25_000))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        lo = start["pos"]
        hi = min(self.n, lo + self.step)
        return (_gen_rows(lo, hi), {"pos": hi})

    def readBetweenOffsets(self, start, end):
        return _gen_rows(start["pos"], end["pos"])


class SyntheticPartitionedStreamSource(DataSource):
    """``spark.readStream.format("osx3_synth_part")`` — the HIGH-VOLUME
    streaming face: a full ``DataSourceStreamReader`` where the driver
    only plans offset ranges and EXECUTORS read the partitions in
    parallel (vs the simple reader, which prefetches on the driver).
    This is the shape a real feed connector (message bus, record
    service) takes at scale: ``latestOffset`` bounds each micro-batch,
    ``partitions(start, end)`` splits the range, and ``read`` runs
    distributed, yielding Arrow batches. Bounded here (``n`` rows
    total) so availableNow replays deterministically.
    """

    @classmethod
    def name(cls) -> str:
        return "osx3_synth_part"

    def schema(self) -> str:
        return "id bigint, bucket int, value bigint"

    def streamReader(self, schema) -> "_SyntheticPartitionedStreamReader":
        return _SyntheticPartitionedStreamReader(self.options)


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int) -> None:
        self.lo, self.hi = lo, hi


class _SyntheticPartitionedStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100_000))
        self.parts = int(options.get("parts", 8))

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        return {"pos": self.n}

    def partitions(self, start, end):
        import math

        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        per = max(1, math.ceil((hi - lo) / self.parts))
        return [
            _RangePartition(a, min(hi, a + per)) for a in range(lo, hi, per)
        ]

    def read(self, partition):
        # runs on EXECUTORS — same vectorized kernel as the batch reader
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.lo, partition.hi, dtype=np.int64)
        h = (ids * _MULT) % _MOD
        yield pa.record_batch(
            [
                pa.array(ids, type=pa.int64()),
                pa.array((h % 16).astype(np.int32), type=pa.int32()),
                pa.array((h % 1000).astype(np.int64), type=pa.int64()),
            ],
            names=["id", "bucket", "value"],
        )

    def commit(self, end) -> None:
        pass  # nothing external to acknowledge


def register_synthetic_source(spark) -> None:
    """Idempotently register both synthetic sources with this session.

    The classes are registered for BY-VALUE pickling first: Spark plans
    Python data sources in separate driver-side worker processes (e.g.
    ``python_streaming_source_runner``) whose ``sys.path`` is built from
    the JVM's environment, not the driver script's ``sys.path`` — so a
    by-reference pickle raises ``ModuleNotFoundError`` whenever the
    package isn't on the *environment* PYTHONPATH (it is shipped to
    executors via ``addPyFile``, but the planner runs before those
    includes apply). By-value pickling embeds the class code and its
    referenced module globals in the pickle, making registration
    independent of any worker's import path — the right default for a
    "bring your own source" connector handed to someone else's session.
    """
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # older pickle API — fall back to by-reference
    for src in (SyntheticEventsDataSource, SyntheticPartitionedStreamSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass  # already registered in this session

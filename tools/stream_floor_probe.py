#!/usr/bin/env python
"""Decompose the Structured Streaming per-query floor (OPTIMIZATION_r15
"Not yet optimized" #1): run a minimal stateful availableNow stream
(tumbling counts over the staged events split, maxFilesPerTrigger=1 ->
4 micro-batches) and print the per-batch durationMs breakdown, then A/B
state-store knobs interleaved:

  base      : engine defaults (HDFSBackedStateStoreProvider, 8 state parts)
  rocksdb   : spark.sql.streaming.stateStore.providerClass=RocksDB
  retain2   : spark.sql.streaming.minBatchesToRetain=2
  unload    : spark.sql.streaming.stateStore.maintenanceInterval=1h +
              unloadOnCommit... (probe) -- skipped if conf unknown
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from os_ex_3_map_reduce_spark.session import get_spark
from os_ex_3_map_reduce_spark.streaming.events import (
    events_stream,
    run_stream_to_memory,
    staged_events_split_dir,
    tumbling_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="stream_floor_probe")
spark.sparkContext.setLogLevel("ERROR")
src = staged_events_split_dir(spark, SF_DIR)  # memoized staging (4 files)

VARIANTS = {
    "base": {},
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    },
    "retain2": {"spark.sql.streaming.minBatchesToRetain": "2"},
    "maint1h": {"spark.sql.streaming.stateStore.maintenanceInterval": "3600s"},
}

DEFAULTS = {}
for confs in VARIANTS.values():
    for k in confs:
        try:
            DEFAULTS[k] = spark.conf.get(k)
        except Exception:
            DEFAULTS[k] = None


def run_once(variant: str) -> tuple[float, list]:
    confs = VARIANTS[variant]
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        stream = events_stream(spark, SF_DIR, path=src, max_files_per_trigger=1)
        agg = tumbling_counts(stream)
        prog: list = []
        t0 = time.perf_counter()
        run_stream_to_memory(agg, mode="complete", progress_out=prog)
        dt = time.perf_counter() - t0
    finally:
        for k in confs:
            if DEFAULTS.get(k) is not None:
                spark.conf.set(k, DEFAULTS[k])
            else:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
    return dt, prog


# warm-up (JVM/codegen/listing caches)
run_once("base")

res: dict = {}
for rep in range(3):
    for v in VARIANTS:
        try:
            dt, prog = run_once(v)
        except Exception as ex:
            print(f"{v} rep{rep}: FAILED {type(ex).__name__}: {ex}"[:200], flush=True)
            res.setdefault(v, []).append(None)
            continue
        res.setdefault(v, []).append(dt)
        if rep == 0:
            durs = []
            for p in prog:
                d = json.loads(p.json) if hasattr(p, "json") else p
                durs.append(d.get("durationMs", {}))
            print(f"{v} rep0: {dt:.2f}s; per-batch durationMs:", flush=True)
            for i, d in enumerate(durs):
                print(f"    batch{i}: {d}", flush=True)
        else:
            print(f"{v} rep{rep}: {dt:.2f}s", flush=True)

print("\n=== SUMMARY (median of 3) ===")
for v, ts in res.items():
    ok = sorted(t for t in ts if t is not None)
    med = ok[len(ok) // 2] if ok else float("nan")
    print(f"{v}: {['%.2f' % t if t else 'FAIL' for t in ts]} median={med:.2f}")
spark.stop()

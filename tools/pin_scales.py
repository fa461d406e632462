#!/usr/bin/env python
"""Measure pinned-expectation oracle values at every fixture scale.

Pinned oracles (VERDICT r7 #7 pattern) embed the deterministic output
of a pipeline the oracle engine cannot re-derive (seeded LSH / numpy
k-means / sketch internals). VERDICT r8 #6 asks the pins to hold at all
three fixture scales, keyed per-sf inside the SQL by the orders row
count (1500 / 15000 / 150000). This tool produces those pins with the
invariance evidence: it runs a named catalog query at sf0.001 / 0.01 /
0.1 under shuffle.partitions 32 / 7 / 13 each, asserts the three draws
are identical (else pinning would be unsound), and prints the rows as
SQL VALUES tuples ready to paste.

    python tools/pin_scales.py q_ann_ivf_batch [q_other ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
}
PARTITIONINGS = ("32", "7", "13")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(2)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("pin-scales")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    for name in names:
        fn = qs[name]
        print(f"\n=== {name} ===")
        for sf, sf_dir in SF_DIRS.items():
            draws = []
            for p in PARTITIONINGS:
                spark.conf.set("spark.sql.shuffle.partitions", p)
                df = fn(spark, sf_dir)
                rows = sorted(tuple(r) for r in df.collect())
                draws.append(rows)
            if not (draws[0] == draws[1] == draws[2]):
                print(f"  {sf}: NOT partitioning-invariant — cannot pin!")
                for p, d in zip(PARTITIONINGS, draws):
                    print(f"    shuffle.partitions={p}: {d[:4]} ...")
                continue
            cols = df.columns
            print(f"  {sf}: invariant under shuffle.partitions 32/7/13, "
                  f"{len(draws[0])} rows, columns {cols}")
            for r in draws[0]:
                print("    " + repr(tuple(r)) + ",")


if __name__ == "__main__":
    main()

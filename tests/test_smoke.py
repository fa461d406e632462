"""t1-equivalent smoke: entry() runs on sf0.001 and yields rows."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"w", "cnt"}
    # flagship is a top-10 with total tiebreak → exactly 10 deterministic rows
    assert len(rows) == 10

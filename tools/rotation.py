#!/usr/bin/env python
"""Compute the next DRIVER_PRIORITY rotation from verification history.

Reads every CORRECTNESS_r*.json in the repo root, classifies all
registered queries by their latest green verdict, and prints a
suggested 50-name window: never-verified first, then externally-ERR'd,
then oldest-stale greens. Run from the repo root:

    python tools/rotation.py

The output is a starting point — queries whose implementation changed
this round must be promoted manually (the script cannot know the diff).
Keep tests/test_catalog_order.py::MUST_BE_IN_WINDOW in sync with
whatever lands in plans/catalog.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from os_ex_3_map_reduce_spark.plans.catalog import (  # noqa: E402
    DRIVER_PRIORITY,
    DRIVER_WINDOW,
    all_queries,
)


def history() -> dict[str, list[tuple[int, str]]]:
    hist: dict[str, list[tuple[int, str]]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        for name, row in json.load(open(path)).items():
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows")
            )
            status = "green" if ok else ("err" if row.get("err") else "mismatch")
            hist.setdefault(name, []).append((rnd, status))
    return hist


def main() -> None:
    names = list(all_queries())
    hist = history()
    never = [n for n in names if n not in hist]
    last_green: dict[str, int | None] = {}
    for n, rows in hist.items():
        greens = [r for r, s in rows if s == "green"]
        last_green[n] = max(greens) if greens else None
    bad = [n for n in names if n in hist and last_green[n] is None]
    stale = sorted(
        (n for n in names if last_green.get(n) is not None),
        key=lambda n: (last_green[n], n),
    )
    suggestion = (never + bad + stale)[:DRIVER_WINDOW]

    print(f"registered: {len(names)}  window: {DRIVER_WINDOW}")
    print(f"never verified ({len(never)}): {never}")
    print(f"windowed but never green ({len(bad)}): {bad}")
    print("suggested window (rotate changed-this-round names to the front!):")
    for n in suggestion:
        tag = "NEVER" if n in never else ("ERR" if n in bad else f"r{last_green[n]}")
        print(f"  {n}  [{tag}]")
    drop = [n for n in DRIVER_PRIORITY if n not in suggestion]
    add = [n for n in suggestion if n not in DRIVER_PRIORITY]
    print(f"vs current DRIVER_PRIORITY: +{len(add)} -{len(drop)}")


if __name__ == "__main__":
    main()

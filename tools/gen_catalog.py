#!/usr/bin/env python
"""Regenerate CATALOG.md: the full query inventory (name, family,
oracle status, driver-window position, one-line description). Run:

    python tools/gen_catalog.py > CATALOG.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from os_ex_3_map_reduce_spark.plans.catalog import (  # noqa: E402
    DRIVER_WINDOW,
    _ordered,
)


def family(name: str) -> str:
    if name.startswith("q_stream"):
        return "streaming (E7)"
    if name.startswith("q_mapreduce") or name in ("q_udaf_sumsq", "q_udtf_bigrams"):
        return "mapreduce client API (R2-R8)"
    if any(
        k in name
        for k in (
            "dedup", "minhash", "chargram", "simhash", "neardup", "pipeline_clean"
        )
    ):
        return "dedup / near-dup (E1-E2)"
    if any(k in name for k in ("similarity", "embedding", "ann_")):
        return "similarity search (E3)"
    if any(
        k in name
        for k in (
            "text_quality", "token", "lang", "tf", "fingerprint", "wordcount",
            "sample_hash", "contamination", "repetition", "normalize",
        )
    ):
        return "text analysis / pipeline (E4+)"
    if "multimodal" in name:
        return "multimodal (E5)"
    if any(k in name for k in ("sketch", "approx", "salted")):
        return "scale-path variants"
    return "relational core (E6)"


def main() -> None:
    qs = _ordered()
    n_oracle = sum(1 for q in qs if q.oracle)
    print("# CATALOG.md — full query inventory (auto-generated)")
    print()
    print(
        f"{len(qs)} queries, {n_oracle} with exact DuckDB oracles; the "
        f"first {DRIVER_WINDOW} are the round's external-verification "
        f"window (never-verified / changed-this-round first — see "
        f"`plans/catalog.py:DRIVER_PRIORITY`). Regenerate with "
        f"`python tools/gen_catalog.py > CATALOG.md`."
    )
    print()
    print("| # | query | family | oracle | description |")
    print("|---|---|---|---|---|")
    for i, q in enumerate(qs):
        pos = str(i) if i < DRIVER_WINDOW else f"{i} (behind window)"
        oracle = "exact" if q.oracle else "rows-only"
        doc = " ".join(q.doc.split())
        if len(doc) > 220:
            doc = doc[:217] + "..."
        print(f"| {pos} | `{q.name}` | {family(q.name)} | {oracle} | {doc} |")


if __name__ == "__main__":
    main()

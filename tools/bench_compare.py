#!/usr/bin/env python
"""Compare two bench records with calibration normalization applied —
the SURVEY §7.6 rule as a tool, so nobody eyeballs raw seconds across
differently-clocked boots again (the r6/r8/r9 phantom-regression class).

    python tools/bench_compare.py BENCH_r09.json BENCH_r10.json [--top 10]

Accepts either the driver's wrapper files ({"tail": "..."} with the
JSON lines inside) or raw ``bench.py`` output lines. For each query
present in both records it prints raw seconds, normalized seconds
(t / calibration canary), and the normalized ratio new/old; the summary
flags only queries whose NORMALIZED ratio exceeds the threshold —
ambient host-speed swings divide out.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_record(path: str) -> dict:
    """Extract {queries: {...}, calibration_sec: float} from a bench
    file in any of its historical shapes."""
    text = open(path).read()
    candidates: list[dict] = []
    try:
        outer = json.loads(text)
        if isinstance(outer, dict):
            if "queries" in outer:
                candidates.append(outer)
            tail = outer.get("tail", "")
            if tail:
                # the driver stores the bench stdout tail as one string;
                # the full record may be truncated at the FRONT, so
                # regex-scan it instead of json-parsing
                queries = dict(
                    (m.group(1), float(m.group(2)))
                    for m in re.finditer(r'"(q_\w+)": ([0-9.]+)', tail)
                )
                cal = re.search(r'"sec": ([0-9.]+)', tail)
                candidates.append(
                    {
                        "queries": queries,
                        "calibration": {"sec": float(cal.group(1)) if cal else None},
                    }
                )
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in d:
                candidates.append(d)
    best = max(candidates, key=lambda d: len(d.get("queries", {})), default=None)
    if not best or not best.get("queries"):
        raise SystemExit(f"{path}: no bench queries found")
    cal = (best.get("calibration") or {}).get("sec")
    return {
        "queries": best["queries"],
        "cal": cal,
        # r13: per-segment canaries (bench.py stamps each breadth
        # hygiene window with its own host probe). Older records
        # lack these; per-query normalization falls back to the
        # global calibration.
        "segment_canaries": best.get("segment_canaries") or [],
        "query_segments": best.get("query_segments") or {},
    }


def per_query_cal(rec: dict, q: str, default: float) -> float:
    """The canary value that applies to query ``q``: its segment's
    probe when the record carries one, else the global calibration."""
    seg = rec["query_segments"].get(q)
    cans = rec["segment_canaries"]
    if seg is not None and isinstance(seg, int) and seg < len(cans):
        c = cans[seg]
        if isinstance(c, (int, float)) and c == c and c > 0:  # not NaN
            return float(c)
    return default


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10, help="rows to print")
    ap.add_argument(
        "--flag", type=float, default=1.5, help="normalized-ratio flag threshold"
    )
    args = ap.parse_args()
    a, b = load_record(args.old), load_record(args.new)
    ca, cb = a["cal"], b["cal"]
    if not ca or not cb:
        print(
            "WARNING: missing calibration in "
            + ("both" if not ca and not cb else (args.old if not ca else args.new))
            + " — ratios below are RAW, not normalized",
            file=sys.stderr,
        )
        ca = cb = 1.0
    common = sorted(set(a["queries"]) & set(b["queries"]))
    rows = []
    for q in common:
        ta, tb = a["queries"][q], b["queries"][q]
        na = ta / per_query_cal(a, q, ca)
        nb = tb / per_query_cal(b, q, cb)
        rows.append((nb / na if na else float("inf"), q, ta, tb, na, nb))
    rows.sort(reverse=True)
    print(
        f"{len(common)} common queries; calibration {ca:.3f}s -> {cb:.3f}s "
        f"(host speed factor {cb / ca:.2f}x)"
    )
    for label, rec in (("old", a), ("new", b)):
        cans = [
            c for c in rec["segment_canaries"]
            if isinstance(c, (int, float)) and c == c
        ]
        if cans:
            med = sorted(cans)[len(cans) // 2]
            # flag vs the run's MEDIAN, not its min: min-of-2 probes
            # have one-sided noise (a lucky fast probe would flag every
            # normal segment), while a genuine ambient throttle moves a
            # probe 2-3x past the median (the r10/r12 signature)
            polluted = [i for i, c in enumerate(cans) if c > 2.0 * med]
            print(
                f"{label} segment canaries (median {med:.3f}s): {cans}"
                + (f"  POLLUTED segments: {polluted}" if polluted else "")
            )
    print(f"{'query':34} {'old_s':>7} {'new_s':>7} {'old_n':>7} {'new_n':>7} {'n_ratio':>7}")
    for r, q, ta, tb, na, nb in rows[: args.top]:
        print(f"{q:34} {ta:7.3f} {tb:7.3f} {na:7.2f} {nb:7.2f} {r:7.2f}")
    flagged = [q for r, q, *_ in rows if r >= args.flag]
    print(
        f"\nflagged (normalized ratio >= {args.flag}): "
        + (", ".join(flagged) if flagged else "none")
    )


if __name__ == "__main__":
    main()

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


def resolve(path: str) -> str:
    """Allow round shorthands: ``r13`` / ``13`` resolve to
    ``BENCH_LOCAL_r13.json`` when present (the full committed record,
    VERDICT r13 #2) else ``BENCH_r13.json`` (the driver's tail capture,
    which may be truncated). Explicit paths pass through untouched."""
    import glob
    import os

    m = re.fullmatch(r"r?(\d+)", path)
    if not m:
        return path
    rnd = int(m.group(1))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pat in (f"BENCH_LOCAL_r{rnd:02d}.json", f"BENCH_LOCAL_r{rnd}.json",
                f"BENCH_r{rnd:02d}.json", f"BENCH_r{rnd}.json"):
        hits = glob.glob(os.path.join(root, pat))
        if hits:
            return hits[0]
    raise SystemExit(f"no bench record found for round {rnd}")


def load_record(path: str) -> dict:
    """Extract {queries: {...}, calibration_sec: float} from a bench
    file in any of its historical shapes."""
    path = resolve(path)
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


def per_query_cal(rec: dict, q: str, default: float, use_segments: bool = True) -> float:
    """The canary that applies to query ``q``: the MEDIAN of the run's
    segment probes when the record carries them, else the global
    calibration. Median, not the query's own segment probe: a single
    min-of-2 probe can catch a transient spike that never touched the
    neighbouring queries (observed r13: one 0.53 s probe in an
    otherwise 0.13 s run made every query in that segment look 4x
    faster than it was), while a genuine sustained throttle — the
    r10/r12 failure mode — moves most probes and therefore the
    median. Per-segment values stay in the record as pollution FLAGS
    (see the summary line), not as divisors."""
    cans = [
        c
        for c in rec["segment_canaries"]
        if isinstance(c, (int, float)) and c == c and c > 0
    ]
    if cans and use_segments:
        return float(sorted(cans)[len(cans) // 2])
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
    # Segment canaries are min-of-2 probes, systematically lower than
    # the start-of-run median-of-3 calibration (same op, warmer JVM) —
    # the two styles must never be mixed across the pair, or the
    # record that has segments looks uniformly "slower" normalized.
    use_seg = bool(a["segment_canaries"]) and bool(b["segment_canaries"])
    rows = []
    for q in common:
        ta, tb = a["queries"][q], b["queries"][q]
        na = ta / per_query_cal(a, q, ca, use_seg)
        nb = tb / per_query_cal(b, q, cb, use_seg)
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

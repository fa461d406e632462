"""Round-15 additions: weighted tree centralities and the
session-window late-data proof. The oracles are hash-verified by the
driver sim; these tests pin the MATH and the MECHANISM independently —
brute-force weighted distance sums / diameter over the explicit tree,
and the watermark-drop progress counter — so a future refactor that
changes both engine sides in the same wrong way still fails CI."""

from __future__ import annotations

import collections
import datetime as dt
import itertools

from pyspark.sql import functions as F

from os_ex_3_map_reduce_spark.plans.catalog import get_query

SF = "/root/testdata/sf0.001"  # smallest fixture: brute force stays cheap


def _weighted_tree(duck):
    """Explicit weighted tree: node -> (parent, edge weight to parent),
    with the same key-derived weights as the queries (wr = 1+r%5,
    wn = 1+n%7, wc = 1+c%11)."""
    nat = duck.execute(
        "SELECT n_nationkey, n_regionkey FROM "
        f"read_parquet('{SF}/nation.parquet')"
    ).fetchall()
    cust = duck.execute(
        "SELECT c_custkey, c_nationkey FROM "
        f"read_parquet('{SF}/customer.parquet')"
    ).fetchall()
    reg = duck.execute(
        f"SELECT r_regionkey FROM read_parquet('{SF}/region.parquet')"
    ).fetchall()
    parent: dict[str, tuple[str | None, int]] = {"root": (None, 0)}
    for (r,) in reg:
        parent[f"r{r}"] = ("root", 1 + r % 5)
    for n, r in nat:
        parent[f"n{n}"] = (f"r{r}", 1 + n % 7)
    for c, n in cust:
        parent[f"c{c}"] = (f"n{n}", 1 + c % 11)
    return parent, reg, nat, cust


def _depths(parent):
    depth: dict[str, int] = {}

    def d(v: str) -> int:
        if v not in depth:
            p, w = parent[v]
            depth[v] = 0 if p is None else d(p) + w
        return depth[v]

    for v in parent:
        d(v)
    return depth


def _rootpath(parent, v):
    path = []
    while v is not None:
        path.append(v)
        v = parent[v][0]
    return path


def _dist(parent, depth, a, b):
    pa, pb = _rootpath(parent, a), _rootpath(parent, b)
    sa = set(pa)
    lca = next(x for x in pb if x in sa)
    return depth[a] + depth[b] - 2 * depth[lca]


def test_closeness_tree_weighted_matches_bruteforce(spark, duck):
    """farness from the LCA weight-mass decomposition == literal sum of
    unique-path weighted distances over every node pair."""
    parent, reg, nat, cust = _weighted_tree(duck)
    depth = _depths(parent)
    nodes = sorted(parent)
    far = {
        v: sum(_dist(parent, depth, v, u) for u in nodes) for v in nodes
    }

    rows = get_query("q_closeness_tree_weighted").fn(spark, SF).collect()
    got = {r.node: r.farness for r in rows}
    interior = (
        ["root"]
        + [f"r{r}" for (r,) in reg]
        + [f"n{n}" for n, _ in nat]
    )
    assert got == {v: far[v] for v in interior}
    # leaf bounds: exact min/max brute-force farness among each
    # nation's customers
    by_nation: dict[str, list[int]] = collections.defaultdict(list)
    for c, n in cust:
        by_nation[f"n{n}"].append(far[f"c{c}"])
    for r in rows:
        if r.node.startswith("n"):
            if by_nation.get(r.node):
                assert r.leaf_farness_min == min(by_nation[r.node])
                assert r.leaf_farness_max == max(by_nation[r.node])
            else:
                assert r.leaf_farness_min is None
                assert r.leaf_farness_max is None


def test_tree_diameter_weighted_matches_bruteforce(spark, duck):
    """Diameter (and each path-class maximum) from the relational
    two-best-children DP == literal max over all node pairs."""
    parent, reg, nat, cust = _weighted_tree(duck)
    depth = _depths(parent)
    nodes = sorted(parent)
    best = {"1_within_nation": 0, "2_within_region": 0, "3_cross_region": 0}
    diameter = 0
    for a, b in itertools.combinations(nodes, 2):
        pa, pb = _rootpath(parent, a), _rootpath(parent, b)
        sa = set(pa)
        lca = next(x for x in pb if x in sa)
        d = depth[a] + depth[b] - 2 * depth[lca]
        diameter = max(diameter, d)
        if lca == "root":
            best["3_cross_region"] = max(best["3_cross_region"], d)
        elif lca.startswith("n"):
            best["1_within_nation"] = max(best["1_within_nation"], d)
        elif lca.startswith("r"):
            best["2_within_region"] = max(best["2_within_region"], d)
    got = {
        r.path_class: r.length
        for r in get_query("q_tree_diameter_weighted").fn(spark, SF).collect()
    }
    assert got["4_diameter"] == diameter
    assert got["3_cross_region"] == best["3_cross_region"]
    # within-nation / within-region class maxima: the brute force
    # classifies by LCA, which is exactly the query's path classes
    assert got["1_within_nation"] == best["1_within_nation"]
    assert got["2_within_region"] == best["2_within_region"]


def test_session_late_data_dropped_by_watermark_mechanism(spark):
    """q_stream_late_data_session's oracle proves the OUTPUT is
    unpolluted; this pins the MECHANISM: progress records must show
    exactly the late-copy count dropped by the watermark, and the
    advancer's never-finalized session must stay unemitted."""
    from os_ex_3_map_reduce_spark.sources.tables import event_time_expr
    from os_ex_3_map_reduce_spark.streaming.events import (
        events_stream,
        late_events_dir,
        run_stream_to_memory,
    )

    src = late_events_dir(spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ts_utc = event_time_expr(ev)
    first_bucket = ev.agg(F.min(F.date_trunc("hour", ts_utc))).first()[0]
    n_copies = ev.where(
        F.date_trunc("hour", ts_utc) == F.lit(first_bucket)
    ).count()
    assert n_copies > 0

    stream = events_stream(spark, SF, path=src, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts_utc", "10 minutes")
        .groupBy(
            F.session_window("ts_utc", "10 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
    )
    progress: list = []
    name = run_stream_to_memory(agg, mode="append", progress_out=progress)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for op in (p.get("stateOperators") or [])
    )
    assert dropped == n_copies, (dropped, n_copies)
    out = spark.table(name)
    assert out.where(F.col("user_id") < 0).count() == 0
    # every REAL session was finalized and emitted: total emitted
    # events == original event count
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()


def test_session_window_gap_boundary_semantics(spark):
    """Pin the cross-engine session boundary contract on a literal
    micro-case: events exactly GAP apart DO merge (Spark merges on
    inclusive window overlap — measured r15, it corrected the oracle's
    island rule from >= gap to > gap), and session_end == last event
    + gap."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    gap = dt.timedelta(minutes=10)
    rows = [
        # user 1: second event EXACTLY at gap -> ONE session (measured
        # r15: Spark merges on INCLUSIVE window overlap, so the island
        # rule both oracles mirror is "new session when delta > gap",
        # not >=)
        (1, base),
        (1, base + gap),
        # user 2: second event 1 us inside the gap -> ONE session
        (2, base),
        (2, base + gap - dt.timedelta(microseconds=1)),
        # user 3: second event 1 us past the gap -> TWO sessions
        (3, base),
        (3, base + gap + dt.timedelta(microseconds=1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_utc timestamp")
    got = (
        df.groupBy(
            F.session_window("ts_utc", "10 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("start"),
            F.col("w.end").alias("end"),
            "n",
        )
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in got:
        by_user[r.user_id].append(r)
    assert len(by_user[1]) == 1 and by_user[1][0].n == 2
    assert len(by_user[2]) == 1 and by_user[2][0].n == 2
    assert len(by_user[3]) == 2 and all(r.n == 1 for r in by_user[3])
    # end = last event + gap
    for r in got:
        starts = [t for u, t in rows if u == r.user_id and r.start <= t < r.end]
        assert r.end == max(starts) + gap

"""Round-14 additions: exact tree betweenness + the case/edit-distance
drift tripwire. The oracles are hash-verified by the driver sim; these
tests pin the MATH independently — brute-force BFS betweenness, and
pure-python recomputation of the audit integers — so a future refactor
that changes both engine sides in the same wrong way still fails CI."""

from __future__ import annotations

import collections

from os_ex_3_map_reduce_spark.plans.catalog import get_query

SF = "/root/testdata/sf0.001"  # smallest fixture: brute force stays cheap


def test_betweenness_tree_matches_bruteforce_bfs(spark, duck):
    """B(v) from the subtree-size decomposition == literal Brandes on
    the explicit tree: BFS from every source, walk every (s, t) pair's
    unique path, count interior visits."""
    nat = duck.execute("SELECT n_nationkey, n_regionkey FROM "
                       f"read_parquet('{SF}/nation.parquet')").fetchall()
    cust = duck.execute("SELECT c_custkey, c_nationkey FROM "
                        f"read_parquet('{SF}/customer.parquet')").fetchall()
    reg = duck.execute("SELECT r_regionkey FROM "
                       f"read_parquet('{SF}/region.parquet')").fetchall()
    adj: dict[str, set[str]] = collections.defaultdict(set)
    for (r,) in reg:
        adj["root"].add(f"r{r}")
        adj[f"r{r}"].add("root")
    for n, r in nat:
        adj[f"r{r}"].add(f"n{n}")
        adj[f"n{n}"].add(f"r{r}")
    for c, n in cust:
        adj[f"n{n}"].add(f"c{c}")
        adj[f"c{c}"].add(f"n{n}")
    nodes = sorted(adj)
    brute: collections.Counter[str] = collections.Counter()
    for s in nodes:
        parent: dict[str, str | None] = {s: None}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in parent:
                    parent[v] = u
                    q.append(v)
        for t in nodes:
            if t <= s:
                continue
            u = parent[t]
            while u is not None and u != s:
                brute[u] += 1
                u = parent[u]  # type: ignore[assignment]

    got = {
        r.node: r.betweenness
        for r in get_query("q_betweenness_tree").fn(spark, SF).collect()
    }
    # All interior nodes, defaulting to 0 — the query emits every
    # root/region/nation row, so a customer-less nation (B=0) must
    # appear on BOTH sides (ADVICE r14: filtering v > 0 here would
    # break on a fixture regen containing an empty nation).
    interior = (
        ["root"]
        + [f"r{r}" for (r,) in reg]
        + [f"n{n}" for n, _ in nat]
    )
    want = {k: brute.get(k, 0) for k in interior}
    assert got == want
    # structural invariants: only interior nodes appear, root dominates
    assert len(got) == 1 + len(reg) + len(nat)
    assert max(got, key=got.get) == "root" or got["root"] == max(got.values())


def test_case_edit_audit_integers_recompute(spark, duck):
    """Recompute every audit integer in pure python over the raw
    corpus; on this (ASCII) corpus lev_fold_prefix must equal the
    uppercase count of each 256-char prefix — the in-band proof the
    byte-levenshtein pin computes the same DP as an independent
    character count."""
    texts = [
        r[0]
        for r in duck.execute(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    ]
    row = get_query("q_case_edit_audit").fn(spark, SF).collect()[0]
    assert row.n_docs == len(texts)
    assert row.n_multibyte_docs == sum(
        1 for t in texts if len(t.encode()) != len(t)
    )
    assert row.byte_surplus == sum(len(t.encode()) - len(t) for t in texts)
    assert row.n_upper_ascii == sum(
        sum(1 for ch in t if "A" <= ch <= "Z") for t in texts
    )
    assert row.n_lower_ascii == sum(
        sum(1 for ch in t if "a" <= ch <= "z") for t in texts
    )
    assert row.n_case_danger_docs == sum(
        1 for t in texts if any(c in t for c in "İıẞßΣ")
    )
    # prefix fold distance == uppercase count in prefix (ASCII corpus);
    # if the corpus ever gains multibyte chars this equality can break
    # legitimately — then compare against a python-side levenshtein.
    if row.n_multibyte_docs == 0:
        assert row.lev_fold_prefix == sum(
            sum(1 for ch in t[:256] if "A" <= ch <= "Z") for t in texts
        )


def test_l_diversity_integers_recompute(spark, duck):
    """Recompute the L0 (finest) level's diversity integers in pure
    python: group customers by (nation, floor(bal/1000)), count
    distinct segments, and rebuild every output column."""
    import math

    rows = duck.execute(
        "SELECT c_nationkey, c_mktsegment, c_acctbal FROM "
        f"read_parquet('{SF}/customer.parquet')"
    ).fetchall()
    groups: dict[tuple, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for nat, seg, bal in rows:
        groups[(nat, math.floor(bal / 1000))][seg] += 1
    l_by_group = {g: len(c) for g, c in groups.items()}
    size = {g: sum(c.values()) for g, c in groups.items()}
    top = {g: max(c.values()) for g, c in groups.items()}

    out = {
        r.level: r
        for r in get_query("q_l_diversity").fn(spark, SF).collect()
    }
    r0 = out["L0_nat_bal1000"]
    assert r0.n_groups == len(groups)
    assert r0.min_l == min(l_by_group.values())
    assert r0.n_homogeneous == sum(1 for v in l_by_group.values() if v == 1)
    assert r0.n_groups_below_3 == sum(1 for v in l_by_group.values() if v < 3)
    assert r0.n_rows_at_risk == sum(
        size[g] for g, v in l_by_group.items() if v < 3
    )
    assert r0.largest_homogeneous == max(
        (size[g] for g, v in l_by_group.items() if v == 1), default=0
    )
    assert r0.n_majority_dominated == sum(
        1 for g in groups if 2 * top[g] > size[g]
    )
    # ladder monotonicity: coarsening can only increase class sizes,
    # so min_l is non-decreasing up the ladder on this fixture
    assert out["L2_nat"].min_l >= r0.min_l


def test_t_closeness_integers_recompute(spark, duck):
    """Recompute the L0 level's t-closeness counters in pure python
    with exact Fractions: TVD(group) = half the L1 distance between
    the group's sensitive distribution and the corpus distribution."""
    from fractions import Fraction

    rows = duck.execute(
        "SELECT c_nationkey, c_mktsegment, c_acctbal FROM "
        f"read_parquet('{SF}/customer.parquet')"
    ).fetchall()
    import math

    glob: collections.Counter = collections.Counter(seg for _, seg, _ in rows)
    n = len(rows)
    groups: dict[tuple, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for nat, seg, bal in rows:
        groups[(nat, math.floor(bal / 1000))][seg] += 1
    above_q = above_h = rows_q = 0
    for g, c in groups.items():
        sz = sum(c.values())
        tvd = (
            sum(abs(Fraction(c.get(s, 0), sz) - Fraction(glob[s], n)) for s in glob)
            / 2
        )
        if tvd > Fraction(1, 4):
            above_q += 1
            rows_q += sz
        if tvd > Fraction(1, 2):
            above_h += 1
    out = {
        r.level: r for r in get_query("q_t_closeness").fn(spark, SF).collect()
    }
    r0 = out["L0_nat_bal1000"]
    assert r0.n_groups == len(groups)
    assert r0.n_tvd_above_quarter == above_q
    assert r0.n_tvd_above_half == above_h
    assert r0.n_rows_above_quarter == rows_q
    # at least one threshold must discriminate on the fixture, else the
    # audit is vacuous
    assert 0 < above_q < len(groups)


def test_closeness_tree_matches_bruteforce_bfs(spark, duck):
    """Farness from the LCA depth decomposition == literal BFS distance
    sums on the explicit tree, including the shared leaf value."""
    nat = duck.execute("SELECT n_nationkey, n_regionkey FROM "
                       f"read_parquet('{SF}/nation.parquet')").fetchall()
    cust = duck.execute("SELECT c_custkey, c_nationkey FROM "
                        f"read_parquet('{SF}/customer.parquet')").fetchall()
    reg = duck.execute("SELECT r_regionkey FROM "
                       f"read_parquet('{SF}/region.parquet')").fetchall()
    adj: dict[str, set[str]] = collections.defaultdict(set)
    for (r,) in reg:
        adj["root"].add(f"r{r}")
        adj[f"r{r}"].add("root")
    for nk, r in nat:
        adj[f"r{r}"].add(f"n{nk}")
        adj[f"n{nk}"].add(f"r{r}")
    for c, nk in cust:
        adj[f"n{nk}"].add(f"c{c}")
        adj[f"c{c}"].add(f"n{nk}")

    def farness(src: str) -> int:
        dist = {src: 0}
        q = collections.deque([src])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return sum(dist.values())

    got = {
        r.node: (r.farness, r.leaf_farness)
        for r in get_query("q_closeness_tree").fn(spark, SF).collect()
    }
    assert got["root"][0] == farness("root")
    one_cust_of: dict[int, int] = {}
    for c, nk in cust:
        one_cust_of.setdefault(nk, c)
    for nk, r in nat:
        node = f"n{nk}"
        assert got[node][0] == farness(node), node
        if nk in one_cust_of:
            assert got[node][1] == farness(f"c{one_cust_of[nk]}"), node
    for (r,) in reg:
        assert got[f"r{r}"][0] == farness(f"r{r}")
    # root is the closeness center of this hierarchy
    assert got["root"][0] == min(v for v, _ in got.values())

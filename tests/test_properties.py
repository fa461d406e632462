"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5.1: golden outputs only, no property testing).

The generic map_reduce operator must agree with a plain-pandas
reference implementation for ANY client: arbitrary key/value data,
duplicate keys, empty emissions, 0..N fan-out. Spark jobs per example
are expensive, so examples are capped and deadlines disabled; the
value distribution (text keys incl. empties/unicode, signed ints)
still covers the interesting boundaries.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from os_ex_3_map_reduce_spark.operators.map_reduce import (
    MapReduceClient,
    run_map_reduce,
)

def collect_unpersist(df):
    """Collect a non-eager operator result, then unpersist the internal
    relations it pinned (exposed via ``_osx3_persists``) — direct
    non-eager callers otherwise accumulate cached blocks for the
    session's lifetime (ADVICE r7)."""
    try:
        return df.collect()
    finally:
        for held in getattr(df, "_osx3_persists", ()):
            held.unpersist()


KEYS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=0,
    max_size=4,
)
ROWS = st.lists(st.tuples(KEYS, st.integers(-1000, 1000)), min_size=1, max_size=40)


class SumEvensDropOdds(MapReduceClient):
    """Exercises every emission arity: map emits 0 pairs for negative
    values, 2 pairs for multiples of ten, else 1; reduce emits nothing
    for keys whose sum is odd."""

    intermediate_schema = "k string, v long"
    output_schema = "k string, total long"

    def map(self, row):
        if row.v < 0:
            return []
        if row.v % 10 == 0:
            return [(row.k, row.v), (row.k, row.v)]
        return [(row.k, row.v)]

    def reduce(self, key, group: pd.DataFrame):
        total = int(group["v"].sum())
        if total % 2 == 1:
            return []
        return [(key[0], total)]


def _reference(rows: list[tuple[str, int]]) -> set[tuple[str, int]]:
    acc: dict[str, int] = {}
    for k, v in rows:
        if v < 0:
            continue
        acc[k] = acc.get(k, 0) + (2 * v if v % 10 == 0 else v)
    return {(k, t) for k, t in acc.items() if t % 2 == 0}


@pytest.mark.filterwarnings("ignore")
@given(rows=ROWS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_map_reduce_matches_pandas_reference(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r.k, r.total) for r in run_map_reduce(df, SumEvensDropOdds()).collect()
    }
    assert got == _reference(rows)


@pytest.mark.filterwarnings("ignore")
@given(rows=ROWS)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_map_reduce_parallelism_invariance(spark, rows):
    """The reference's multiThreadLevel sweep as a property: reduce-side
    partition count must never change the result."""
    df = spark.createDataFrame(rows, "k string, v long")
    a = {
        (r.k, r.total)
        for r in run_map_reduce(df, SumEvensDropOdds(), num_shuffle_partitions=1).collect()
    }
    b = {
        (r.k, r.total)
        for r in run_map_reduce(df, SumEvensDropOdds(), num_shuffle_partitions=7).collect()
    }
    assert a == b == _reference(rows)


TOKENS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=0, max_size=40
)


@given(toks=TOKENS)
@settings(max_examples=200, deadline=None)
def test_rolling_hash_polynomial_identity(toks):
    """The O(1)-per-step Rabin-Karp recurrence must equal the direct
    per-window polynomial — the identity the DuckDB oracle relies on
    (it evaluates windows directly, no recurrence)."""
    import hashlib

    from os_ex_3_map_reduce_spark.functions.text import (
        RK_BASE,
        RK_MOD,
        rolling_hashes,
    )

    got = rolling_hashes(toks, n=3)
    vals = [
        int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % RK_MOD
        for t in toks
    ]
    want = [
        (vals[i] * RK_BASE * RK_BASE + vals[i + 1] * RK_BASE + vals[i + 2])
        % RK_MOD
        for i in range(len(vals) - 2)
    ]
    assert got == want


@given(hashes=st.lists(st.integers(min_value=0, max_value=2**61 - 2), max_size=30))
@settings(max_examples=200, deadline=None)
def test_winnow_guarantees(hashes):
    """Winnowing invariants (Schleimer et al.): every fingerprint is a
    window minimum present in the input; consecutive fingerprints never
    repeat; non-empty input always yields at least one fingerprint."""
    from os_ex_3_map_reduce_spark.functions.text import winnow

    fp = winnow(hashes, window=4)
    if not hashes:
        assert fp == []
        return
    assert fp, "non-empty input must fingerprint"
    assert all(f in hashes for f in fp)
    assert all(a != b for a, b in zip(fp, fp[1:]))
    if len(hashes) <= 4:
        assert fp == [min(hashes)]
    else:
        mins = [min(hashes[i : i + 4]) for i in range(len(hashes) - 3)]
        dedup = [m for j, m in enumerate(mins) if j == 0 or mins[j - 1] != m]
        assert fp == dedup


@given(
    n_tokens=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=50),
    cap=st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=200, deadline=None)
def test_pack_chunks_arithmetic(n_tokens, cap):
    """Concat-and-chunk accounting invariants: offsets stay inside the
    chunk capacity, chunk ids are non-decreasing in stream order, and a
    doc's span covers exactly its token interval."""
    cum = 0
    prev_chunk = 0
    for nt in n_tokens:
        if nt == 0:
            continue
        chunk_id, off = cum // cap, cum % cap
        last = (cum + nt - 1) // cap
        assert 0 <= off < cap
        assert chunk_id >= prev_chunk
        assert last >= chunk_id
        # tokens spanned by [chunk_id..last] must cover [cum, cum+nt)
        assert chunk_id * cap <= cum and cum + nt <= (last + 1) * cap
        prev_chunk = chunk_id
        cum += nt


@given(
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_bmp_roundtrip_any_shape(h, w, seed):
    """Every (H, W, 3) uint8 image must survive encode→decode exactly —
    including widths whose rows need 1-3 pad bytes."""
    import numpy as np

    from os_ex_3_map_reduce_spark.functions.codecs import decode_bmp, encode_bmp

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@given(
    n=st.integers(min_value=0, max_value=2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_any_samples(n, rate, seed):
    import numpy as np

    from os_ex_3_map_reduce_spark.functions.codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n).astype(np.int16)
    back, got_rate = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
    assert got_rate == rate
    assert np.array_equal(back, samples)


# --- CDC merge semantics ---------------------------------------------------

CDC_KEYS = st.integers(min_value=0, max_value=9)
CDC_BASE = st.dictionaries(CDC_KEYS, st.integers(-100, 100), max_size=8)
CDC_CHANGES = st.lists(
    st.tuples(
        CDC_KEYS,
        st.sampled_from(["U", "D"]),
        st.integers(0, 5),  # version (may collide across keys, not within)
        st.integers(-100, 100),
    ),
    max_size=12,
)


@given(base=CDC_BASE, changes=CDC_CHANGES)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_latest_wins_plus_merge_matches_dict_reference(spark, base, changes):
    """latest_wins + merge_upsert must equal the obvious dict-apply for
    ANY change batch: per key take the (version, op)-max change ('D'
    beats 'U' on a version tie), delete or upsert accordingly, carry
    everything else over. This is the semantics q_merge_upsert and the
    streaming CDC pipeline both build on."""
    from os_ex_3_map_reduce_spark.operators.merge import latest_wins, merge_upsert

    # de-duplicate (key, version) pairs so the documented "keep version
    # unique per key" precondition holds (ties on (version, op) are
    # documented nondeterministic)
    seen: set[tuple[int, int]] = set()
    uniq = []
    for k, op, v, val in changes:
        if (k, v) not in seen:
            seen.add((k, v))
            uniq.append((k, op, v, val))

    # dict reference: versions are unique per key (enforced above), so
    # the winner is simply the max-version change for the key
    winner: dict[int, tuple[int, str, int]] = {}
    for k, op, v, val in uniq:
        cur = winner.get(k)
        if cur is None or v > cur[0]:
            winner[k] = (v, op, val)
    want = dict(base)
    for k, (v, op, val) in winner.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = val

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k long, val long"
    ).where(F.col("k").isNotNull())
    ch_df = spark.createDataFrame(
        [(k, op, v, val) for k, op, v, val in uniq] or [(None, None, None, None)],
        "k long, op string, version long, val long",
    ).where(F.col("k").isNotNull())
    one = latest_wins(ch_df, key="k", version_col="version")
    got = {
        r.k: r.val for r in merge_upsert(base_df, one, key="k").collect()
    }
    assert got == want


# --- simhash banding pigeonhole -------------------------------------------


@given(
    fp=st.integers(min_value=0, max_value=2**64 - 1),
    flip_bits=st.lists(
        st.integers(min_value=0, max_value=63), max_size=7, unique=True
    ),
)
@settings(max_examples=300, deadline=None)
def test_simhash_banding_pigeonhole(fp, flip_bits):
    """The 8-chunk split used by simhash_neardup_pairs must guarantee
    that any pair with Hamming distance <= 7 shares at least one chunk
    (recall exactly 1) — pure arithmetic on the width/offset layout,
    no Spark. Flipping at most 7 bits of any fingerprint must leave
    some chunk untouched."""
    max_hamming = 7
    n_chunks = max_hamming + 1
    base_w, extra = divmod(64, n_chunks)
    widths = [base_w + (1 if c < extra else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    assert sum(widths) == 64

    other = fp
    for b in flip_bits:
        other ^= 1 << b

    def chunk(x, c):
        return (x >> offsets[c]) & ((1 << widths[c]) - 1)

    shared = any(chunk(fp, c) == chunk(other, c) for c in range(n_chunks))
    assert shared


# --- bloom filter (membership sketch) --------------------------------------


@given(
    keys=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=60, unique=True),
    probes=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=60),
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_bloom_never_false_negative(spark, keys, probes):
    """Membership-sketch contract: every true key passes the filter
    (false positives allowed, false negatives never)."""
    from os_ex_3_map_reduce_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
    )

    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    pdf = spark.createDataFrame([(p,) for p in set(probes) | set(keys)], "k long")
    bloom = bloom_build(kdf, "k", num_bits=1 << 12, num_hashes=4)
    passed = {
        r.k
        for r in bloom_might_contain(
            bloom, pdf, "k", num_bits=1 << 12, num_hashes=4
        ).collect()
    }
    missing = set(keys) - passed
    assert not missing, f"false negatives: {missing}"


def test_bloom_prune_counts_pinned(spark):
    """Deterministic sizing evidence on the fixture: 2^16 bits / 5
    hashes over Brand#4's part keys prunes the sf0.01 fact side to
    exactly the semi-join row count (zero false positives). A fixture
    or hash drift changes these numbers loudly."""
    from os_ex_3_map_reduce_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
    )
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    dim = (
        load_table(spark, sf, "part")
        .where(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    fact = load_table(spark, sf, "lineitem")
    pruned = bloom_might_contain(bloom_build(dim, "p_partkey"), fact, "l_partkey")
    n_pruned = pruned.count()
    n_exact = fact.join(
        F.broadcast(dim), fact.l_partkey == dim.p_partkey, "left_semi"
    ).count()
    assert n_exact == 2829
    assert n_pruned == n_exact  # zero false positives at this sizing


# --- batch sessionization ---------------------------------------------------


def test_sessionize_invariants(spark):
    """Within a session consecutive gaps are <= the threshold; between
    a user's consecutive sessions the gap is > the threshold; event
    counts conserve."""
    from os_ex_3_map_reduce_spark.plans import all_queries
    from os_ex_3_map_reduce_spark.plans.relational import _SESSION_GAP_US
    from os_ex_3_map_reduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    sessions = all_queries()["q_sessionize"](spark, sf).collect()
    ev = load_table(spark, sf, "events")
    assert sum(r.n_events for r in sessions) == ev.count()
    by_user: dict[int, list] = {}
    for r in sessions:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.session_seq)
        # session_seq is 1..N dense per user
        assert [r.session_seq for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            gap = b.start_us - (a.start_us + a.duration_us)
            assert gap > _SESSION_GAP_US, (user, a, b)


# ---------------------------------------------------------------------------
# Prefix-filter set-similarity join (operators/setsim.py)
# ---------------------------------------------------------------------------


def test_prefix_filter_join_is_complete_and_exact(spark):
    """The pigeonhole completeness theorem, checked against brute force:
    on a corpus engineered with heavy token overlap, the prefix-filter
    join must return EXACTLY the pairs whose word-3-gram Jaccard >= t —
    nothing missed (completeness), nothing below threshold (verify)."""
    from os_ex_3_map_reduce_spark.operators.setsim import prefix_filter_pairs

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []
    for i in range(24):
        base = [vocab[(i + j) % len(vocab)] for j in range(8)]
        if i % 3 == 1:  # near-dup of the previous doc: one token edited
            base = [vocab[(i - 1 + j) % len(vocab)] for j in range(8)]
            base[7] = "unique%d" % i
        docs.append((i, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b)
        for r in collect_unpersist(prefix_filter_pairs(df, threshold=0.5))
    }

    def shingles(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    want = set()
    sets = {i: shingles(t) for i, t in docs}
    for a in range(24):
        for b in range(a + 1, 24):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= 0.5:
                want.add((a, b))
    assert want, "test corpus produced no qualifying pairs"
    assert got == want


# ---------------------------------------------------------------------------
# Integer-exact PageRank (operators/graph.py)
# ---------------------------------------------------------------------------


def test_pagerank_exact_under_any_partitioning(spark):
    """The integer formulation's whole claim: identical ranks under
    different shuffle partitioning (associative bigint sums, truncating
    division), and total rank mass conserved up to the documented
    floor leak (< 10^-6 relative)."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.graph import SCALE, pagerank

    rows = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(40)]
    rows += [(b, a) for a, b in rows]  # symmetrize: no dangling nodes
    edges = spark.createDataFrame(sorted(set(rows)), "src string, dst string")

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted((r.node, r.rank) for r in collect_unpersist(pagerank(edges, 4)))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = sorted((r.node, r.rank) for r in collect_unpersist(pagerank(edges, 4)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b

    total = sum(r for _, r in a)
    assert total <= SCALE  # truncating division never creates mass
    assert total > SCALE * 0.99  # floor leak stays tiny


def test_pagerank_checkpointing_is_invisible_and_bounds_plan(spark):
    """VERDICT r7 #4: lineage checkpointing must change NOTHING about
    the result (bit-identical integer ranks at 12 iterations) while
    keeping the plan bounded — the uncheckpointed optimized plan grows
    with every iteration, the checkpointed one restarts from a
    LogicalRDD scan after each truncation."""
    from os_ex_3_map_reduce_spark.operators.graph import pagerank

    rows = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(40)]
    rows += [(b, a) for a, b in rows]
    edges = spark.createDataFrame(sorted(set(rows)), "src string, dst string")

    plain = pagerank(edges, 12, checkpoint_every=None)
    ckpt = pagerank(edges, 12, checkpoint_every=5)
    plan_plain = plain._jdf.queryExecution().optimizedPlan().toString()
    plan_ckpt = ckpt._jdf.queryExecution().optimizedPlan().toString()
    # the checkpointed plan holds only the post-truncation iterations
    assert len(plan_ckpt) < 0.5 * len(plan_plain), (
        len(plan_ckpt),
        len(plan_plain),
    )
    a = sorted((r.node, r.rank) for r in collect_unpersist(plain))
    b = sorted((r.node, r.rank) for r in collect_unpersist(ckpt))
    assert a == b and len(a) == 40


def test_pagerank_reliable_checkpoint_under_checkpoint_dir(spark, tmp_path):
    """The reliable=True path (HDFS-backed checkpoint(), the variant a
    long-running cluster job with executor churn needs — localCheckpoint
    dies with the executor) must (a) actually write checkpoint data
    under setCheckpointDir, and (b) return bit-identical integer ranks
    to the uncheckpointed run."""
    import os

    from os_ex_3_map_reduce_spark.operators.graph import pagerank

    rows = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(40)]
    rows += [(b, a) for a, b in rows]
    edges = spark.createDataFrame(sorted(set(rows)), "src string, dst string")

    ckpt_dir = str(tmp_path / "ckpt")
    prev_dir = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    try:
        plain = pagerank(edges, 12, checkpoint_every=None)
        reliable = pagerank(edges, 12, checkpoint_every=5, reliable=True)
        a = sorted((r.node, r.rank) for r in collect_unpersist(plain))
        b = sorted((r.node, r.rank) for r in collect_unpersist(reliable))
        assert a == b and len(a) == 40
        # evidence the reliable mechanism fired: checkpoint files on disk
        # (12 iterations / every 5 = 2 mid-run truncations)
        written = [
            os.path.join(d, f) for d, _, fs in os.walk(ckpt_dir) for f in fs
        ]
        assert len(written) > 0, "reliable checkpoint wrote nothing"
    finally:
        # don't leak a tmp_path-backed checkpoint dir into later tests
        # sharing this session (tmp_path is reclaimed by pytest): restore
        # the prior dir, or park it on a session-lifetime location
        import tempfile

        spark.sparkContext.setCheckpointDir(
            prev_dir or tempfile.mkdtemp(prefix="spark-ckpt-session-")
        )


# ---------------------------------------------------------------------------
# Distributed prefix sum (operators/prefix_sum.py)
# ---------------------------------------------------------------------------


def test_prefix_sum_invariant_to_bucket_width(spark):
    """The two-level scan must produce the identical global prefix sum
    for ANY bucket width (the decomposition is an implementation detail)
    and match the single-window reference."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.prefix_sum import prefix_sum

    rows = [(i, (i * 7919) % 113 + 1) for i in range(0, 1000, 3)]
    df = spark.createDataFrame(rows, "k long, w long")

    ref = {
        (r.k, r.cum)
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    for width in (1, 7, 256, 10_000):
        got = {(r.k, r.cum) for r in prefix_sum(df, "k", "w", width).collect()}
        assert got == ref, f"bucket_width={width} diverged"


def test_pps_sample_degenerate_inputs(spark):
    """k above the total weight (and the empty input) must not hit the
    stride-0 integer division ANSI error (ADVICE r7): the stride clamps
    to 1, which selects every positive-weight row — the certainty-unit
    reading of an over-asked PPS sample."""
    import pytest as _pytest

    from os_ex_3_map_reduce_spark.operators.prefix_sum import (
        pps_systematic_sample,
    )

    df = spark.createDataFrame([(1, 2), (2, 1), (3, 3)], "k long, w long")
    got = sorted(
        r.k for r in pps_systematic_sample(df, "k", "w", k=100).collect()
    )
    assert got == [1, 2, 3]  # total weight 6 < k: all certainty units

    empty = spark.createDataFrame([], "k long, w long")
    assert pps_systematic_sample(empty, "k", "w", k=5).collect() == []

    with _pytest.raises(ValueError, match="k must be positive"):
        pps_systematic_sample(df, "k", "w", k=0)


# ---------------------------------------------------------------------------
# Z-order interleave (operators/layout.py)
# ---------------------------------------------------------------------------


def test_zorder_code_is_morton_bijection(spark):
    """On an exact 16x16 grid the 4-bit/dim Z-value must be a bijection
    onto [0, 256) matching the reference Morton interleave (dim 0 most
    significant within each bit pair) — the property the zone-map
    locality argument rests on."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.layout import zorder_value

    grid = spark.range(256).select(
        (F.col("id") / 16).cast("long").alias("x"),
        (F.col("id") % 16).alias("y"),
    )
    with_bounds, z = zorder_value(grid, ["x", "y"], bits=4)
    rows = with_bounds.withColumn("z", z).select("x", "y", "z").collect()

    def morton(x, y):
        out = 0
        for bit in range(4):
            out |= ((x >> bit) & 1) << (2 * bit + 1)
            out |= ((y >> bit) & 1) << (2 * bit)
        return out

    got = {(r.x, r.y): r.z for r in rows}
    assert sorted(got.values()) == list(range(256))  # bijection onto [0,256)
    assert all(z == morton(x, y) for (x, y), z in got.items())


def test_zorder_generalizes_to_three_dims(spark):
    """zorder_value is dimension-generic: on an 8x8x8 grid with 3
    bits/dim the code must again be a bijection onto [0, 512) matching
    the reference interleave (dim 0 most significant per bit group)."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.layout import zorder_value

    grid = spark.range(512).select(
        (F.col("id") / 64).cast("long").alias("x"),
        ((F.col("id") / 8) % 8).cast("long").alias("y"),
        (F.col("id") % 8).alias("z3"),
    )
    with_bounds, z = zorder_value(grid, ["x", "y", "z3"], bits=3)
    rows = with_bounds.withColumn("code", z).select("x", "y", "z3", "code").collect()

    def morton3(x, y, w):
        out = 0
        for bit in range(3):
            out |= ((x >> bit) & 1) << (3 * bit + 2)
            out |= ((y >> bit) & 1) << (3 * bit + 1)
            out |= ((w >> bit) & 1) << (3 * bit)
        return out

    got = {(r.x, r.y, r.z3): r.code for r in rows}
    assert sorted(got.values()) == list(range(512))
    assert all(c == morton3(x, y, w) for (x, y, w), c in got.items())


@pytest.mark.filterwarnings("ignore")
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=10).map(
            lambda chars: " ".join(chars)
        ),
        min_size=2,
        max_size=16,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_filter_complete_on_random_corpora(spark, docs, threshold):
    """Hypothesis version of the completeness theorem: for ANY corpus
    and threshold, the prefix-filter join returns exactly the pairs at
    word-3-gram Jaccard >= t — the pigeonhole argument has no
    shape-dependent escape hatch."""
    from os_ex_3_map_reduce_spark.operators.setsim import prefix_filter_pairs

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in collect_unpersist(prefix_filter_pairs(df, threshold=threshold))
    }

    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh(t) for i, t in enumerate(docs)}
    want = {
        (a, b)
        for a in sets
        for b in sets
        if a < b
        and sets[a] | sets[b]
        and len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= threshold
    }
    assert got == want


# ---------------------------------------------------------------------------
# Single-source shortest path (operators/graph.py sssp)
# ---------------------------------------------------------------------------


def test_sssp_bfs_levels_exact_and_partitioning_invariant(spark):
    """sssp on a known graph (chain + branch + back-edge cycle + an
    unreachable island): exact BFS levels, cycle does not revisit,
    island absent, the loop early-exits on the empty frontier well
    before max_hops, and the result is identical under repartitioning
    and shuffle.partitions variants."""
    from os_ex_3_map_reduce_spark.operators.graph import sssp

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),  # chain: hops 1..3
        ("a", "x"),                            # branch: hop 1
        ("d", "a"),                            # back edge (cycle)
        ("p", "q"),                            # unreachable island
    ]
    df = spark.createDataFrame(edges, "src string, dst string")

    got = {
        (r.node, r.hops)
        for r in collect_unpersist(sssp(df, "a", max_hops=10))
    }
    assert got == {("a", 0), ("b", 1), ("x", 1), ("c", 2), ("d", 3)}

    # partitioning invariance: input layout and shuffle width must not
    # change the settled set
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for reparts, sp in ((3, "7"), (11, "13")):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            alt = {
                (r.node, r.hops)
                for r in collect_unpersist(
                    sssp(df.repartition(reparts), "a", max_hops=10)
                )
            }
            assert alt == got, (reparts, sp)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # hop cap is a bound, not a schedule: capping below the diameter
    # truncates distances rather than erroring
    capped = {
        (r.node, r.hops)
        for r in collect_unpersist(sssp(df, "a", max_hops=2))
    }
    assert capped == {("a", 0), ("b", 1), ("x", 1), ("c", 2)}

    # a source with no outgoing edges settles immediately (first
    # frontier empty -> early exit at hop 1)
    lone = {
        (r.node, r.hops)
        for r in collect_unpersist(sssp(df, "q", max_hops=5))
    }
    assert lone == {("q", 0)}


def test_sssp_weighted_bellman_ford_properties(spark):
    """sssp_weighted on a known weighted graph: min path WEIGHT beats
    fewest hops (the property hop-BFS cannot express), early
    convergence, unreachable nodes absent, w=1 degenerates to exactly
    the hop-BFS result, negative weights rejected, and the result is
    partitioning-invariant."""
    import pytest as _pytest

    from os_ex_3_map_reduce_spark.operators.graph import sssp, sssp_weighted

    # a->b direct costs 5; the 3-edge detour a->c->d->b costs 3
    edges = [
        ("a", "b", 5), ("a", "c", 1), ("c", "d", 1), ("d", "b", 1),
        ("b", "e", 0),              # zero-weight edge is legal
        ("p", "q", 2),              # unreachable island
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")

    got = {
        (r.node, r.dist)
        for r in collect_unpersist(sssp_weighted(df, "a", max_rounds=10))
    }
    assert got == {("a", 0), ("c", 1), ("d", 2), ("b", 3), ("e", 3)}

    # round cap below the cheapest path's edge count: the direct w=5
    # edge wins inside 1 round, the detour needs 3
    capped = {
        (r.node, r.dist)
        for r in collect_unpersist(sssp_weighted(df, "a", max_rounds=1))
    }
    assert capped == {("a", 0), ("b", 5), ("c", 1)}

    # partitioning invariance
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for reparts, sp in ((3, "7"), (11, "13")):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            alt = {
                (r.node, r.dist)
                for r in collect_unpersist(
                    sssp_weighted(df.repartition(reparts), "a", max_rounds=10)
                )
            }
            assert alt == got, (reparts, sp)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # w=1 everywhere degenerates to hop-BFS — cross-check the two
    # iterative operators against each other
    from pyspark.sql import functions as F

    unit = df.select("src", "dst", F.lit(1).alias("w"))
    wd = {
        (r.node, r.dist)
        for r in collect_unpersist(sssp_weighted(unit, "a", max_rounds=10))
    }
    bfs = {
        (r.node, r.hops)
        for r in collect_unpersist(
            sssp(df.select("src", "dst"), "a", max_hops=10)
        )
    }
    assert wd == bfs

    # negative weights are a different contract: reject loudly
    neg = spark.createDataFrame(
        [("a", "b", -1)], "src string, dst string, w long"
    )
    with _pytest.raises(ValueError, match="negative edge weights"):
        sssp_weighted(neg, "a")


def test_label_propagation_deterministic_communities(spark):
    """Deterministic LPA: two symmetrized cliques bridged by nothing
    converge to per-clique min labels; the tie rule (most frequent,
    then smallest) is total so repartitioning and shuffle-width changes
    cannot move a single label; iteration-0 labels are the node ids."""
    from os_ex_3_map_reduce_spark.operators.graph import label_propagation

    def clique(names):
        return [
            (a, b) for a in names for b in names if a != b
        ]

    edges = clique(["a", "b", "c"]) + clique(["x", "y", "z"])
    df = spark.createDataFrame(edges, "src string, dst string")

    got = {
        (r.node, r.label)
        for r in collect_unpersist(label_propagation(df, iterations=5))
    }
    # each clique collapses to its smallest member's label
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"), ("z", "x"),
    }, got

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for reparts, sp in ((3, "7"), (11, "13")):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            alt = {
                (r.node, r.label)
                for r in collect_unpersist(
                    label_propagation(df.repartition(reparts), iterations=5)
                )
            }
            assert alt == got, (reparts, sp)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    # a node with no incoming edges keeps its own label, while feeding
    # its label downstream
    chain = spark.createDataFrame(
        [("r", "s"), ("s", "t")], "src string, dst string"
    )
    got2 = {
        (r.node, r.label)
        for r in collect_unpersist(label_propagation(chain, iterations=3))
    }
    assert got2 == {("r", "r"), ("s", "r"), ("t", "r")}, got2


def test_triangle_counts_exact_and_invariant(spark):
    """Per-node triangle counts: K4 gives every node C(3,2)=3 triangles,
    a square (4-cycle) gives zero, a bipartite graph gives zero, and
    adding one diagonal to the square creates exactly two triangles
    touching the diagonal's endpoints twice... (verified by hand: the
    diagonal splits the square into two triangles; its endpoints sit in
    both, the other corners in one each). Duplicate/reversed/self-loop
    edges must not change anything; result is partitioning-invariant."""
    from os_ex_3_map_reduce_spark.operators.graph import triangle_counts

    def counts(edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        return {
            (r.node, r.n_triangles)
            for r in collect_unpersist(triangle_counts(df))
        }

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert counts(k4) == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}

    square = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert counts(square) == {("a", 0), ("b", 0), ("c", 0), ("d", 0)}

    # diagonal a-c: triangles abc and acd
    diag = square + [("a", "c")]
    assert counts(diag) == {("a", 2), ("c", 2), ("b", 1), ("d", 1)}

    # dirty input: reversed duplicates + self loops are absorbed
    dirty = k4 + [("b", "a"), ("c", "a"), ("a", "a"), ("d", "c")]
    assert counts(dirty) == counts(k4)

    # partitioning invariance
    df = spark.createDataFrame(diag, "src string, dst string")
    base = {
        (r.node, r.n_triangles)
        for r in collect_unpersist(triangle_counts(df))
    }
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        alt = {
            (r.node, r.n_triangles)
            for r in collect_unpersist(triangle_counts(df.repartition(5)))
        }
        assert alt == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_new_graph_operators_on_fixture_graph(spark):
    """The late-r9 graph operators exercised on the real fixture graph
    (symmetrized customer-supplier bipartite, sf0.01: 1,600 nodes,
    ~97k directed edges) — beyond toy examples: a bipartite graph has
    ZERO triangles (odd cycle impossible — structural invariant, not a
    tuned expectation); unit-weight Bellman-Ford must equal hop-BFS on
    the full graph; label propagation must produce a total labeling
    drawn from existing node ids."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.graph import (
        label_propagation,
        sssp,
        sssp_weighted,
        triangle_counts,
    )
    from os_ex_3_map_reduce_spark.plans.graph_queries import _bipartite_edges

    edges = _bipartite_edges(spark, "/root/testdata/sf0.01").persist()
    try:
        n_nodes = (
            edges.select(F.col("src").alias("n"))
            .union(edges.select(F.col("dst").alias("n")))
            .distinct()
            .count()
        )

        tri = collect_unpersist(triangle_counts(edges))
        assert len(tri) == n_nodes
        assert all(r.n_triangles == 0 for r in tri), "bipartite graph grew a triangle"

        unit = edges.withColumn("w", F.lit(1))
        wd = {
            (r.node, r.dist)
            for r in collect_unpersist(sssp_weighted(unit, "c1", max_rounds=6))
        }
        bfs = {
            (r.node, r.hops)
            for r in collect_unpersist(sssp(edges, "c1", max_hops=6))
        }
        assert wd == bfs and len(bfs) > 1

        labels = collect_unpersist(label_propagation(edges, iterations=3))
        assert len(labels) == n_nodes
        node_set = {r.node for r in labels}
        assert all(r.label in node_set for r in labels)
    finally:
        edges.unpersist()


def test_link_prediction_ra_hand_graph_and_hub_cap(spark):
    """RA link prediction on a hand-computable graph. Square a-b-c-d-a:
    the two diagonals (a,c) and (b,d) are the only non-adjacent pairs,
    each with 2 common neighbors of degree 2 -> RA = 1.0 exactly. Then
    a star hub attached to everything: with the hub under the cap the
    scores shift by 1/deg(hub); with the cap below the hub degree the
    square's scores are restored — the hub filter drops middles, never
    candidate pairs' other evidence. Adjacent pairs must never appear."""
    from os_ex_3_map_reduce_spark.operators.graph import link_prediction_ra

    def sym(pairs):
        return spark.createDataFrame(
            [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
            "src string, dst string",
        )

    def run(df, **kw):
        out = link_prediction_ra(df, **kw)
        rows = {
            (r.node_a, r.node_b): (r.n_common, r.ra_pico, r.ra)
            for r in out.collect()
        }
        for held in out._osx3_persists:
            held.unpersist()
        return rows

    square = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    got = run(sym(square))
    assert got == {
        ("a", "c"): (2, 10**12, 1.0),
        ("b", "d"): (2, 10**12, 1.0),
    }

    # hub 'h' connected to all four corners: corners now have degree 3,
    # h degree 4. Diagonals gain the middle h: RA = 2*(1/3) + 1/4.
    hub = square + [("h", n) for n in "abcd"]
    got_hub = run(sym(hub))
    exp_pico = 2 * round(1e12 / 3) + round(1e12 / 4)
    assert got_hub[("a", "c")] == (3, exp_pico, round(exp_pico / 1e12, 4))
    # corner pairs sharing h and one corner... (a,b) adjacent -> absent
    assert ("a", "b") not in got_hub

    # cap below the hub degree: h stops being a middle, diagonals drop
    # back to the two degree-3 corner middles; h itself remains a
    # candidate ENDPOINT (pairs like (a ?) via corners) — the cap
    # filters middles only.
    got_cap = run(sym(hub), max_middle_degree=3)
    assert got_cap[("a", "c")] == (
        2,
        2 * round(1e12 / 3),
        round(2 * round(1e12 / 3) / 1e12, 4),
    )

    # partitioning invariance (integer sums + total tiebreaks)
    assert run(sym(hub)) == run(sym(hub).repartition(7))


def test_personalized_pagerank_localizes_and_is_invariant(spark):
    """PPR sanity on a two-component graph: mass stays in the source's
    component (the other component ranks exactly 0 — integer zero, not
    epsilon), the source holds the largest rank of a symmetric star,
    and results are bit-identical under repartitioning. Also: teleport
    mass is CASE'd to the source only, so total mass stays within the
    truncation leak of SCALE."""
    from os_ex_3_map_reduce_spark.operators.graph import (
        SCALE,
        personalized_pagerank_eager,
    )

    def sym(pairs):
        return spark.createDataFrame(
            [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
            "src string, dst string",
        )

    # component A: star around s; component B: disjoint triangle
    star = [("s", f"l{i}") for i in range(4)]
    tri = [("x", "y"), ("y", "z"), ("z", "x")]
    g = sym(star + tri)

    r = {
        row.node: row.rank
        for row in personalized_pagerank_eager(g, "s", iterations=5).collect()
    }
    assert r["x"] == r["y"] == r["z"] == 0  # unreachable: exact zero
    leaves = [r[f"l{i}"] for i in range(4)]
    assert len(set(leaves)) == 1  # symmetry preserved exactly
    assert r["s"] > leaves[0] > 0  # localized around the source
    total = sum(r.values())
    assert 0 <= SCALE - total < 100  # at most the truncation leak

    r2 = {
        row.node: row.rank
        for row in personalized_pagerank_eager(
            g.repartition(7), "s", iterations=5
        ).collect()
    }
    assert r == r2


def test_hits_ranking_matches_normalized_hits_and_star_shape(spark):
    """HITS contract: (1) on a hand graph, the integer path-count
    ranking equals the classic L2-normalized float HITS ranking
    (normalization is a positive scalar per half-step, so dropping it
    cannot reorder); (2) star shape — the one customer pointing at
    every supplier is the unique top hub; (3) kinds partition cleanly
    (hubs = arc sources, authorities = arc targets)."""
    import numpy as np

    from os_ex_3_map_reduce_spark.operators.graph import hits

    # directed bipartite hand graph: h1 -> {a1,a2,a3}, h2 -> {a1,a2},
    # h3 -> {a1}; a1 is cited by everyone -> top authority; h1 cites
    # the most/best -> top hub.
    arcs = [
        ("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
        ("h2", "a1"), ("h2", "a2"),
        ("h3", "a1"),
    ]
    e = spark.createDataFrame(arcs, "src string, dst string")
    got = collect_unpersist(hits(e, iterations=3, checkpoint_every=None))
    hubs = sorted(
        ((r.node, r.score) for r in got if r.kind == "hub"),
        key=lambda t: (-t[1], t[0]),
    )
    auths = sorted(
        ((r.node, r.score) for r in got if r.kind == "authority"),
        key=lambda t: (-t[1], t[0]),
    )
    assert [n for n, _ in hubs] == ["h1", "h2", "h3"]
    assert [n for n, _ in auths] == ["a1", "a2", "a3"]

    # float reference: classic normalized HITS, same iteration count
    hs = ["h1", "h2", "h3"]
    as_ = ["a1", "a2", "a3"]
    A = np.zeros((3, 3))
    for s, d in arcs:
        A[hs.index(s), as_.index(d)] = 1.0
    h = np.ones(3)
    for _ in range(3):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    assert list(np.argsort(-h)) == [0, 1, 2]
    assert list(np.argsort(-a)) == [0, 1, 2]

    # star: one hub pointing at 5 authorities, plus a 1-arc bystander
    star = [("center", f"s{i}") for i in range(5)] + [("other", "s0")]
    got2 = collect_unpersist(
        hits(
            spark.createDataFrame(star, "src string, dst string"),
            iterations=2,
            checkpoint_every=None,
        )
    )
    hub_scores = {r.node: r.score for r in got2 if r.kind == "hub"}
    assert max(hub_scores, key=lambda n: (hub_scores[n], n)) == "center"
    assert {r.node for r in got2 if r.kind == "authority"} == {
        f"s{i}" for i in range(5)
    }


def test_mis_independent_maximal_and_invariant(spark):
    """mis_luby (the twelfth graph pattern): the returned set is
    INDEPENDENT (no edge joins two members), MAXIMAL (every non-member
    has a member neighbor — no node can be added), deterministic under
    partitioning, and on a known path graph equals the greedy
    by-priority reference."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.graph import mis_luby_eager
    from os_ex_3_map_reduce_spark.operators.sketch import portable_hash60

    # path 0-1-2-...-19 plus a star 100-(101..110): both shapes in one
    edges = [(f"n{i}", f"n{i+1}") for i in range(19)] + [
        ("hub", f"leaf{j}") for j in range(10)
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    outs = []
    for nparts in (1, 4):
        mis = mis_luby_eager(e.repartition(nparts))
        outs.append(sorted(r.node for r in mis.collect()))
    assert outs[0] == outs[1]
    members = set(outs[0])
    # independence
    for a, b in edges:
        assert not (a in members and b in members), (a, b)
    # maximality
    nodes = {x for ab in edges for x in ab}
    adj: dict[str, set] = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for n in nodes - members:
        assert adj[n] & members, f"{n} could be added — not maximal"
    # star: either the hub alone or all leaves are in the MIS
    assert ("hub" in members) != ("leaf0" in members)
    if "leaf0" in members:
        assert all(f"leaf{j}" in members for j in range(10))
    # greedy-by-fixed-priority reference on the same graph
    prio = {
        r.node: r.h
        for r in spark.createDataFrame(
            [(n,) for n in nodes], "node string"
        ).withColumn("h", portable_hash60("node")).collect()
    }
    ref: set = set()
    blocked: set = set()
    for n in sorted(nodes, key=lambda x: prio[x]):
        if n not in blocked:
            ref.add(n)
            blocked |= adj[n] | {n}
    assert members == ref


def test_matching_is_matching_maximal_and_invariant(spark):
    """maximal_matching (the fourteenth graph pattern): the returned
    pairs form a MATCHING (no node in two pairs), are MAXIMAL (every
    remaining edge has a matched endpoint — no edge can be added),
    are deterministic under partitioning, and equal the greedy
    by-edge-priority reference on the same graph."""
    from pyspark.sql import functions as F

    from os_ex_3_map_reduce_spark.operators.graph import (
        maximal_matching_eager,
    )
    from os_ex_3_map_reduce_spark.operators.sketch import portable_hash60

    # path + star + a triangle (odd cycle: one node must stay single)
    edges = (
        [(f"n{i}", f"n{i+1}") for i in range(19)]
        + [("hub", f"leaf{j}") for j in range(10)]
        + [("t0", "t1"), ("t1", "t2"), ("t2", "t0")]
    )
    e = spark.createDataFrame(edges, "src string, dst string")
    outs = []
    for nparts in (1, 4):
        m = maximal_matching_eager(e.repartition(nparts))
        outs.append(sorted((r.a, r.b) for r in m.collect()))
    assert outs[0] == outs[1]
    pairs = outs[0]
    # matching: each node in at most one pair
    flat = [x for p in pairs for x in p]
    assert len(flat) == len(set(flat))
    matched = set(flat)
    # the star contributes exactly one pair; the triangle exactly one
    assert sum(1 for a, b in pairs if "hub" in (a, b)) == 1
    assert sum(1 for a, b in pairs if a.startswith("t")) == 1
    # maximality: every edge touches a matched node
    for a, b in edges:
        assert a in matched or b in matched, (a, b)
    # greedy-by-fixed-edge-priority reference
    eh = {
        (r.lo, r.hi): r.h
        for r in spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges],
            "lo string, hi string",
        )
        .withColumn(
            "h", portable_hash60(F.concat("lo", F.lit("|"), "hi"))
        )
        .collect()
    }
    ref: list = []
    used: set = set()
    for (lo, hi), _h in sorted(eh.items(), key=lambda kv: (kv[1], kv[0])):
        if lo not in used and hi not in used:
            ref.append((lo, hi))
            used |= {lo, hi}
    assert pairs == sorted(ref)


def test_weighted_matching_equals_sequential_greedy(spark):
    """maximal_matching(weight=...): round-parallel heaviest-first
    matching equals sequential greedy by (weight desc, lo, hi) — the
    classic 1/2-approximation — and stays a valid matching."""
    from os_ex_3_map_reduce_spark.operators.graph import (
        maximal_matching_eager,
    )

    # weights engineered so greedy must skip the middle edge:
    # a-b (0.9), b-c (0.95), c-d (0.8), plus a triangle with ties
    edges = [
        ("a", "b", 0.9),
        ("b", "c", 0.95),
        ("c", "d", 0.8),
        ("x", "y", 0.5),
        ("y", "z", 0.5),
        ("z", "x", 0.5),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, w double")
    m = maximal_matching_eager(e, weight="w")
    got = sorted((r.a, r.b) for r in m.collect())
    # sequential greedy reference
    used: set = set()
    ref = []
    for lo, hi, _w in sorted(
        ((min(a, b), max(a, b), w) for a, b, w in edges),
        key=lambda t: (-t[2], t[0], t[1]),
    ):
        if lo not in used and hi not in used:
            ref.append((lo, hi))
            used |= {lo, hi}
    assert got == sorted(ref)
    # b-c won over a-b; a-b's loss forced a and d to stay single
    assert ("b", "c") in got and ("c", "d") not in got
    flat = [x for p in got for x in p]
    assert len(flat) == len(set(flat))


def test_skyline_partitioning_invariant_and_hand_checkable(spark):
    """The two-phase skyline must be exact regardless of partitioning
    (the local-skyline phase can only DROP dominated rows — by
    transitivity it can never lose a global-frontier row), and must
    handle ties: duplicate points do not dominate each other, so both
    copies survive; a strictly-worse point never survives."""
    from os_ex_3_map_reduce_spark.operators.skyline import skyline

    rows = [
        # (id, a_max, b_max, num_min, den)
        (1, 10, 1, 5, 1),   # frontier (best a)
        (2, 1, 10, 5, 1),   # frontier (best b)
        (3, 5, 5, 1, 1),    # frontier (best ratio)
        (4, 5, 5, 1, 1),    # duplicate of 3 -> both survive
        (5, 4, 4, 2, 1),    # dominated by 3 on all criteria
        (6, 10, 1, 6, 1),   # dominated by 1 (equal a/b, worse ratio)
        (7, 6, 4, 2, 2),    # frontier: a beats 3's but b is worse, and
                            # the 2/2 ratio TIES 3's 1/1 cross-multiplied
    ]
    expected = {1, 2, 3, 4, 7}
    df = spark.createDataFrame(
        rows, "id long, a long, b long, num long, den long"
    )
    for parts in (1, 4, 13):
        got = {
            r.id
            for r in skyline(
                df.repartition(parts),
                larger_better=["a", "b"],
                ratio_smaller_better=[("num", "den")],
            ).collect()
        }
        assert got == expected, (parts, got)


def test_louvain_sweep_resolves_two_cliques(spark):
    """One synchronous local-move sweep on two triangles joined by a
    bridge, seeded with deliberately-wrong labels: the triangle
    members keep their majority label and the two misfits (3 seeded
    B inside the A-triangle, 6 seeded A inside the B-triangle) move —
    hand-computed integer gains, invariant under partitioning."""
    from os_ex_3_map_reduce_spark.operators.graph import louvain_move_sweep

    und = spark.createDataFrame(
        [
            (1, 2), (1, 3), (2, 3),                          # A-triangle
            (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),  # B-4-clique
            (3, 4),                                          # bridge
        ],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "B"), (6, "A"),
         (7, "B")],
        "node long, comm string",
    )
    # hand-computed strict gains (2m=20, tot_A=7, tot_B=13): the two
    # misfits move (3: 19 > -10; 6: 21 > -12), everyone else stays.
    expected = {1: "A", 2: "A", 3: "A", 4: "B", 5: "B", 6: "B", 7: "B"}
    for parts in (1, 5):
        got = {
            r.u: r.new_comm
            for r in louvain_move_sweep(
                und.repartition(parts), labels
            ).collect()
        }
        assert got == expected, (parts, got)


@given(
    blocks=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_pava_equals_minimax_identity(blocks):
    """PAVA must equal the Robertson-Wright-Dykstra minimax formula
    (the SQL-oracle form) on arbitrary integer blocks, and the fit
    must be monotone non-decreasing."""
    from os_ex_3_map_reduce_spark.operators.isotonic import (
        minimax_reference,
        pava,
    )

    got = pava(blocks)
    want = minimax_reference(blocks)
    assert got == want
    assert all(a <= b for a, b in zip(got, got[1:]))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # score (few values => ties)
            st.booleans(),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_auc_rank_identity_equals_brute_force(rows):
    """q_auc_ranks' doubled-midrank algebra must equal the brute-force
    AUC definition (P[score_pos > score_neg] + 0.5 P[tie]) on any
    score/label multiset with both classes present."""
    if not any(l for _, l in rows) or all(l for _, l in rows):
        return
    pos = [s for s, l in rows if l]
    neg = [s for s, l in rows if not l]
    brute_num = sum(
        2 * (p > q) + (p == q) for p in pos for q in neg
    )  # 2*AUC*np*nn
    # the query's formula: group by value, cumulative counts, 2r sums
    from collections import Counter

    cnt = Counter(s for s, _ in rows)
    npos = Counter(s for s, l in rows if l)
    cum = 0
    s2 = 0
    for v in sorted(cnt):
        cum += cnt[v]
        s2 += npos[v] * (2 * cum - cnt[v] + 1)
    np_, nn_ = len(pos), len(neg)
    formula_num = s2 - np_ * (np_ + 1)
    assert formula_num == brute_num
    assert 0 <= formula_num <= 2 * np_ * nn_


@given(
    a=st.integers(min_value=0, max_value=10**7),
    b=st.integers(min_value=0, max_value=10**7),
)
@settings(max_examples=300, deadline=None)
def test_melody_shingles_never_alias_across_docs(a, b):
    """The audio-fingerprint melody hash must be shift-collision-free
    in practice: two distinct docs must not share a 3-tone shingle
    (the multiplicative-linear-hash failure this md5 version
    replaced — unrelated docs aligned EXACTLY). Probabilistic bound:
    97^3 ~ 1e6 shingle space, 13 shingles/doc; hypothesis hammers
    random pairs."""
    from os_ex_3_map_reduce_spark.operators.multimodal import (
        melody_tone_bin,
    )

    if a == b:
        return
    sh_a = {
        tuple(melody_tone_bin(a, s + k) for k in range(3))
        for s in range(13)
    }
    sh_b = {
        tuple(melody_tone_bin(b, s + k) for k in range(3))
        for s in range(13)
    }
    assert not (sh_a & sh_b), (a, b)

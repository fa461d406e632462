"""Cross-engine ordering/string contract pins (round-14 probe series).

tools/divergence_probe.py (VERDICT r13 #5) swept the remaining
multibyte-string and ordering surfaces after the three retired classes
(libm rounding r12, whitespace tokenization r13, unicode case mapping
+ byte-level levenshtein r13). Probe results on this container:

MATCH:   length, substring (pos/neg), md5, strpos/instr, lpad with a
         multibyte pad char, array_join/array_to_string (NULL elements
         and multibyte separators), binary ORDER BY on mixed-script
         strings, DESC NULL placement, RANGE frames over doubles,
         GROUP BY NaN / signed zero (both engines group NaN with NaN
         and normalize -0.0 = 0.0; the probe's tuple-compare flags it
         only because nan != nan in Python).

DIVERGE (the two new latent classes, pinned here):

1. **ASC NULL placement** — Spark default = NULLS FIRST, DuckDB
   default = NULLS LAST. Invisible to the driver's order-insensitive
   hash EXCEPT where order feeds values: rank()/row_number()/ntile,
   running ROWS frames, LIMIT/top-k. CONTRACT: every
   order-sensitive computation's sort key must be provably
   non-null (built from inner joins / aggregates / coalesce) — all 36
   current window ORDER BYs qualify — and any future nullable key
   must spell NULLS FIRST|LAST on BOTH sides. (DESC defaults agree:
   NULLS LAST both.)

2. **reverse() on non-ASCII** — Spark reverses codepoints, DuckDB
   reverses grapheme clusters ('e'+combining-acute flips order in
   Spark, stays attached in DuckDB). CONTRACT: never use string
   reverse on text columns in an oracle-checked query (currently
   unused; this test keeps the reason on record).

These tests pin the ENGINE behaviors, so if a pyspark/duckdb upgrade
ever converges (or further diverges) the defaults, the contract gets
re-evaluated instead of silently rotting.
"""

from __future__ import annotations

# session-scoped ``spark`` and ``duck`` fixtures come from conftest.py

NUMS_SPARK = (
    "VALUES (1, CAST(1.5 AS DOUBLE)), (2, CAST('NaN' AS DOUBLE)), "
    "(3, CAST(NULL AS DOUBLE)), (4, CAST(0.5 AS DOUBLE)), "
    "(5, CAST('Infinity' AS DOUBLE)) t(k, v)"
)
NUMS_DUCK = (
    "VALUES (1, 1.5), (2, 'NaN'::DOUBLE), (3, NULL::DOUBLE), "
    "(4, 0.5), (5, 'Infinity'::DOUBLE)"
)


def test_asc_null_placement_defaults_diverge(spark, duck):
    """The hazard itself: bare ASC puts NULL first in Spark, last in
    DuckDB. If this ever starts matching, the contract note in
    plans/catalog.py can be relaxed."""
    s = [r[0] for r in spark.sql(f"SELECT k FROM {NUMS_SPARK} ORDER BY v ASC").collect()]
    d = [r[0] for r in duck.execute(f"SELECT k FROM ({NUMS_DUCK}) t(k, v) ORDER BY v ASC").fetchall()]
    assert s[0] == 3, "Spark ASC default is NULLS FIRST"
    assert d[-1] == 3, "DuckDB ASC default is NULLS LAST"
    assert s != d


def test_explicit_nulls_clause_converges(spark, duck):
    """The contract form: spelling NULLS LAST (or FIRST) on both sides
    makes ASC identical — including NaN > Infinity, which both engines
    agree on."""
    for clause in ("NULLS LAST", "NULLS FIRST"):
        s = [r[0] for r in spark.sql(
            f"SELECT k FROM {NUMS_SPARK} ORDER BY v ASC {clause}").collect()]
        d = [r[0] for r in duck.execute(
            f"SELECT k FROM ({NUMS_DUCK}) t(k, v) ORDER BY v ASC {clause}").fetchall()]
        assert s == d, clause
    # NaN sorts above +Infinity in both engines (k=2 after k=5)
    assert s.index(2) > s.index(5)


def test_desc_defaults_agree(spark, duck):
    s = [r[0] for r in spark.sql(f"SELECT k FROM {NUMS_SPARK} ORDER BY v DESC").collect()]
    d = [r[0] for r in duck.execute(f"SELECT k FROM ({NUMS_DUCK}) t(k, v) ORDER BY v DESC").fetchall()]
    assert s == d == [2, 5, 1, 4, 3]  # NaN, inf, 1.5, 0.5, NULL


def test_rank_over_nonnull_key_converges(spark, duck):
    """The discipline every catalog window follows: a non-null sort key
    (coalesce'd here) makes rank() identical across engines."""
    s = spark.sql(
        f"SELECT k, rank() OVER (ORDER BY coalesce(v, -1e308) DESC, k) r "
        f"FROM {NUMS_SPARK} ORDER BY k"
    ).collect()
    d = duck.execute(
        f"SELECT k, rank() OVER (ORDER BY coalesce(v, -1e308) DESC, k) r "
        f"FROM ({NUMS_DUCK}) t(k, v) ORDER BY k"
    ).fetchall()
    assert [tuple(r) for r in s] == [tuple(r) for r in d]


def test_nan_groups_and_signed_zero_agree(spark, duck):
    """GROUP BY semantics both engines share: NaN == NaN for grouping,
    -0.0 and 0.0 collapse. (The driver canonicalizer additionally maps
    NaN -> 'NULL' in hashes, so NaN-keyed outputs stay hash-safe.)"""
    q_s = (
        "SELECT count(*) AS c FROM (SELECT CAST('NaN' AS DOUBLE) v UNION ALL "
        "SELECT CAST('NaN' AS DOUBLE) UNION ALL SELECT CAST(-0.0 AS DOUBLE) "
        "UNION ALL SELECT CAST(0.0 AS DOUBLE)) GROUP BY v ORDER BY c"
    )
    q_d = (
        "SELECT count(*) AS c FROM (SELECT 'NaN'::DOUBLE v UNION ALL "
        "SELECT 'NaN'::DOUBLE UNION ALL SELECT -0.0::DOUBLE "
        "UNION ALL SELECT 0.0::DOUBLE) GROUP BY v ORDER BY c"
    )
    assert [r[0] for r in spark.sql(q_s).collect()] == [2, 2]
    assert [r[0] for r in duck.execute(q_d).fetchall()] == [2, 2]


def test_reverse_diverges_on_combining_marks(spark, duck):
    """Why reverse() is banned from oracle-checked text paths: Spark
    flips codepoints (detaching combining marks), DuckDB flips grapheme
    clusters (keeping them attached)."""
    s = spark.sql("SELECT reverse('café')").collect()[0][0]
    d = duck.execute("SELECT reverse('café')").fetchone()[0]
    assert s == "́efac"  # combining acute detached, leads the string
    assert d == "éfac"  # grapheme kept intact
    assert s != d


def test_multibyte_string_surfaces_match(spark, duck):
    """The surfaces that PROBED CLEAN and are used by oracles today —
    pinned so an engine upgrade that breaks one fails here first:
    length / substring / md5 / instr-strpos / array_join with NULLs."""
    corpus = ["plain", "café", "café", "\U0001f600 emoji",
              "你好", "İstanbul"]
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i int, s string")
    sdf.createOrReplaceTempView("probe_m")
    duck.execute("CREATE OR REPLACE TABLE probe_m AS SELECT * FROM (VALUES "
                 + ",".join(f"({i}, ?)" for i in range(len(corpus)))
                 + ") t(i, s)", corpus)
    pairs = [
        ("SELECT i, length(s) FROM probe_m ORDER BY i",) * 2,
        ("SELECT i, substring(s, 2, 3) FROM probe_m ORDER BY i",) * 2,
        ("SELECT i, md5(s) FROM probe_m ORDER BY i",) * 2,
        ("SELECT i, instr(s, 'é') FROM probe_m ORDER BY i",
         "SELECT i, strpos(s, 'é') FROM probe_m ORDER BY i"),
        ("SELECT array_join(array('a', CAST(NULL AS STRING), 'b'), ',')",
         "SELECT array_to_string(['a', NULL, 'b'], ',')"),
    ]
    for q_s, q_d in pairs:
        s = [tuple(r) for r in spark.sql(q_s).collect()]
        d = [tuple(r) for r in duck.execute(q_d).fetchall()]
        assert s == d, q_s


def test_concat_null_semantics_diverge(spark, duck):
    """Contract rule #6: Spark concat() propagates NULL, DuckDB concat()
    skips it — only `||` agrees (NULL-propagating in both)."""
    s = spark.sql("SELECT concat('a', CAST(NULL AS STRING), 'b')").collect()[0][0]
    d = duck.execute("SELECT concat('a', NULL::VARCHAR, 'b')").fetchone()[0]
    assert s is None and d == "ab"
    s2 = spark.sql("SELECT 'a' || CAST(NULL AS STRING)").collect()[0][0]
    d2 = duck.execute("SELECT 'a' || NULL::VARCHAR").fetchone()[0]
    assert s2 is None and d2 is None


def test_double_to_string_rendering_diverges(spark, duck):
    """Contract rule #7: scientific notation renders differently —
    doubles must leave queries as doubles, never strings."""
    s = spark.sql("SELECT CAST(CAST(1e21 AS DOUBLE) AS STRING)").collect()[0][0]
    d = duck.execute("SELECT CAST(1e21::DOUBLE AS VARCHAR)").fetchone()[0]
    assert s == "1.0E21" and d == "1e+21"
    # bigint -> string IS safe (q_profile_stats relies on it)
    s2 = spark.sql("SELECT CAST(-9223372036854775808 AS STRING)").collect()[0][0]
    d2 = duck.execute("SELECT CAST(-9223372036854775808 AS VARCHAR)").fetchone()[0]
    assert s2 == d2


def test_float_string_int_cast_diverges(spark, duck):
    """Contract rule #8: TRY_CAST('3.7' AS INT) is NULL under Spark
    ANSI but ROUNDS to 4 in DuckDB; integral strings agree."""
    s = spark.sql("SELECT TRY_CAST('3.7' AS INT), CAST('3' AS INT)").collect()[0]
    d = duck.execute("SELECT TRY_CAST('3.7' AS INT), CAST('3' AS INT)").fetchone()
    assert (s[0], d[0]) == (None, 4)
    assert s[1] == d[1] == 3


def test_scalar_surfaces_match(spark, duck):
    """Second negative-probe batch, pinned: greatest/least NULL
    skipping, array_sort NULL placement (last in both), multichar
    trim, split_part incl. negative index, truncating negative mod,
    sequence/generate_series."""
    checks = [
        ("SELECT greatest(1, CAST(NULL AS INT), 3), least(1, CAST(NULL AS INT), 3)",
         "SELECT greatest(1, NULL::INT, 3), least(1, NULL::INT, 3)"),
        ("SELECT array_sort(array(3, CAST(NULL AS INT), 1))",
         "SELECT list_sort([3, NULL::INT, 1])"),
        ("SELECT trim(BOTH 'xy' FROM 'xyhixy')", "SELECT trim('xyhixy', 'xy')"),
        ("SELECT split_part('a,b,c', ',', 2), split_part('a,b,c', ',', -1)",) * 2,
        ("SELECT -7 % 3, 7 % -3",) * 2,
        ("SELECT sequence(1, 5)", "SELECT generate_series(1, 5)"),
    ]
    for q_s, q_d in checks:
        s = [tuple(r) for r in spark.sql(q_s).collect()]
        d = [list(t) for t in duck.execute(q_d).fetchall()]
        assert [list(r) for r in s] == [
            [list(c) if isinstance(c, (list, tuple)) else c for c in row]
            for row in d
        ], q_s


def test_datetime_surfaces(spark, duck):
    """Probe batch 3 (datetime): the one value-level class is
    day-of-week numbering — Spark dayofweek is 1=Sunday, DuckDB's is
    0=Sunday (q_date_parts pins the -1 offset). Two render-level
    classes fall under rule #1 (no raw date/timestamp stringification):
    Spark date_trunc returns TIMESTAMP where DuckDB returns DATE, and
    DATE + INTERVAL promotes to DATE in Spark but TIMESTAMP in DuckDB.
    The rest of the surface agrees: ISO week, quarter, day-of-year,
    epoch, strptime/to_timestamp, month-end interval VALUES,
    last_day, datediff, months_between on whole months, 30-min
    window/time_bucket alignment (same epoch origin), sub-second
    timestamp rendering."""
    s_dow = spark.sql("SELECT dayofweek(DATE'2026-08-16')").collect()[0][0]
    d_dow = duck.execute("SELECT dayofweek(DATE '2026-08-16')").fetchone()[0]
    assert s_dow == 1 and d_dow == 0  # both mean Sunday
    assert s_dow - 1 == d_dow  # the q_date_parts pin

    pairs = [
        ("SELECT weekofyear(DATE'2026-01-01'), weekofyear(DATE'2021-01-01')",
         "SELECT weekofyear(DATE '2026-01-01'), weekofyear(DATE '2021-01-01')"),
        ("SELECT quarter(DATE'2026-08-16'), dayofyear(DATE'2026-08-16')",) * 2,
        ("SELECT CAST(unix_timestamp(TIMESTAMP'2026-08-16 12:00:00') AS BIGINT)",
         "SELECT CAST(extract(EPOCH FROM TIMESTAMP '2026-08-16 12:00:00') AS BIGINT)"),
        ("SELECT CAST(window(TIMESTAMP'2026-08-16 12:47:00', '30 minutes').start AS STRING)",
         "SELECT CAST(time_bucket(INTERVAL '30 minutes', "
         "TIMESTAMP '2026-08-16 12:47:00') AS VARCHAR)"),
        ("SELECT CAST(last_day(DATE'2026-02-05') AS STRING)",
         "SELECT CAST(last_day(DATE '2026-02-05') AS VARCHAR)"),
        ("SELECT datediff(DATE'2026-08-16', DATE'2026-01-31')",
         "SELECT datediff('day', DATE '2026-01-31', DATE '2026-08-16')"),
    ]
    for q_s, q_d in pairs:
        s = [tuple(r) for r in spark.sql(q_s).collect()]
        d = [tuple(r) for r in duck.execute(q_d).fetchall()]
        assert s == d, q_s
    # the two render-level divergences rule #1 exists for:
    s_tr = spark.sql(
        "SELECT CAST(date_trunc('WEEK', TIMESTAMP'2026-08-16 12:00:00') AS STRING)"
    ).collect()[0][0]
    d_tr = duck.execute(
        "SELECT CAST(date_trunc('week', TIMESTAMP '2026-08-16 12:00:00') AS VARCHAR)"
    ).fetchone()[0]
    assert s_tr == "2026-08-10 00:00:00" and d_tr == "2026-08-10"

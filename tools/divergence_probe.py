#!/usr/bin/env python
"""Latent cross-engine divergence probe (VERDICT r13 #5).

Six divergence classes have been found and contractually retired (libm
rounding r12; whitespace tokenization r13; unicode case mapping r13;
levenshtein byte-vs-codepoint r13; ASC NULL placement + string reverse
r14; session_window gap boundary r15). This tool probes the
REMAINING multibyte/ordering surfaces the oracles touch, on a case-bomb
corpus, and prints MATCH/DIVERGE per surface so any new class gets a
shared contract + property test before it reaches a driver row.

Surfaces probed (chosen from actual oracle usage — grep the plans):
  length, substring, md5, array_to_string/array_join (incl. NULL
  elements and multibyte separators), strpos, lpad, reverse,
  ORDER BY NULL/NaN placement (bare and inside window frames),
  string comparison/collation order for mixed-script strings.

Run from the repo root:  python tools/divergence_probe.py
Exit 0 always — this is evidence collection; read the DIVERGE lines.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

# The case-bomb corpus: every known-dangerous shape in one table.
CORPUS = [
    "plain ascii",
    "café",                    # precomposed é (2-byte UTF-8)
    "café",                   # e + combining acute (grapheme != codepoint)
    "\U0001f600 emoji",             # supplementary plane (4-byte, surrogate pair)
    "你好世界",     # CJK
    "İstanbul",                # Turkish dotted capital I
    "σισύφιος",  # greek w/ final sigma
    "ä́b",               # stacked combining marks
    "mixed é\U0001f600你 tail",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("divergence-probe")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(CORPUS)], "i int, s string")
    sdf.createOrReplaceTempView("probe")
    con.execute("CREATE TABLE probe AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, ?)" for i in range(len(CORPUS)))
                + ") t(i, s)", CORPUS)

    diverged: list[str] = []

    def compare(tag: str, spark_sql: str, duck_sql: str | None = None) -> None:
        duck_sql = duck_sql or spark_sql
        s_rows = [tuple(r) for r in spark.sql(spark_sql).collect()]
        d_rows = [tuple(r) for r in con.execute(duck_sql).fetchall()]
        ok = s_rows == d_rows
        print(f"{'MATCH  ' if ok else 'DIVERGE'} {tag}")
        if not ok:
            diverged.append(tag)
            for a, b in zip(s_rows, d_rows):
                if a != b:
                    print(f"    spark={a!r}")
                    print(f"    duck ={b!r}")

    # 1. length over multibyte / combining / supplementary
    compare("length(s)", "SELECT i, length(s) FROM probe ORDER BY i")
    # 2. substring indexing
    compare("substring(s,2,3)", "SELECT i, substring(s, 2, 3) FROM probe ORDER BY i")
    compare("substring(s,-3)",
            "SELECT i, substring(s, -3) FROM probe ORDER BY i",
            "SELECT i, substring(s, -3) FROM probe ORDER BY i")
    # 3. md5 of UTF-8 bytes
    compare("md5(s)", "SELECT i, md5(s) FROM probe ORDER BY i")
    # 4. strpos / position (codepoint vs byte index?)
    compare("strpos/instr",
            "SELECT i, instr(s, 'é') FROM probe ORDER BY i",
            "SELECT i, strpos(s, 'é') FROM probe ORDER BY i")
    # 5. lpad with multibyte pad char
    compare("lpad(s,12,'·')",
            "SELECT i, lpad(s, 12, '·') FROM probe ORDER BY i")
    # 6. reverse (codepoints vs graphemes)
    compare("reverse(s)", "SELECT i, reverse(s) FROM probe ORDER BY i")
    # 7. array_to_string: NULL elements + multibyte separator
    compare("array_join null elems",
            "SELECT array_join(array('a', CAST(NULL AS STRING), 'b'), ',')",
            "SELECT array_to_string(['a', NULL, 'b'], ',')")
    compare("array_join multibyte sep",
            "SELECT array_join(array('x','y'), '·')",
            "SELECT array_to_string(['x','y'], '·')")
    # 8. string ORDER: mixed-script collation (binary vs ICU?)
    compare("ORDER BY s",
            "SELECT s FROM probe ORDER BY s",
            "SELECT s FROM probe ORDER BY s")
    # 9. NULL / NaN ordering: bare sort, asc and desc
    spark.sql(
        "SELECT * FROM VALUES (1, CAST(1.5 AS DOUBLE)), (2, CAST('NaN' AS DOUBLE)),"
        " (3, CAST(NULL AS DOUBLE)), (4, CAST(0.5 AS DOUBLE)),"
        " (5, CAST('Infinity' AS DOUBLE)) t(k, v)"
    ).createOrReplaceTempView("nums")
    con.execute("CREATE TABLE nums AS SELECT * FROM (VALUES (1, 1.5), (2, 'NaN'::DOUBLE),"
                " (3, NULL::DOUBLE), (4, 0.5), (5, 'Infinity'::DOUBLE)) t(k, v)")
    compare("ORDER BY v ASC (NULL/NaN placement)",
            "SELECT k FROM nums ORDER BY v ASC")
    compare("ORDER BY v DESC (NULL/NaN placement)",
            "SELECT k FROM nums ORDER BY v DESC")
    # 10. NaN/NULL inside a window ROWS frame ordered by v
    compare("window rank over ORDER BY v",
            "SELECT k, rank() OVER (ORDER BY v) FROM nums ORDER BY k")
    compare("window sum ROWS UNBOUNDED PRECEDING over ORDER BY v",
            "SELECT k, CAST(sum(CASE WHEN isnan(v) THEN 0 ELSE coalesce(v,0) END)"
            " OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS DOUBLE)"
            " FROM nums ORDER BY k",
            "SELECT k, CAST(sum(CASE WHEN isnan(v) THEN 0 ELSE coalesce(v,0) END)"
            " OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS DOUBLE)"
            " FROM nums ORDER BY k")
    # 11. RANGE frame over double with NaN present
    compare("window RANGE BETWEEN 1 PRECEDING AND CURRENT ROW",
            "SELECT k, count(*) OVER (ORDER BY v RANGE BETWEEN 1 PRECEDING"
            " AND CURRENT ROW) FROM nums ORDER BY k")
    # 12. = and GROUP BY on NaN (NaN==NaN?) and on -0.0 vs 0.0
    compare("GROUP BY NaN & signed zero",
            "SELECT v, count(*) AS c FROM (SELECT CAST('NaN' AS DOUBLE) v UNION ALL"
            " SELECT CAST('NaN' AS DOUBLE) UNION ALL SELECT CAST(-0.0 AS DOUBLE)"
            " UNION ALL SELECT CAST(0.0 AS DOUBLE)) GROUP BY v ORDER BY c, v",
            "SELECT v, count(*) AS c FROM (SELECT 'NaN'::DOUBLE v UNION ALL"
            " SELECT 'NaN'::DOUBLE UNION ALL SELECT -0.0::DOUBLE"
            " UNION ALL SELECT 0.0::DOUBLE) GROUP BY v ORDER BY c, v")

    # --- batch 2 (round 14): NULL semantics, casts, scalar functions ----
    compare("concat with NULL arg",
            "SELECT concat('a', CAST(NULL AS STRING), 'b')",
            "SELECT concat('a', NULL::VARCHAR, 'b')")
    compare("|| with NULL",
            "SELECT 'a' || CAST(NULL AS STRING)",
            "SELECT 'a' || NULL::VARCHAR")
    compare("greatest/least with NULL",
            "SELECT greatest(1, CAST(NULL AS INT), 3), least(1, CAST(NULL AS INT), 3)",
            "SELECT greatest(1, NULL::INT, 3), least(1, NULL::INT, 3)")
    compare("cast double->string (sci notation)",
            "SELECT CAST(CAST(1e21 AS DOUBLE) AS STRING),"
            " CAST(CAST(1.5e-7 AS DOUBLE) AS STRING)",
            "SELECT CAST(1e21::DOUBLE AS VARCHAR), CAST(1.5e-7::DOUBLE AS VARCHAR)")
    compare("cast bigint->string",
            "SELECT CAST(-9223372036854775808 AS STRING)",
            "SELECT CAST(-9223372036854775808 AS VARCHAR)")
    compare("array_sort with NULLs",
            "SELECT array_sort(array(3, CAST(NULL AS INT), 1))",
            "SELECT list_sort([3, NULL::INT, 1])")
    compare("try_cast float-string -> int",
            "SELECT TRY_CAST('3.7' AS INT)",
            "SELECT TRY_CAST('3.7' AS INT)")
    compare("trim multichar",
            "SELECT trim(BOTH 'xy' FROM 'xyhixy')",
            "SELECT trim('xyhixy', 'xy')")
    compare("split_part incl negative",
            "SELECT split_part('a,b,c', ',', 2), split_part('a,b,c', ',', -1)")
    compare("mod negative operands", "SELECT -7 % 3, 7 % -3")
    compare("sequence/generate_series",
            "SELECT sequence(1, 5)", "SELECT generate_series(1, 5)")
    compare("date_format/strftime",
            "SELECT date_format(DATE'1996-03-13', 'yyyy-MM-dd')",
            "SELECT strftime(DATE '1996-03-13', '%Y-%m-%d')")
    compare("round decimal half-away",
            "SELECT round(CAST(2.5 AS DECIMAL(3,1))), round(CAST(-2.5 AS DECIMAL(3,1)))",
            "SELECT CAST(round(2.5::DECIMAL(3,1)) AS DECIMAL),"
            " CAST(round(-2.5::DECIMAL(3,1)) AS DECIMAL)")

    # --- batch 3 (round 14): datetime surfaces --------------------------
    compare("dayofweek numbering (KNOWN: Spark Sun=1, DuckDB Sun=0)",
            "SELECT dayofweek(DATE'2026-08-16')",
            "SELECT dayofweek(DATE '2026-08-16')")
    compare("weekofyear ISO",
            "SELECT weekofyear(DATE'2026-01-01'), weekofyear(DATE'2021-01-01')",
            "SELECT weekofyear(DATE '2026-01-01'), weekofyear(DATE '2021-01-01')")
    compare("quarter/dayofyear",
            "SELECT quarter(DATE'2026-08-16'), dayofyear(DATE'2026-08-16')")
    compare("epoch extraction",
            "SELECT CAST(unix_timestamp(TIMESTAMP'2026-08-16 12:00:00') AS BIGINT)",
            "SELECT CAST(extract(EPOCH FROM TIMESTAMP '2026-08-16 12:00:00')"
            " AS BIGINT)")
    compare("to_timestamp/strptime parse",
            "SELECT CAST(to_timestamp('2026-08-16 12:34:56',"
            " 'yyyy-MM-dd HH:mm:ss') AS STRING)",
            "SELECT CAST(strptime('2026-08-16 12:34:56',"
            " '%Y-%m-%d %H:%M:%S') AS VARCHAR)")
    compare("date_trunc week render (KNOWN: TIMESTAMP vs DATE)",
            "SELECT CAST(date_trunc('WEEK', TIMESTAMP'2026-08-16 12:00:00')"
            " AS STRING)",
            "SELECT CAST(date_trunc('week', TIMESTAMP '2026-08-16 12:00:00')"
            " AS VARCHAR)")
    compare("month-end interval VALUE (render diverges: DATE vs TIMESTAMP)",
            "SELECT CAST(DATE'2026-01-31' + INTERVAL 1 MONTH AS STRING)",
            "SELECT CAST(CAST(DATE '2026-01-31' + INTERVAL 1 MONTH AS DATE)"
            " AS VARCHAR)")
    compare("datediff days",
            "SELECT datediff(DATE'2026-08-16', DATE'2026-01-31')",
            "SELECT datediff('day', DATE '2026-01-31', DATE '2026-08-16')")
    compare("last_day",
            "SELECT CAST(last_day(DATE'2026-02-05') AS STRING)",
            "SELECT CAST(last_day(DATE '2026-02-05') AS VARCHAR)")
    compare("window/time_bucket 30min alignment",
            "SELECT CAST(window(TIMESTAMP'2026-08-16 12:47:00',"
            " '30 minutes').start AS STRING)",
            "SELECT CAST(time_bucket(INTERVAL '30 minutes',"
            " TIMESTAMP '2026-08-16 12:47:00') AS VARCHAR)")
    compare("sub-second timestamp render",
            "SELECT CAST(TIMESTAMP'2026-08-16 12:00:00.123' AS STRING)",
            "SELECT CAST(TIMESTAMP '2026-08-16 12:00:00.123' AS VARCHAR)")

    # --- batch 4 (round 15): session gap boundary -----------------------
    # FOUND + RETIRED r15: Spark session_window MERGES events exactly
    # gap apart (inclusive window overlap), so the matching island rule
    # is 'new session when delta > gap' — NOT >=, which the session
    # oracles used latently for 14 rounds (microsecond fixtures never
    # land on the boundary). This probe replays the literal micro-case:
    # user 1 exactly-at-gap (must merge: 1 session), user 2 inside the
    # gap (1 session), user 3 past the gap (2 sessions).
    compare("session_window gap boundary (KNOWN: merge AT gap; islands rule >)",
            "SELECT user_id, count(*) AS n FROM VALUES"
            " (1, TIMESTAMP'2024-01-01 00:00:00'),"
            " (1, TIMESTAMP'2024-01-01 00:10:00'),"
            " (2, TIMESTAMP'2024-01-01 00:00:00'),"
            " (2, TIMESTAMP'2024-01-01 00:09:59.999999'),"
            " (3, TIMESTAMP'2024-01-01 00:00:00'),"
            " (3, TIMESTAMP'2024-01-01 00:10:00.000001')"
            " t(user_id, ts)"
            " GROUP BY session_window(ts, '10 minutes'), user_id"
            " ORDER BY user_id, n",
            "WITH e(user_id, ts) AS (VALUES"
            " (1, TIMESTAMP '2024-01-01 00:00:00'),"
            " (1, TIMESTAMP '2024-01-01 00:10:00'),"
            " (2, TIMESTAMP '2024-01-01 00:00:00'),"
            " (2, TIMESTAMP '2024-01-01 00:09:59.999999'),"
            " (3, TIMESTAMP '2024-01-01 00:00:00'),"
            " (3, TIMESTAMP '2024-01-01 00:10:00.000001')),"
            " flagged AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL"
            " OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE THEN 1 ELSE 0 END"
            " AS new_s FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),"
            " islands AS (SELECT user_id, SUM(new_s) OVER"
            " (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)"
            " AS sid FROM flagged)"
            " SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM islands"
            " GROUP BY user_id, sid ORDER BY user_id, n")

    print()
    print("DIVERGED SURFACES:" if diverged else "ALL SURFACES MATCH",
          ", ".join(diverged) if diverged else "")
    spark.stop()


if __name__ == "__main__":
    main()

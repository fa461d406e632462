#!/usr/bin/env python3
"""Margin audit for oracles that keep libm (ln/exp) in the contract.

The r11 driver run proved libm is not portable across engines: the
driver's DuckDB build rounded a 6th decimal differently from the local
one and `q_entropy_quality` went hash-red on values that match locally.
That query now uses a shared literal table (no libm anywhere).  The
remaining oracles that still call ln/exp inside a `round(..., p)` are
only safe if every rounded value sits FAR from a rounding boundary —
far enough that a many-ulp libm discrepancy cannot flip the rounding.

This tool measures that margin on the real data, per query, per scale:

  for each pre-round value v rounded at p decimals:
      w = |v| * 10^p                 (grid units)
      d = |frac(w) - 0.5|            (distance to the round boundary)
      ulp_w = 2.23e-16 * |v| * 10^p  (1 libm ulp, in grid units)
      safety = d / ulp_w             (how many ulps of error it takes
                                      to flip this value's rounding)

`min(safety)` over all values is the query's margin.  A floor of 1e3
(flip requires a 1000-ulp libm error) is far beyond any real libm
discrepancy (measured spread between common libms is < 4 ulps for
ln/exp on normal arguments).  tests/test_oracle_libm.py asserts the
floor at sf0.01 (the driver's gate scale); run this tool manually for
the sf0.001 / sf0.1 sweeps:

    python3 tools/libm_margin_audit.py [sf_dir ...]

`sqrt` is exempt everywhere: IEEE-754 requires correctly-rounded sqrt,
so every conforming implementation returns bit-identical results.
"""
from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Distance-to-boundary helper applied to a column expr `v` rounded at
# `p` decimals: returns per-row (d_grid, ulp_grid).
_MARGIN = """
    SELECT
        MIN(abs(abs(v) * 1e{p} - floor(abs(v) * 1e{p}) - 0.5)
            / (2.23e-16 * GREATEST(abs(v), 1e-300) * 1e{p})) AS min_safety,
        MIN(abs(abs(v) * 1e{p} - floor(abs(v) * 1e{p}) - 0.5)) AS min_d,
        COUNT(*) AS n
    FROM ({src})
"""

# One probe per libm-bearing oracle family.  Each src yields a single
# column `v` = every pre-round libm value that query's oracle rounds.
PROBES: dict[str, tuple[str, int]] = {
    # BM25 term score round(idf * tf_sat, 6) — shared kernel of
    # q_bm25_topk / _indexed / _append / q_hybrid_rrf / q_prf_expand /
    # q_stream_bm25_ingest / q_stream_standing_query.  Probed over ALL
    # corpus terms (superset of every query's term subset).
    "bm25_kernel": ("""
        WITH docs2 AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs, SUM(len(t)) AS total_tokens
            FROM docs2
        ),
        w AS (SELECT doc_id, unnest(t) AS term FROM docs2),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w
               GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w
               GROUP BY term),
        dl AS (SELECT doc_id, len(t) AS dl FROM docs2)
        SELECT ln(((s.n_docs - df.df + 0.5) / (df.df + 0.5)) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl * s.n_docs * 1.0
                                                / s.total_tokens))) AS v
        FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats s
    """, 6),
    # q_lm_perplexity: round(ln(cb) - ln(cu), 6) over every bigram.
    "q_lm_perplexity": ("""
        WITH toks AS (
            SELECT list_filter(string_split(text, ' '), w -> w <> '') AS t
            FROM documents
        ),
        bg AS (
            SELECT unnest(list_transform(
                generate_series(1, len(t) - 1),
                i -> concat_ws(' ', t[i], t[i+1]))) AS b
            FROM toks WHERE len(t) >= 2
        ),
        bc AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b),
        pc AS (SELECT split_part(b, ' ', 1) AS w1, COUNT(*) AS cu
               FROM bg GROUP BY 1)
        SELECT ln(bc.cb) - ln(pc.cu) AS v
        FROM bc JOIN pc ON split_part(bc.b, ' ', 1) = pc.w1
    """, 6),
    # q_pmi_collocations: round(ln(c_ab*nu^2/(nb*ua*ub)), 6) over every
    # candidate bigram (c_ab >= 10 filter widened to >= 1: superset).
    "q_pmi_collocations": ("""
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        bg AS (
            SELECT p.a, p.b, COUNT(*) AS c_ab
            FROM (SELECT unnest(list_transform(
                      generate_series(1, len(t) - 1),
                      i -> {'a': t[i], 'b': t[i + 1]})) AS p
                  FROM toks)
            GROUP BY p.a, p.b
        ),
        ug AS (SELECT w, COUNT(*) AS c FROM (
                   SELECT unnest(t) AS w FROM toks) GROUP BY w),
        n AS (SELECT (SELECT SUM(c) FROM ug) AS nu,
                     (SELECT SUM(c_ab) FROM bg) AS nb)
        SELECT ln(CAST(bg.c_ab * n.nu * n.nu AS DOUBLE)
                  / CAST(n.nb * ua.c * ub.c AS DOUBLE)) AS v
        FROM bg JOIN ug ua ON bg.a = ua.w JOIN ug ub ON bg.b = ub.w
        CROSS JOIN n
    """, 6),
    # q_dsir_select: round(ln(tt+1) - ln(s+1), 6) per hash bucket, plus
    # the konst term round(ln(src_n+64) - ln(tgt_n+64), 6).
    "q_dsir_select": ("""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), w -> w <> '') AS t
            FROM documents
        ),
        uni AS (SELECT doc_id, lang, unnest(t) AS f FROM toks),
        bi AS (
            SELECT doc_id, lang, unnest(list_transform(
                generate_series(1, len(t) - 1),
                i -> concat_ws(' ', t[i], t[i+1]))) AS f
            FROM toks WHERE len(t) >= 2
        ),
        feats AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(f), 1, 4))::INT % 64 AS b
            FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
        ),
        sc AS (SELECT b, COUNT(*) AS s FROM feats GROUP BY b),
        tc AS (SELECT b, COUNT(*) AS tt FROM feats WHERE lang = 'en'
               GROUP BY b),
        tot AS (SELECT (SELECT COUNT(*) FROM feats) AS src_n,
                       (SELECT COUNT(*) FROM feats WHERE lang = 'en')
                           AS tgt_n)
        SELECT ln(COALESCE(tc.tt, 0) + 1) - ln(sc.s + 1) AS v
        FROM sc LEFT JOIN tc ON sc.b = tc.b
        UNION ALL
        SELECT ln(src_n + 64) - ln(tgt_n + 64) AS v FROM tot
    """, 6),
    # q_kaplan_meier lnterm: round(ln((n_risk-d)/n_risk), 9).
    "q_kaplan_meier_lnterm": ("""
        WITH dd AS (
            SELECT datediff('day', o_orderdate, l_shipdate) AS t
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE datediff('day', o_orderdate, l_shipdate) >= 0
        ),
        n AS (SELECT COUNT(*) AS total FROM dd),
        ev AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS d
               FROM dd WHERE t <= 365 GROUP BY t),
        km1 AS (
            SELECT t, d,
                   n.total - COALESCE(SUM(d) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_risk
            FROM ev CROSS JOIN n
        )
        SELECT ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS v
        FROM km1 WHERE n_risk > d
    """, 9),
    # q_kaplan_meier survival: round(exp(cumln), 6) where cumln is the
    # exact DECIMAL(18,9) running sum of the rounded lnterms.
    "q_kaplan_meier_survival": ("""
        WITH dd AS (
            SELECT datediff('day', o_orderdate, l_shipdate) AS t
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE datediff('day', o_orderdate, l_shipdate) >= 0
        ),
        n AS (SELECT COUNT(*) AS total FROM dd),
        ev AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS d
               FROM dd WHERE t <= 365 GROUP BY t),
        km1 AS (
            SELECT t, d,
                   n.total - COALESCE(SUM(d) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_risk
            FROM ev CROSS JOIN n
        ),
        km2 AS (
            SELECT t,
                   CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE)), 9)
                        AS DECIMAL(18,9)) AS lnterm
            FROM km1 WHERE n_risk > d
        ),
        km AS (
            SELECT t, SUM(lnterm) OVER (ORDER BY t) AS cumln FROM km2
        )
        SELECT exp(CAST(cumln AS DOUBLE)) AS v FROM km
    """, 6),
}


def audit(sf_dir: str) -> dict[str, tuple[float, float, int]]:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    out = {}
    for name, (src, p) in PROBES.items():
        row = con.execute(_MARGIN.format(p=p, src=src)).fetchone()
        out[name] = (row[0], row[1], row[2])
    return out


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    worst: dict[str, float] = {}
    for d in dirs:
        print(f"== {d}")
        for name, (safety, dist, n) in audit(d).items():
            print(f"  {name:28s} n={n:8d}  min_d={dist:.3e} grid  "
                  f"min_safety={safety:,.0f} ulps")
            worst[name] = min(worst.get(name, float("inf")), safety)
    print("\n== worst-case safety (ulps of libm error needed to flip)")
    for name, s in sorted(worst.items(), key=lambda kv: kv[1]):
        verdict = "OK" if s >= 1e3 else "KNIFE-EDGE — convert to table"
        print(f"  {name:28s} {s:,.0f}  {verdict}")


if __name__ == "__main__":
    main()

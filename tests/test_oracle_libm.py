"""Guard against the r11 failure class: non-portable libm in oracles.

CORRECTNESS_r11 proved that a libm call inside an oracle's rounding is
an engine-portability hazard: `q_entropy_quality` matched its oracle on
every local DuckDB run yet went hash-red under the driver's DuckDB
build.  The fix (plans/llm.py) removed libm from that contract with a
shared literal ln-table; THIS module keeps the class from reappearing:

1. every oracle that still calls ln/log/exp is on an explicit
   allowlist, each entry margin-proven by tools/libm_margin_audit.py;
2. the measured margins hold at the driver's gate scale (sf0.01) with
   a 1e6-ulp floor — far beyond any real libm spread, and above the
   >12k-ulp error the r11 driver evidently exhibited;
3. the entropy literal table covers the corpus domain with margin and
   matches an independent recomputation.

`sqrt` is exempt: IEEE-754 mandates correctly-rounded sqrt, so every
conforming implementation is bit-identical.  `pow`/`exp` are NOT
correctly rounded and count as libm here.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

import __spark_entry__ as entry_mod
from os_ex_3_map_reduce_spark.plans.llm import (
    _ENTROPY_LN_MAX,
    _entropy_ln_tables,
)
from tools.libm_margin_audit import PROBES, audit

from .conftest import SF_CORRECT

_LIBM = re.compile(r"\b(ln|log|log2|log10|log1p|exp|expm1|pow|power)\s*\(",
                   re.IGNORECASE)

# Every query whose oracle may call ln/log/exp.  Each entry is covered
# by a probe in tools/libm_margin_audit.py (the bm25 kernel probe
# covers the seven queries sharing that scoring expression); margins
# re-measured below every run.
LIBM_ALLOWLIST = {
    # shared BM25 kernel — probe "bm25_kernel"
    "q_bm25_topk",
    "q_bm25_indexed",
    "q_bm25_append",
    "q_hybrid_rrf",
    "q_prf_expand",
    "q_stream_bm25_ingest",
    "q_stream_standing_query",
    # dedicated probes
    "q_lm_perplexity",
    "q_pmi_collocations",
    "q_dsir_select",
    "q_kaplan_meier",
}

#: minimum ulps-of-libm-error needed to flip any rounding, at sf0.01.
#: Measured min across probes is ~2.2M (tools/libm_margin_audit.py);
#: the floor leaves 2x headroom while still rejecting any knife-edge.
SAFETY_FLOOR_ULPS = 1.0e6


def test_no_unlisted_libm_in_oracles():
    oracles = entry_mod.oracle_sql()
    offenders = {}
    for name, sql in oracles.items():
        funcs = sorted({m.group(1).lower() for m in _LIBM.finditer(sql)})
        if funcs and name not in LIBM_ALLOWLIST:
            offenders[name] = funcs
    assert not offenders, (
        f"oracles with unlisted libm calls (add a margin probe to "
        f"tools/libm_margin_audit.py and allowlist, or convert to a "
        f"literal table): {offenders}"
    )


def test_entropy_oracle_is_libm_free():
    sql = entry_mod.oracle_sql()["q_entropy_quality"]
    assert not _LIBM.search(sql), "q_entropy_quality regressed to libm"


def test_allowlist_has_no_stale_entries():
    oracles = entry_mod.oracle_sql()
    stale = {
        n for n in LIBM_ALLOWLIST
        if n not in oracles or not _LIBM.search(oracles[n])
    }
    assert not stale, f"allowlisted but libm-free (remove): {stale}"


def test_margin_floor_at_gate_scale():
    results = audit(SF_CORRECT)
    assert set(results) == set(PROBES)
    weak = {
        name: safety
        for name, (safety, _d, n) in results.items()
        if not (n > 0 and safety >= SAFETY_FLOOR_ULPS)
    }
    assert not weak, (
        f"libm margins below {SAFETY_FLOOR_ULPS:,.0f} ulps at sf0.01 — "
        f"convert these oracles to literal tables: {weak}"
    )


def test_entropy_table_matches_recomputation():
    ln_mu, kln_mu = _entropy_ln_tables()
    assert len(ln_mu) == len(kln_mu) == _ENTROPY_LN_MAX
    for k in (1, 2, 3, 7, 64, 100, 999, _ENTROPY_LN_MAX):
        assert ln_mu[k - 1] == round(math.log(k) * 1e6)
        assert kln_mu[k - 1] == round(k * math.log(k) * 1e6)
    # the embedded SQL VALUES table carries the same integers
    sql = entry_mod.oracle_sql()["q_entropy_quality"]
    assert f"(2,{ln_mu[1]},{kln_mu[1]})" in sql
    assert (
        f"({_ENTROPY_LN_MAX},{ln_mu[-1]},{kln_mu[-1]})" in sql
    )


@pytest.mark.parametrize("sf_dir", [SF_CORRECT, "/root/testdata/sf0.1"])
def test_entropy_table_covers_corpus(sf_dir):
    con = duckdb.connect()
    (max_n,) = con.execute(
        f"""
        WITH w AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS w
            FROM read_parquet('{sf_dir}/documents.parquet')
        )
        SELECT MAX(n) FROM (
            SELECT COUNT(*) AS n FROM w GROUP BY doc_id
        )
        """
    ).fetchone()
    con.close()
    # 4x headroom below the table bound so fixture growth trips this
    # test long before element_at would run out of domain
    assert max_n * 4 <= _ENTROPY_LN_MAX, (
        f"max per-doc tokens {max_n} too close to table bound "
        f"{_ENTROPY_LN_MAX} — raise _ENTROPY_LN_MAX"
    )

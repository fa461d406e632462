"""Adversarial-whitespace tokenizer-contract parity (r12 verdict #2).

The r12 driver run proved that pairing a Spark ``\\s+`` regex splitter
with literal-space ``string_split`` oracles is a latent divergence
class: the two agree only while the corpus contains no tabs/newlines/
unicode whitespace, and one driver-side fixture regeneration with a
stray tab would have turned ~20 token-count queries red at once. The
fix is a single shared contract (``functions/text.py``: split on ONE
literal space, drop empties, no regex in either engine) swept across
the catalog. This module is the property test that keeps it fixed:

1. the Spark ``tokens()`` column and the DuckDB ``TOKENS_SQL`` fragment
   produce identical token arrays on adversarial strings, and
2. EVERY catalog query whose oracle tokenizes text still hash-matches
   its oracle on a corpus deliberately polluted with tabs, CRs,
   newlines, double/leading/trailing spaces, and NBSP.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from os_ex_3_map_reduce_spark.functions.text import tokens, tokens_sql
from os_ex_3_map_reduce_spark.plans import catalog
from os_ex_3_map_reduce_spark.sources.tables import TABLES

from .conftest import SF_SMOKE, assert_matches_oracle

ADVERSARIAL = [
    "",
    " ",
    "   ",
    "plain single space text",
    " leading space",
    "trailing space ",
    "double  space",
    "tab\tseparated words",
    "newline\nseparated words",
    "cr\rseparated words",
    "crlf\r\nseparated words",
    "nbsp separated words",
    "vertical\x0btab and form\x0cfeed",
    "mixed \t \n soup of  every\rkind ",
    "unicode em space and thin space",
]


def _adversarial_text(doc_id: int, text: str) -> str:
    """Deterministic whitespace + case pollution, varied by doc_id."""
    words = text.split(" ")
    mode = doc_id % 8
    if mode == 0:
        return " " + text
    if mode == 1:
        return text + " "
    if mode == 2:
        return "  ".join(words[:3]) + " " + " ".join(words[3:])
    if mode == 3:
        return "\t".join(words[:2]) + " " + " ".join(words[2:])
    if mode == 4:
        return text.replace(" ", "\n", 1)
    if mode == 5:
        return text + "\r"
    return text.replace(" ", " ", 1)


@pytest.fixture(scope="module")
def adversarial_sf_dir(tmp_path_factory) -> str:
    """A full fixture directory whose documents.text is whitespace-
    polluted; every other table is the sf0.001 original."""
    d = tmp_path_factory.mktemp("sf_adversarial")
    for t in TABLES:
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")
    tbl = pq.read_table(d / "documents.parquet")
    pdf = tbl.to_pandas()
    pdf["text"] = [
        _adversarial_text(int(i), t) for i, t in zip(pdf.doc_id, pdf.text)
    ]
    pdf["n_chars"] = pdf.text.str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=tbl.schema, preserve_index=False),
        d / "documents.parquet",
    )
    return str(d)


@pytest.fixture(scope="module")
def adversarial_duck(adversarial_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{adversarial_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_tokens_matches_sql_on_adversarial_strings(spark):
    """Property: Spark tokens() == DuckDB TOKENS_SQL, string by string,
    including empty arrays and tokens that CONTAIN non-space
    whitespace (the contract deliberately does not split on those)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "i int, text string"
    )
    got = {
        r["i"]: list(r["t"])
        for r in df.select("i", tokens("text").alias("t")).collect()
    }
    con = duckdb.connect()
    want = {
        i: con.execute(
            f"SELECT {tokens_sql('?')}".replace("?", "$1::VARCHAR"),
            [s],
        ).fetchone()[0]
        for i, s in enumerate(ADVERSARIAL)
    }
    con.close()
    assert got == want


def _tokenizing_query_names() -> list[str]:
    catalog._load_all()
    return sorted(
        q.name
        for q in catalog._REGISTRY.values()
        if q.oracle is not None and "string_split" in q.oracle
    )


@pytest.mark.parametrize("name", _tokenizing_query_names())
def test_tokenizing_query_survives_adversarial_corpus(
    name, spark, adversarial_sf_dir, adversarial_duck
):
    q = catalog.get_query(name)
    df = q.fn(spark, adversarial_sf_dir)
    assert_matches_oracle(
        df, adversarial_duck, q.oracle, name=f"{name}[adversarial]"
    )

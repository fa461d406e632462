"""Exact set-similarity join via prefix filtering (PPJoin-family).

The MinHash-LSH path (``operators/dedup.py``) finds near-dup pairs
probabilistically: tunable recall, signature cost, band machinery. This
module is the EXACT counterpart — the other standard scale path for
similarity joins, used when a pipeline owner needs "no pair above the
threshold is ever missed" as a theorem rather than a 1-4e-8 bound:

**Prefix-filter principle.** Impose one global total order on tokens —
rarest first (ascending document frequency, token string as tiebreak).
For Jaccard threshold ``t``, a document with ``n`` distinct tokens only
needs to emit its first ``n - ceil(t*n) + 1`` tokens ("prefix") as join
keys: if ``J(x, y) >= t`` then ``|x ∩ y| >= ceil(t*|x|)``, and by
pigeonhole the globally-smallest shared token cannot sit past that
prefix in either document — so every qualifying pair collides on at
least one prefix token. Everything below threshold that sneaks in is
removed by the exact verification.

Why this scales to 100 TB:

- The join fans out on the *rarest* tokens only: prefix emission drops
  the stop-word-shaped hot keys that make a naive token self-join
  explode, and bucket size is bounded by each token's document
  frequency — the skew is engineered out, not salted after the fact.
- Candidate verification is one ``array_intersect`` over the two
  pre-sorted token arrays — JVM built-ins, no Python.
- Stages are plain groupBy/join shuffles: document-frequency count,
  per-doc sort, prefix self-join, verify. All AQE-coalescible.

**Measured cost of exactness** (sf0.1, 5k docs, local[32], warm,
identical shingles/threshold/result set): prefix-filter build
3.2-4.2 s vs MinHash-LSH build 2.1-2.2 s — the exact join pays
~1.5-2x for replacing a 1-4e-8 recall bound with a theorem. Pick per
pipeline: MinHash when a measured-recall bound suffices, prefix
filtering when a missed duplicate is a correctness bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

def _shingles():
    """3-token word shingles, identical to the MinHash path and to the
    oracle's _SHINGLE_SQL (DuckDB t[i] is 1-based, as is element_at).
    Built lazily — a module-level Column literal would require an
    active SparkContext at import time and crash any import-before-
    session caller."""
    return F.expr(
        "array_distinct(transform(sequence(1, size(__t) - 2), "
        "i -> concat_ws(' ', element_at(__t, i), element_at(__t, i + 1), "
        "element_at(__t, i + 2))))"
    )


def shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) rows: distinct word-3-gram shingles per document."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t"))
        .where(F.size("__t") >= 3)
        .select("doc_id", F.explode(_shingles()).alias("s"))
    )


def prefix_filter_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with shingle-Jaccard >= ``threshold`` — exactly.

    Returns (doc_a, doc_b, inter, union_, jaccard), doc_a < doc_b.
    """
    sh = shingle_sets(docs, id_col, text_col)
    # global token order: ascending document frequency, then token —
    # a total order shared by every document (the correctness pivot).
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    ranked = sh.join(freq, "s")
    per_doc = ranked.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("df_s", "s"))).alias("toks")
    )
    per_doc = per_doc.select(
        "doc_id",
        F.col("toks.s").alias("toks"),  # ordered token array (strings)
        F.size("toks").alias("n"),
    )
    # three consumers below (prefix emission + both verify joins):
    # persist, or the whole shingle->freq->sort pipeline runs three
    # times (measured 3x wall at sf0.1). Slim relation: one row per doc.
    per_doc = per_doc.persist()
    # prefix length n - ceil(t*n) + 1; emit only those tokens as keys
    plen = (F.col("n") - F.ceil(F.col("n") * F.lit(float(threshold))) + 1).cast("int")
    prefixes = per_doc.select(
        "doc_id", F.explode(F.slice("toks", 1, plen)).alias("s")
    )
    cand = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), "s")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verify on the full sorted token arrays (JVM array_intersect)
    docs_a = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    docs_b = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    out = (
        cand.join(docs_a, "doc_a")
        .join(docs_b, "doc_b")
        .withColumn("inter", inter)
        .withColumn("union_", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .withColumn(
            "jaccard", F.col("inter") * F.lit(1.0) / F.col("union_")
        )
        .where(F.col("jaccard") >= F.lit(float(threshold)))
        .select("doc_a", "doc_b", "inter", "union_", "jaccard")
    )
    # Internal persisted relations, exposed under the same attribute
    # name graph.py uses so callers of any non-eager operator share one
    # unpersist idiom (tests use collect_unpersist; ADVICE r7).
    out._osx3_persists = [per_doc]  # type: ignore[attr-defined]
    return out


def prefix_filter_pairs_eager(docs: DataFrame, **kwargs) -> DataFrame:
    """:func:`prefix_filter_pairs`, materialized: persists the (tiny)
    verified-pairs relation, forces it, and unpersists the per-doc
    token relation so repeated invocations don't accumulate cached
    blocks (same lifecycle as ``minhash_lsh_pairs_eager``)."""
    pairs = prefix_filter_pairs(docs, **kwargs)
    held = pairs._osx3_persists  # type: ignore[attr-defined]
    out = pairs.persist()
    out.count()
    for df in held:
        df.unpersist()
    return out


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All DIRECTED pairs with shingle CONTAINMENT >= ``threshold`` —
    exactly. Containment C(a -> b) = |A ∩ B| / |A| is the ASYMMETRIC
    near-dup relation Jaccard cannot express: a short document quoted
    wholesale inside a long one scores near-zero Jaccard (the union is
    dominated by B) but containment ~1 — the quote/boilerplate/
    subset-inclusion case a training-data dedup pipeline needs next to
    symmetric near-dup.

    Probe-prefix / filtered-index construction (the asymmetric member
    of the PPJoin family): only the PROBE side (A) prefix-filters —
    if ``|A ∩ B| >= ceil(t*|A|)`` then by pigeonhole A's
    ``n - ceil(t*n) + 1`` rarest tokens must hit the intersection
    (else the intersection fits inside A's ceil(t*n)-1 suffix), and
    the index side carries EVERY token of B, so the pair collides.
    The index's hot tokens never explode the join: the distinct probe-
    prefix token set (rare tokens by construction) semi-prunes the
    index BEFORE the equi-join, so hot posting lists ship nowhere
    unless some probe actually needs them. Verification is one JVM
    ``array_intersect`` over pre-sorted arrays, like the symmetric
    path. Returns (doc_a, doc_b, inter, n_a, containment) meaning
    doc_a's shingle set is >= t contained in doc_b's; both directions
    of a pair can appear, each verified independently."""
    sh = shingle_sets(docs, id_col, text_col)
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    per_doc = (
        sh.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("df_s", "s"))).alias(
                "toks"
            )
        )
        .select(
            "doc_id",
            F.col("toks.s").alias("toks"),
            F.size("toks").alias("n"),
        )
        .persist()
    )
    plen = (
        F.col("n") - F.ceil(F.col("n") * F.lit(float(threshold))) + 1
    ).cast("int")
    probes = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.explode(F.slice("toks", 1, plen)).alias("s"),
    )
    probe_tokens = probes.select("s").distinct()
    index = per_doc.select(
        F.col("doc_id").alias("doc_b"), F.explode("toks").alias("s")
    ).join(probe_tokens, "s")
    cand = (
        probes.join(index, "s")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    docs_a = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    docs_b = per_doc.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(docs_a, "doc_a")
        .join(docs_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            "n_a",
            (inter * F.lit(1.0) / F.col("n_a")).alias("containment"),
        )
        .where(F.col("containment") >= F.lit(float(threshold)))
    )

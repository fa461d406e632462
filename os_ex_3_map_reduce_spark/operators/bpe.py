"""Distributed BPE merge training (SURVEY.md E4 — the tokenizer-
TRAINING half of the token-accounting surface; q_token_stats_bpe
measures a fixed tokenizer, this learns one).

Word-level byte-pair encoding in the public Sennrich et al. 2016
construction: pre-tokenize the corpus into words, reduce to the
DISTINCT-word frequency relation, then repeatedly (1) count adjacent
symbol pairs weighted by word frequency, (2) take the globally most
frequent pair (total tiebreak: count desc, then pair lexicographic),
(3) merge its non-overlapping occurrences left-to-right in every word.

Scale shape: the only full-corpus pass is the word histogram (one
map-side-combined groupBy — the wordcount flagship). Every merge round
runs on the distinct-word relation, orders of magnitude smaller than
the corpus and the thing that actually fits BPE training at 100 TB:
pair counting is a JVM-side bigram explode + map-side-combined sum,
the argmax is a TakeOrdered(1) (no global sort), and only ONE row per
round reaches the driver. The merge application is the one Python
step — an Arrow-batched kernel over the word relation (sequential
left-to-right pair fusion has no built-in expression), re-persisted
per round with the previous round freed, the graph-loop discipline.

Determinism: frequencies are exact integers and the tiebreak is total,
so the whole merge trajectory is partitioning-invariant — what lets
the catalog query pin its expected merge table per scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigram_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency, every adjacent
    position counted (the reference get_stats semantics) — JVM-side:
    zip each symbol array with its own tail, explode, sum."""
    pairs = words.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p")["0"].alias("left"), F.col("p")["1"].alias("right")
    ).agg(F.sum("freq").alias("pair_count"))


def bpe_train(
    docs_df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    merge table (step, left, right, pair_count, merged) — step is
    1-based in merge order. Stops early if no adjacent pair remains
    (every word fused to a single symbol). Pre-tokenizes with the
    engine's BPE-ish word splitter (non-alphanumeric boundaries), no
    end-of-word marker — merges never cross word boundaries by
    construction."""
    from ..functions.text import bpe_ish_tokens

    spark = docs_df.sparkSession
    # The merge loop runs ~13 tiny stages per round over the compact
    # distinct-word relation; at the session's full shuffle width the
    # rounds are pure task-scheduling overhead (measured 17.7 s -> see
    # registration A/B), so the loop region is clamped and the word
    # relation narrowed — every action below executes INSIDE the clamp
    # (the conf is execution-time; the eager-materialization lesson
    # from triangle_counts' dead-knob fix, ADVICE r9).
    before = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(before), shuffle_partitions)),
        )
    try:
        words = (
            docs_df.select(F.explode(bpe_ish_tokens(text_col)).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("freq"))
            .select(
                "freq",
                F.expr("filter(split(w, ''), x -> x <> '')").alias("syms"),
            )
            .persist()
        )

        merges: list[tuple[int, str, str, int, str]] = []
        current = words
        # ONE action per merge round (r15 optimization): the argmax
        # collect below is what materializes `current` into its own
        # cache, so the former eager `nxt.count()` barrier was a
        # second, redundant job per round (plus one for words) whose
        # only purpose was to let the parent unpersist immediately.
        # Deferring the parent's unpersist until after the argmax
        # keeps the same determinism (the child is fully cached before
        # its parent's blocks drop) at the same high-water memory (two
        # generations live at once — exactly what the count-then-
        # unpersist sequence also held). Interleaved A/B at sf0.1:
        # q_bpe_merges 46 -> 27 jobs, 4.99 -> 4.39 s median (0.88x);
        # q_bpe_encode 50 -> 31 jobs, 6.28 -> 5.28 s (0.84x); merge
        # trajectories byte-identical.
        pending: DataFrame | None = None
        for step in range(1, num_merges + 1):
            best = (
                _bigram_counts(current)
                .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            # `current` is materialized now; its parent can release
            if pending is not None:
                pending.unpersist()
                pending = None
            if not best:
                break
            left, right, cnt = (
                best[0]["left"],
                best[0]["right"],
                best[0]["pair_count"],
            )
            merges.append((step, left, right, int(cnt), left + right))

            def kernel(
                batches: Iterator[pd.DataFrame], a=left, b=right
            ) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = []
                    for syms in pdf["syms"]:
                        syms = list(syms)
                        fused, i = [], 0
                        while i < len(syms):
                            if (
                                i + 1 < len(syms)
                                and syms[i] == a
                                and syms[i + 1] == b
                            ):
                                fused.append(a + b)
                                i += 2
                            else:
                                fused.append(syms[i])
                                i += 1
                        out.append(fused)
                    yield pd.DataFrame(
                        {
                            "freq": pdf["freq"],
                            "syms": pd.Series(out, dtype=object),
                        }
                    )

            nxt = current.mapInPandas(
                kernel, "freq long, syms array<string>"
            ).persist()
            pending = current
            current = nxt
        current.unpersist()
        if pending is not None:
            pending.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

    return spark.createDataFrame(
        merges,
        "step int, left string, right string, pair_count long, merged string",
    )


def bpe_apply(syms: list, merges: list) -> list:
    """Apply a merge table (priority-ordered (left, right) pairs) to one
    symbol sequence: for each rule in order, fuse non-overlapping
    occurrences left-to-right — the reference BPE encode semantics,
    matching the training kernel's fusion rule exactly."""
    for a, b in merges:
        fused, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                fused.append(a + b)
                i += 2
            else:
                fused.append(syms[i])
                i += 1
        syms = fused
    return syms


def bpe_encode_tokens(
    docs_df: DataFrame,
    merges: list,
    text_col: str = "text",
) -> DataFrame:
    """ENCODE side of the BPE pair (:func:`bpe_train` learns the rules,
    this applies them): tokenize every document with the same BPE-ish
    pre-tokenizer, split words to characters, fuse by the merge table,
    and return one ``(token)`` row per emitted subword token.

    ``merges`` is the priority-ordered merge list — a num_merges-row
    driver constant (the trained table), shipped in the kernel closure
    like the k-means seeds. The kernel is Arrow-batched and memoizes
    the encode PER DISTINCT WORD within each batch — word frequency
    follows Zipf, so the memo hit-rate is high and the per-row cost is
    a dict lookup, the same argument as the training loop's
    distinct-word relation. Downstream aggregation (counts, top-k)
    map-side combines; nothing but token strings ever shuffles.
    """
    from ..functions.text import bpe_ish_tokens

    rules = [(str(a), str(b)) for a, b in merges]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list] = {}
        for pdf in batches:
            out: list[str] = []
            for words in pdf["ws"]:
                for w in words:
                    toks = memo.get(w)
                    if toks is None:
                        toks = bpe_apply(list(w), rules)
                        memo[w] = toks
                    out.extend(toks)
            yield pd.DataFrame({"token": pd.Series(out, dtype=object)})

    base = docs_df.select(bpe_ish_tokens(text_col).alias("ws"))
    return base.mapInPandas(kernel, "token string")

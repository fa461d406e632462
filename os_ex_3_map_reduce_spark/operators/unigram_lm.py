"""SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
"Subword Regularization", the `spm --model_type=unigram` construction
— the OTHER mainstream learned tokenizer next to BPE, SURVEY.md E4).

Public construction, distributed Spark-first:

1. **Seed vocabulary**: every substring (length <= L) of every corpus
   word, scored by occurrence frequency — counted JVM-side (a nested
   sequence/transform explode over the DISTINCT-word relation), top-N
   kept plus ALL single characters (the coverage floor that keeps
   every word segmentable forever).
2. **EM iterations** (hard/Viterbi EM): E-step segments each distinct
   word with the current piece log-probabilities (one Arrow-batched
   DP kernel, pieces broadcast; counts weighted by word frequency and
   summed in one map-side-combined groupBy); M-step re-estimates
   probabilities from the counts and PRUNES to the keep-size (always
   retaining single chars). Hard-EM is chosen over soft forward-
   backward deliberately: expected counts stay exact INTEGERS (sums
   of word frequencies), so the trajectory is partitioning-invariant
   and the catalog query can pin its vocabulary per scale — the same
   determinism discipline as the BPE trainer.

Scale shape (the 100 TB story): the only full-corpus pass is the word
histogram (the wordcount flagship: one map-side-combined groupBy).
Seeding and every EM round run on the DISTINCT-word relation — orders
of magnitude smaller than the corpus — with the vocabulary (a few
hundred rows) broadcast into the DP kernel and only vocab-bounded
count rows ever reaching the driver (<= keep+chars rows per round;
the bounded-collect trainer shape of train_centroids_sample/pq_train).

Determinism: piece log-probs are ln(int) - ln(int) rounded half-away
to 6 decimals once per (count, total) pair (the q_lm_perplexity
ledger recipe); the Viterbi DP breaks score ties by preferring the
LONGER final piece (explicit, order-independent), so segmentations —
and therefore counts — are bit-stable under any partitioning.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log-prob floor for characters that fall out of the model between
#: prune and re-count (cannot happen while chars are always kept, but
#: the DP needs a defined value to be total).
UNK_LOGPROB = -20.0


def word_histogram(docs_df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq) over the engine's BPE-ish word splitter — the one
    full-corpus pass; everything downstream runs on this relation."""
    from ..functions.text import bpe_ish_tokens

    return (
        docs_df.select(F.explode(bpe_ish_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def seed_vocab(
    words: DataFrame, max_piece_len: int = 6, max_vocab: int = 512
) -> pd.DataFrame:
    """Candidate pieces: all substrings of length <= ``max_piece_len``
    of every word, counted per occurrence position weighted by word
    frequency — entirely JVM-side (nested sequence/transform explode),
    one map-side-combined groupBy. Returns a driver-side
    (piece, count) frame: top ``max_vocab`` by (count desc, piece)
    UNION all single characters. Bounded collect: <= max_vocab + |Σ|
    rows."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("w") - i + 1),
                ),
                lambda n: F.col("w").substr(i, n),
            ),
        )
    )
    counts = (
        words.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("count"))
    )
    top = counts.orderBy(F.desc("count"), "piece").limit(max_vocab).collect()
    chars = (
        counts.where(F.length("piece") == 1)
        .orderBy(F.desc("count"), "piece")
        .collect()
    )
    seen: dict[str, int] = {}
    for r in list(top) + list(chars):
        seen.setdefault(r.piece, int(r["count"]))
    return pd.DataFrame(
        sorted(seen.items()), columns=["piece", "count"]
    )


def _logprobs(vocab: pd.DataFrame) -> dict[str, float]:
    total = int(vocab["count"].sum())
    lt = math.log(total)
    out = {}
    for piece, count in zip(vocab["piece"], vocab["count"]):
        v = math.log(int(count)) - lt
        # half-away 6dp rounding, the shared engine rule
        out[piece] = math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6
    return out


def viterbi_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """E-step: best segmentation of every distinct word under the
    current model (Arrow-batched DP, model broadcast), emitting
    (piece, freq) per segment; returns the vocab-bounded
    (piece, count) relation after one map-side-combined groupBy.

    DP tie rule: on exactly equal scores the LONGER final piece wins
    (scan start positions ascending, strict improvement required) —
    explicit and order-independent, so counts are partitioning-
    invariant."""
    spark = words.sparkSession
    b = spark.sparkContext.broadcast((logp, max_piece_len))

    def kernel(batches):
        model, L = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            pieces: list[str] = []
            freqs: list[int] = []
            for w, f in zip(pdf["w"], pdf["freq"]):
                n = len(w)
                best = [float("-inf")] * (n + 1)
                back = [0] * (n + 1)
                best[0] = 0.0
                for i in range(1, n + 1):
                    for j in range(max(0, i - L), i):
                        p = w[j:i]
                        lp = model.get(p)
                        if lp is None:
                            if i - j == 1:
                                lp = UNK_LOGPROB
                            else:
                                continue
                        s = best[j] + lp
                        if s > best[i]:
                            best[i] = s
                            back[i] = j
                i = n
                segs = []
                while i > 0:
                    segs.append(w[back[i]:i])
                    i = back[i]
                for p in segs:
                    pieces.append(p)
                    freqs.append(int(f))
            yield pd.DataFrame({"piece": pieces, "freq": freqs})

    local = words.select("w", "freq").mapInPandas(
        kernel, "piece string, freq long"
    )
    return local.groupBy("piece").agg(F.sum("freq").alias("count"))


def unigram_train(
    docs_df: DataFrame,
    text_col: str = "text",
    iters: int = 2,
    max_piece_len: int = 6,
    seed_max: int = 512,
    keep: int = 256,
) -> pd.DataFrame:
    """Full training loop; returns the final driver-side vocabulary
    (piece, count) where count is the last E-step's Viterbi count —
    the exact number of corpus word-occurrences segmented through the
    piece (so Σ count·len(piece) equals the corpus's total word
    characters, the conservation invariant the tests assert). Pieces
    pruned mid-training that are also not single characters are gone;
    characters always survive (coverage floor), with a probability
    floor of one count when an interim round never used them."""
    words = word_histogram(docs_df, text_col).persist()
    words.count()
    vocab = seed_vocab(words, max_piece_len, seed_max)
    try:
        for it in range(iters):
            counts = viterbi_counts(
                words, _logprobs(vocab), max_piece_len
            ).collect()  # vocab-bounded: <= len(vocab) rows
            got = {r.piece: int(r["count"]) for r in counts}
            if it == iters - 1:
                # final E-step: report the true counts, no floors
                return pd.DataFrame(
                    sorted(got.items()), columns=["piece", "count"]
                )
            rows = sorted(
                got.items(), key=lambda kv: (-kv[1], kv[0])
            )
            kept = dict(rows[:keep])
            # coverage floor: single chars always survive pruning
            for p, c in got.items():
                if len(p) == 1:
                    kept.setdefault(p, c)
            # chars never seen this round keep a count floor of 1 so
            # the model stays total for every possible word
            for p in vocab["piece"]:
                if len(p) == 1:
                    kept.setdefault(p, 1)
            vocab = pd.DataFrame(
                sorted(kept.items()), columns=["piece", "count"]
            )
    finally:
        words.unpersist()
    return vocab


def unigram_segment(word: str, logp: dict[str, float], max_piece_len: int) -> list[str]:
    """Reference single-word Viterbi (same DP and tie rule as the
    distributed kernel) — test/evidence helper."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            p = word[j:i]
            lp = logp.get(p)
            if lp is None:
                if i - j == 1:
                    lp = UNK_LOGPROB
                else:
                    continue
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    out = []
    i = n
    while i > 0:
        out.append(word[back[i]:i])
        i = back[i]
    return list(reversed(out))

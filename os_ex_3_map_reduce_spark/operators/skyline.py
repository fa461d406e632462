"""Distributed SKYLINE (Pareto frontier) — the multi-criteria "best
trade-offs" operator (Börzsönyi et al., ICDE 2001: the SKYLINE OF
clause), absent from both Spark and the reference.

A row is on the skyline iff no other row DOMINATES it: at least as
good in every criterion and strictly better in one. The naive plan is
an O(n²) self-join — hopeless at 100 TB. The published distributed
answer (MR-Skyline / sky-partition-then-merge) exploits transitivity
of dominance: the global skyline is a subset of the union of per-
partition LOCAL skylines, so

  phase 1: each partition drops its locally-dominated rows (one Arrow
           kernel, no shuffle — n² only within a bounded batch);
  phase 2: the tiny survivor union self-joins for the exact global
           frontier (a broadcast nested-loop anti join over hundreds
           of rows, the one place O(k²) is paid).

Skylines shrink as criteria correlate; the operator is honest about
the adversarial case (fully anti-correlated data keeps local
skylines large — the documented mitigation is a pre-`repartition` on
a space-filling-curve key so partitions see mixed regions, composing
with the engine's Z-order/Hilbert layout operators).

Determinism: every criterion is exact-integer — "larger better"
columns compare as int64; ratio criteria (e.g. average discount =
disc_sum/n, smaller better) compare CROSS-MULTIPLIED
(``b.num * a.den <= a.num * b.den``) so no division ever happens.
Dominance is therefore a pure integer predicate, bit-identical in the
Arrow kernel, the Spark phase-2 join, and the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dominates_mask(
    larger: list[np.ndarray],
    ratios: list[tuple[np.ndarray, np.ndarray]],
) -> np.ndarray:
    """Boolean matrix D[b, a] = row b dominates row a, for one batch.
    All inputs int64; ratio criteria are (numerator, denominator)
    pairs compared cross-multiplied, smaller-is-better."""
    n = larger[0].shape[0] if larger else ratios[0][0].shape[0]
    geq = np.ones((n, n), dtype=bool)
    strict = np.zeros((n, n), dtype=bool)
    for c in larger:
        b, a = c[:, None], c[None, :]
        geq &= b >= a
        strict |= b > a
    for num, den in ratios:
        nb, db = num[:, None], den[:, None]
        na, da = num[None, :], den[None, :]
        lhs, rhs = nb * da, na * db
        geq &= lhs <= rhs
        strict |= lhs < rhs
    return geq & strict


def skyline(
    df: DataFrame,
    larger_better: list[str],
    ratio_smaller_better: list[tuple[str, str]] = (),
) -> DataFrame:
    """Rows of ``df`` not dominated by any other row. Criteria:
    ``larger_better`` int64 columns (maximize) and
    ``ratio_smaller_better`` (num_col, den_col) int64 pairs whose
    exact ratio is minimized, compared cross-multiplied. Returns the
    input schema unchanged."""
    cols = df.columns
    lb = list(larger_better)
    rb = [tuple(p) for p in ratio_smaller_better]

    # Aggregate inputs often arrive AQE-coalesced to ONE partition
    # (20k slim rows look "small" to the coalescer) — which would hand
    # the kernel a single huge batch AND serialize phase 1. One
    # exchange of the slim relation buys full parallelism (measured
    # at sf0.1: 13.2 s -> 1.4 s end-to-end).
    sc = df.sparkSession.sparkContext
    df = df.repartition(sc.defaultParallelism)

    #: pairwise-matrix cap: the dominance mask is O(chunk²) memory, so
    #: batches fold through the running survivor set chunk by chunk
    #: (block-nested-loop skyline). Cost per chunk is
    #: (|survivors| + CHUNK)² — bounded while skylines stay small,
    #: degrading only on adversarially anti-correlated data (module
    #: doc: the space-filling-curve pre-partition is the mitigation).
    chunk_rows = 2048

    def local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            larger = [pdf[c].to_numpy(np.int64) for c in lb]
            ratios = [
                (pdf[c_n].to_numpy(np.int64), pdf[c_d].to_numpy(np.int64))
                for c_n, c_d in rb
            ]
            keep = np.empty(0, dtype=np.int64)
            for lo in range(0, n, chunk_rows):
                idx = np.concatenate(
                    [keep, np.arange(lo, min(lo + chunk_rows, n))]
                )
                sub_l = [c[idx] for c in larger]
                sub_r = [(num[idx], den[idx]) for num, den in ratios]
                dominated = _dominates_mask(sub_l, sub_r).any(axis=0)
                keep = idx[~dominated]
            yield pdf.iloc[keep]

    # persist the survivor union: the phase-2 self-join references it
    # on BOTH sides, and without materialization Spark recomputes the
    # whole aggregate+kernel subtree twice (measured at sf0.1:
    # 2.9 s -> 1.6 s). Exposed via _osx3_persists for callers to free.
    survivors = df.mapInPandas(local_skyline, df.schema).persist()
    survivors.count()

    # phase 2: exact global frontier over the small survivor union —
    # a broadcast nested-loop LEFT ANTI join on the dominance
    # predicate (non-equi by nature; k² over survivors only).
    a = survivors.alias("a")
    b = survivors.alias("b")

    def col(side: str, name: str) -> Column:
        return F.col(f"{side}.{name}")

    geq = F.lit(True)
    strict = F.lit(False)
    for c in lb:
        geq = geq & (col("b", c) >= col("a", c))
        strict = strict | (col("b", c) > col("a", c))
    for n_c, d_c in rb:
        lhs = col("b", n_c) * col("a", d_c)
        rhs = col("a", n_c) * col("b", d_c)
        geq = geq & (lhs <= rhs)
        strict = strict | (lhs < rhs)
    out = a.join(F.broadcast(b), geq & strict, "left_anti").select(
        *[F.col(c) for c in cols]
    )
    out._osx3_persists = [survivors]  # type: ignore[attr-defined]
    return out

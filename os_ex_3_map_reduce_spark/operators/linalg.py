"""Distributed dense linear algebra over embedding columns (SURVEY.md
E3 adjunct): the Gram-matrix aggregation and the PCA built on it.

The 100 TB pattern: for tall-skinny data (n huge, d small — every
embedding table) the global Gram matrix XᵀX is a d×d aggregate each
partition can compute locally as one BLAS matmul and ship as d(d+1)/2
partial sums — the `computeGramianMatrix` shape spark.ml RowMatrix
uses. n never moves; only k·d² numbers per partition do. PCA is then a
DRIVER-side eigendecomposition of the d×d covariance assembled from
the aggregated Gram + column sums — the data is never centered, never
re-read, never shuffled.

Determinism: coordinates fix-point to the 1e-6 int64 grid (half-away,
the q_kmeans_assign rule), so every partial product and cross-batch
sum is an exact integer — the Gram relation is reproducible in ANSI
SQL with no pins. Per-batch partials stay far inside int64 (|coord| ≤
10⁶ → |product| ≤ 10¹², batch ≤ 10⁴ rows → partial ≤ 10¹⁶); the
CROSS-batch sum is what grows with n, so it runs as DECIMAL(38,0) in
the aggregate, and DuckDB's BIGINT SUM widens to HUGEINT the same
way. The RETURNED column, however, is cast back to BIGINT — that is
the cross-engine compare contract with the oracle's CAST(... AS
BIGINT) — so the output (not the aggregate) bounds the operator at
|gram| < 2⁶³, i.e. n ≲ 9·10⁶ rows at the grid's 10¹² per-row product
ceiling (ADVICE r10: the earlier "n ≈ 10²⁶" claim described only the
internal decimal). Past that, keep the DECIMAL(38,0) ``gram_dec``
(good to n ≈ 10²⁶) by taking :func:`gram_matrix_int`'s pre-cast
aggregate; under Spark's default ANSI mode the overflow is a loud
cast error, never a silent wrap.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _lloyd_fixpoint, round_half_away


def gram_matrix_int(
    emb_df: DataFrame,
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact integer Gram matrix of the 1e-6-grid-quantized embedding
    column, long format: rows ``(i, j, gram)`` for every 1-based upper
    triangle pair i ≤ j, plus ``(0, j, colsum_j)`` rows carrying the
    per-dimension coordinate sums (what centering needs). One Arrow
    kernel per batch emits the d(d+1)/2 + d partial sums from a single
    matmul; one map-side-combined groupBy reduces them in
    DECIMAL(38,0); nothing per-row ever shuffles."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _lloyd_fixpoint(
                np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            )
            d = mat.shape[1]
            G = mat.T @ mat  # exact: |entries| ≤ batch·10¹², inside int64
            iu, ju = np.triu_indices(d)
            cols = mat.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu + 1, np.zeros(d, dtype=np.int64)]),
                    "j": np.concatenate(
                        [ju + 1, np.arange(1, d + 1, dtype=np.int64)]
                    ),
                    "s": np.concatenate([G[iu, ju], cols]),
                }
            )

    partials = emb_df.select(emb_col).mapInPandas(kernel, "i long, j long, s long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("gram_dec"))
        .select("i", "j", F.col("gram_dec").cast("long").alias("gram"))
    )


def pca_topk(
    emb_df: DataFrame,
    k: int = 8,
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed PCA, the Gramian way: aggregate the exact integer
    Gram matrix + column sums (one pass, nothing per-row shuffles),
    assemble the d×d covariance on the DRIVER (d² numbers), and
    eigendecompose there — numpy ``eigvalsh`` on an exactly-determined
    integer-derived matrix, so the spectrum is a pure function of the
    data, independent of partitioning or summation order. Eigenvalues
    are reported in the ORIGINAL (unquantized) coordinate units.

    Returns ``(component, eigenvalue, explained_ratio)`` for the top
    ``k`` components, both values rounded to 4 decimals half-away.
    Catalog registration pins the expected spectrum per scale (the
    numpy-trainer precedent — cross-engine SQL cannot eigendecompose);
    a BLAS upgrade changing eigvalsh results would surface as a pin
    mismatch, same ledger argument as the IVF pins."""
    rows = gram_matrix_int(emb_df, emb_col).collect()
    d = max(r.j for r in rows)
    G = np.zeros((d, d), dtype=np.float64)
    colsum = np.zeros(d, dtype=np.float64)
    for r in rows:
        if r.i == 0:
            colsum[r.j - 1] = r.gram
        else:
            G[r.i - 1, r.j - 1] = r.gram
            G[r.j - 1, r.i - 1] = r.gram
    n = emb_df.count()
    if n < 2:
        raise ValueError("pca_topk: need at least 2 rows")
    mean = colsum / n
    # covariance in original units: grid is 1e-6, so divide by 1e12
    cov = (G / n - np.outer(mean, mean)) / 1e12
    spectrum = np.linalg.eigvalsh(cov)
    evals = spectrum[::-1][: min(k, d)]
    total = float(spectrum.sum())
    out = [
        (
            int(c + 1),
            float(round_half_away(np.array([v]), 4)[0]),
            float(round_half_away(np.array([v / total]), 4)[0]),
        )
        for c, v in enumerate(evals)
    ]
    spark = emb_df.sparkSession
    return spark.createDataFrame(
        out, "component int, eigenvalue double, explained_ratio double"
    )


def mahalanobis_topk(
    emb_df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` MAHALANOBIS outliers: the covariance-aware distance
    d²(x) = (x-μ)ᵀ Σ⁻¹ (x-μ) that q_outlier_zscore's per-dimension
    z-scores cannot express — a point can be unremarkable in every
    coordinate yet far from the data cloud once dimension correlations
    are accounted for (d² is also affine-invariant, so feature scaling
    never changes the ranking).

    Same two-tier shape as :func:`pca_topk`: the exact integer Gram +
    column sums aggregate in ONE distributed pass (nothing per-row
    shuffles), the d×d covariance assembles and inverts on the DRIVER
    (d² numbers; LAPACK inverse of an exactly-determined matrix —
    partitioning-invariant, asserted at pin time), and the quadratic
    form evaluates executor-side in one Arrow kernel per batch
    ((X-μ) @ Σ⁻¹ contracted against itself — two d×d matmuls per
    batch, no Python per row). d² is unit-free, so the 1e-6 grid
    cancels. Scores round to 1e-4 half-away; top-k via TakeOrdered
    with the id tiebreak. Catalog registration pins expected values
    per scale (the eigvalsh/pca ledger argument: SQL cannot invert a
    matrix, and a BLAS change would surface as a pin mismatch)."""
    rows = gram_matrix_int(emb_df, emb_col).collect()
    d = max(r.j for r in rows)
    G = np.zeros((d, d), dtype=np.float64)
    colsum = np.zeros(d, dtype=np.float64)
    for r in rows:
        if r.i == 0:
            colsum[r.j - 1] = r.gram
        else:
            G[r.i - 1, r.j - 1] = r.gram
            G[r.j - 1, r.i - 1] = r.gram
    n = emb_df.count()
    if n <= d:
        raise ValueError("mahalanobis_topk: need n > d rows")
    mean = colsum / n
    cov = G / n - np.outer(mean, mean)  # grid² units; d² is unit-free
    inv = np.linalg.inv(cov)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = _lloyd_fixpoint(
                np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            ).astype(np.float64)
            D = X - mean[None, :]
            d2 = np.einsum("ij,ij->i", D @ inv, D)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "d2": round_half_away(d2, 4),
                }
            )

    scored = emb_df.select(id_col, emb_col).mapInPandas(
        kernel, "vec_id long, d2 double"
    )
    return scored.orderBy(F.desc("d2"), F.asc("vec_id")).limit(k)

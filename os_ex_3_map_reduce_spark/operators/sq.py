"""Scalar quantization — the SQ8 rung of the ANN memory ladder
(SURVEY.md E3): exact → LSH → IVF → **SQ8 (8×)** → PQ (32×) → IVF-PQ.

The public faiss ``ScalarQuantizer(QT_8bit)`` construction: per
dimension, learn the corpus [min, max] range, store each coordinate as
one uint8 level ``c = round((x-min)/width·255)``, reconstruct as
``x' = min + c·width/255``. 8× compression at far higher fidelity than
PQ (each dim keeps 256 levels vs sharing 16 centroids per subspace) —
the rung a pipeline takes when PQ recall is too low but floats don't
fit.

Search never reconstructs: for a query q the cosine against the
reconstructed vector factors as

    q̂·x' = q̂·vmin  +  Σᵢ cᵢ · (q̂ᵢ·widthᵢ/255)
          = offset(q) + codes · w(q)

so the batch kernel is ONE integer-codes × query-weights matmul plus a
broadcast offset — the SQ analog of PQ's ADC lookup — divided by the
reconstruction norm stored at encode time (the faiss stored-norms
trick). Training is a per-dimension min/max aggregate: each Arrow
batch emits d partial rows, one map-side-combined groupBy reduces
them, d rows reach the driver.

Determinism: min/max are exact doubles; codes round half-away on both
engines' shared rule; every search score is a pure function of
(codes, params, query) — partitioning-invariant, so catalog pins are
sound.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import round_half_away


def sq_train(
    emb_df: DataFrame,
    emb_col: str = "embedding",
) -> "np.ndarray":
    """Learn per-dimension [min, max] over the corpus; returns a
    (2, d) float64 array [vmin; vmax]. Distributed one-pass: Arrow
    partials (d rows per batch) + one tiny groupBy — n never moves."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            d = mat.shape[1]
            yield pd.DataFrame(
                {
                    "pos": np.arange(d, dtype=np.int32),
                    "mn": mat.min(axis=0),
                    "mx": mat.max(axis=0),
                }
            )

    rows = (
        emb_df.select(emb_col)
        .mapInPandas(kernel, "pos int, mn double, mx double")
        .groupBy("pos")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .collect()
    )
    if not rows:
        raise ValueError("sq_train: empty training input")
    d = max(r.pos for r in rows) + 1
    params = np.zeros((2, d), dtype=np.float64)
    for r in rows:
        params[0, r.pos] = r.mn
        params[1, r.pos] = r.mx
    return params


def sq_encode(
    emb_df: DataFrame,
    params: "np.ndarray",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to uint8 levels against broadcast params;
    returns (id, codes array<int>, recon_norm double). Out-of-range
    coordinates (vectors appended after training) clip to the learned
    range — the standard SQ append semantics. A constant dimension
    (width 0) encodes 0 and reconstructs vmin. recon_norm is the
    reconstructed vector's L2 norm, stored at encode time so search
    never reconstructs (the faiss stored-norms trick)."""
    spark = emb_df.sparkSession
    b_p = spark.sparkContext.broadcast(params)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = b_p.value
        vmin, vmax = P[0], P[1]
        width = vmax - vmin
        safe_w = np.where(width > 0, width, 1.0)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            lv = round_half_away((mat - vmin) / safe_w * 255.0, 0)
            codes = np.clip(np.where(width > 0, lv, 0.0), 0, 255).astype(
                np.int64
            )
            recon = vmin + codes * (safe_w / 255.0) * (width > 0)
            norms = np.linalg.norm(recon, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "recon_norm": norms,
                }
            )

    return emb_df.select(id_col, emb_col).mapInPandas(
        kernel, f"{id_col} long, codes array<long>, recon_norm double"
    )


def sq_search_batch(
    codes_df: DataFrame,
    params: "np.ndarray",
    queries: Iterable[Iterable[float]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch cosine search over SQ codes WITHOUT reconstruction: score
    = (offset(q) + codes · w(q)) / recon_norm via one codes×weights
    matmul per Arrow batch, per-batch partial top-k bounding the
    shuffle to k rows per (query, batch), one bounded window for the
    global per-query top-k — the same production shape as the IVF/PQ
    batch kernels. Output: (query_id, vec_id, sq_score, rank)."""
    from pyspark.sql import Window

    vecs = [np.asarray(list(q), dtype=np.float64) for q in queries]
    if not vecs:
        raise ValueError("sq batch search: empty query batch")
    Q = np.stack(vecs)
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    if not np.all(norms > 0):
        raise ValueError("sq batch search: zero-norm query vector")
    Qn = Q / norms
    vmin, vmax = params[0], params[1]
    width = vmax - vmin
    W = Qn * np.where(width > 0, width, 0.0) / 255.0  # Q x d weights
    off = Qn @ vmin  # Q offsets
    spark = codes_df.sparkSession
    b_q = spark.sparkContext.broadcast((W, off))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W_, off_ = b_q.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.float64)
            rn = pdf["recon_norm"].to_numpy()
            dots = C @ W_.T + off_[None, :]  # rows x Q
            S = round_half_away(
                dots / np.where(rn > 0, rn, 1.0)[:, None], 4
            )
            S = np.where(rn[:, None] > 0, S, 0.0)
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_c = [], [], []
            for qi in range(W_.shape[0]):
                order = np.lexsort((ids, -S[:, qi]))[:k]
                out_q.extend([qi] * len(order))
                out_id.extend(ids[order])
                out_c.extend(S[order, qi])
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    id_col: pd.Series(out_id, dtype="int64"),
                    "sq_score": pd.Series(out_c, dtype="float64"),
                }
            )

    partial = codes_df.mapInPandas(
        kernel, f"query_id long, {id_col} long, sq_score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sq_score"), F.asc(id_col)
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "sq_score", "rank")
    )

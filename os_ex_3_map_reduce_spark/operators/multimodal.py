"""Multimodal (binary) column plumbing (SURVEY.md E5).

Media payloads are opaque ``binary`` columns with typed metadata; all
decode/feature steps run as Arrow-batched Python over ``mapInPandas``
(the batch shape, schema, and partitioning are the real, tested part).
Actual image/audio decoding is STUBBED — the decode libraries are not
in this container — behind:

- :func:`decode_image` — raises NotImplementedError with instructions.
- :func:`fake_decode_image` — deterministic fake decoder (pixels derived
  from sha256 of the payload) so the downstream plumbing (resize,
  feature extraction, batching) is exercised end-to-end and
  reproducibly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media table: utf-8 payload bytes + typed metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def decode_image(payload: bytes) -> "np.ndarray":  # pragma: no cover - stub
    raise NotImplementedError(
        "Image decoding requires an imaging library (e.g. Pillow/opencv) "
        "not present in this container. Swap in a real decoder here; the "
        "Spark-side plumbing (metadata_stats / fake_image_features) is "
        "already batch-shaped for it."
    )


def fake_decode_image(payload: bytes, height: int = 4, width: int = 4) -> np.ndarray:
    """Deterministic fake decode: pixels from the sha256 digest,
    tiled to (height, width, 3) uint8."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(
        (digest * ((height * width * 3) // len(digest) + 1))[: height * width * 3],
        dtype=np.uint8,
    )
    return raw.reshape(height, width, 3)


def metadata_stats(df: DataFrame) -> DataFrame:
    """Per-payload metadata via Arrow batches: byte length + sha256.

    Oracle-checkable: hashlib sha256 over utf-8 bytes == DuckDB
    sha256(text) == Spark sha2(text, 256).
    """

    def batch_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        batch_stats, schema="doc_id long, media_type string, byte_len long, sha256 string"
    )


def fake_image_features(df: DataFrame, height: int = 4, width: int = 4) -> DataFrame:
    """Decode(fake) → per-image features, batch-shaped exactly like a
    real image pipeline: mean pixel (exact int sum / one divide),
    per-channel maxima, flattened dims."""

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = fake_decode_image(bytes(payload), height, width)
                rows.append(
                    (
                        int(doc_id),
                        int(img.shape[0]),
                        int(img.shape[1]),
                        int(img.shape[2]),
                        float(int(img.sum()) / img.size),
                        [int(x) for x in img.max(axis=(0, 1))],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "height", "width", "channels", "mean_pixel", "channel_max"],
            )

    return df.select("doc_id", "payload").mapInPandas(
        batch_features,
        schema="doc_id long, height long, width long, channels long, "
        "mean_pixel double, channel_max array<long>",
    )

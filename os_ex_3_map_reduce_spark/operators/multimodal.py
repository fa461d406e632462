"""Multimodal (binary) column plumbing (SURVEY.md E5).

Media payloads are opaque ``binary`` columns with typed metadata; all
decode/feature steps run as Arrow-batched Python over ``mapInPandas``
(the batch shape, schema, and partitioning are the real, tested part).

Decode comes in two tiers:

- **REAL decode for uncompressed formats** — 24-bit BMP and 16-bit PCM
  WAV, parsed byte-for-byte from the public specs in pure numpy
  (:mod:`..functions.codecs`; golden-byte tested). The roundtrip
  feature ops below (:func:`bmp_image_features`,
  :func:`wav_audio_features`) exercise real encode → binary column →
  real header/payload parse → features, exact-oracled.
- **Compressed formats stay STUBBED** — JPEG/PNG/MP4 decoders are not
  in this container: :func:`decode_image` raises NotImplementedError
  with instructions, and :func:`fake_decode_image` (pixels derived
  from sha256 of the payload) keeps the downstream plumbing (resize,
  frame sampling, feature extraction) exercised deterministically.
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


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — the real resampling logic;
    only the decode that produced ``img`` is faked in this container)."""
    in_h, in_w = img.shape[:2]
    rows = (np.arange(out_h) * in_h) // out_h
    cols = (np.arange(out_w) * in_w) // out_w
    return img[rows][:, cols]


def resize_images(
    df: DataFrame,
    out_h: int = 2,
    out_w: int = 2,
    src_h: int = 4,
    src_w: int = 4,
) -> DataFrame:
    """Decode(fake) → nearest-neighbor resize → flattened pixels.

    Batch shape mirrors a production image-resize stage: binary in,
    fixed-size pixel tensor out (flattened to array<long> so the
    schema is Arrow-friendly; a real pipeline would emit binary or
    array<float> the same way)."""

    def batch_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = fake_decode_image(bytes(payload), src_h, src_w)
                out = resize_nearest(img, out_h, out_w)
                rows.append(
                    (int(doc_id), out_h, out_w, [int(x) for x in out.ravel()])
                )
            yield pd.DataFrame(rows, columns=["doc_id", "height", "width", "pixels"])

    return df.select("doc_id", "payload").mapInPandas(
        batch_resize,
        schema="doc_id long, height long, width long, pixels array<long>",
    )


def sample_frames(
    df: DataFrame,
    num_frames: int = 3,
    total_frames: int = 16,
    height: int = 4,
    width: int = 4,
) -> DataFrame:
    """Video frame sampling: evenly-spaced frame indices, one output
    row per (doc, frame) — the explode-shaped schema a real video
    pipeline produces. Frame decode is the deterministic fake (seeded
    by payload + frame index); the index arithmetic and batch fan-out
    are the real logic.
    """
    idx = [(i * total_frames) // num_frames for i in range(num_frames)]

    def batch_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fi in idx:
                    # ASCII frame-seed suffix (not raw int bytes): equally
                    # deterministic, and expressible in the DuckDB oracle
                    # (sha256 there is VARCHAR-only — NUL bytes would be
                    # unrepresentable).
                    frame = fake_decode_image(
                        bytes(payload) + f":frame:{fi}".encode(), height, width
                    )
                    rows.append(
                        (int(doc_id), fi, float(int(frame.sum()) / frame.size))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "mean_pixel"])

    return df.select("doc_id", "payload").mapInPandas(
        batch_sample, schema="doc_id long, frame_idx long, mean_pixel double"
    )


def fake_image_features(df: DataFrame, height: int = 4, width: int = 4) -> DataFrame:
    """Decode(fake) → per-image features, batch-shaped exactly like a
    real image pipeline: mean pixel (exact int sum / one divide),
    per-channel maxima, flattened dims.

    Channel maxima are three scalar columns (max_c0/1/2), not an
    array<long>: scalar cells survive any downstream canonicalizer
    (pandas sort_values chokes on ndarray cells) and compare 1:1
    against a SQL oracle."""

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = fake_decode_image(bytes(payload), height, width)
                cmax = img.max(axis=(0, 1))
                rows.append(
                    (
                        int(doc_id),
                        int(img.shape[0]),
                        int(img.shape[1]),
                        int(img.shape[2]),
                        float(int(img.sum()) / img.size),
                        int(cmax[0]),
                        int(cmax[1]),
                        int(cmax[2]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "height",
                    "width",
                    "channels",
                    "mean_pixel",
                    "max_c0",
                    "max_c1",
                    "max_c2",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(
        batch_features,
        schema="doc_id long, height long, width long, channels long, "
        "mean_pixel double, max_c0 long, max_c1 long, max_c2 long",
    )


def bmp_image_features(
    df: DataFrame, height: int = 8, width: int = 6
) -> DataFrame:
    """REAL image decode path: synthesize a deterministic RGB image per
    doc (pixel = (doc_id*7 + x*3 + y*5 + c*11) mod 256), encode it as
    an actual 24-bit BMP (bottom-up, BGR, padded rows — width 6 makes
    the 4-byte row padding load-bearing), then DECODE the bytes with
    the real parser and emit features from the decoded tensor.

    The features (decoded dims + exact pixel sum) are reproducible by
    pure arithmetic, so the oracle verifies the whole encode→parse
    roundtrip: any header/stride/channel-order bug desynchronizes the
    sum. Arrow-batched; at scale the binary column arrives from
    storage and only the decode half runs.
    """
    from ..functions.codecs import decode_bmp, encode_bmp

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        x = np.arange(height)[:, None, None]
        y = np.arange(width)[None, :, None]
        c = np.arange(3)[None, None, :]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                img = ((int(doc_id) * 7 + x * 3 + y * 5 + c * 11) % 256).astype(
                    np.uint8
                )
                decoded = decode_bmp(encode_bmp(img))
                rows.append(
                    (
                        int(doc_id),
                        int(decoded.shape[0]),
                        int(decoded.shape[1]),
                        int(decoded.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "height", "width", "sum_pixels"]
            )

    return df.select("doc_id").mapInPandas(
        batch, schema="doc_id long, height long, width long, sum_pixels long"
    )


def wav_audio_features(
    df: DataFrame, n_samples: int = 256, sample_rate: int = 16000
) -> DataFrame:
    """REAL audio decode path: synthesize deterministic int16 PCM per
    doc (sample_i = ((doc_id*31 + i*17) mod 4096) - 2048), encode as an
    actual RIFF/WAVE stream, DECODE it with the real chunk-walking
    parser, and emit (n_samples, rate, exact sum of squares) from the
    decoded samples — the audio-energy accounting a speech pipeline
    runs, verifiable by pure arithmetic in the oracle.
    """
    from ..functions.codecs import decode_wav_pcm16, encode_wav_pcm16

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                samples = (((int(doc_id) * 31 + i * 17) % 4096) - 2048).astype(
                    np.int16
                )
                decoded, rate = decode_wav_pcm16(
                    encode_wav_pcm16(samples, sample_rate)
                )
                rows.append(
                    (
                        int(doc_id),
                        int(decoded.size),
                        int(rate),
                        int((decoded.astype(np.int64) ** 2).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "sample_rate", "sum_sq"]
            )

    return df.select("doc_id").mapInPandas(
        batch,
        schema="doc_id long, n_samples long, sample_rate long, sum_sq long",
    )


def wav_frame_features(
    df: DataFrame,
    n_samples: int = 256,
    sample_rate: int = 16000,
    frame_len: int = 64,
) -> DataFrame:
    """Windowed DSP features over REAL decoded audio: per doc, the PCM
    stream (same synth->RIFF encode->chunk-walk decode path as
    :func:`wav_audio_features`) splits into fixed frames and each frame
    emits exact-integer energy (sum of squares, int64) and
    zero-crossing count (sign flips between consecutive samples within
    the frame; "negative vs non-negative" so a 0 sample is handled
    identically everywhere) — the front-end features (frame energy,
    ZCR) of every classical speech/VAD pipeline, exact enough to
    hash-verify against a pure-arithmetic oracle.
    """
    from ..functions.codecs import decode_wav_pcm16, encode_wav_pcm16

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        n_frames = n_samples // frame_len
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                samples = (((int(doc_id) * 31 + i * 17) % 4096) - 2048).astype(
                    np.int16
                )
                decoded, _ = decode_wav_pcm16(
                    encode_wav_pcm16(samples, sample_rate)
                )
                x = decoded.astype(np.int64)[: n_frames * frame_len]
                frames = x.reshape(n_frames, frame_len)
                energy = (frames * frames).sum(axis=1)
                neg = frames < 0
                zcr = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                for f in range(n_frames):
                    rows.append(
                        (int(doc_id), f, int(energy[f]), int(zcr[f]))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame", "energy", "zcr"]
            )

    return df.select("doc_id").mapInPandas(
        batch, schema="doc_id long, frame int, energy long, zcr long"
    )


# --- binaryFile-source ingestion (the production media-lake path) --------

_BMP_STAGE_CACHE: dict[tuple[str, int, int], str] = {}


def staged_bmp_dir(spark, sf_dir: str, height: int = 4, width: int = 4) -> str:
    """Stage one REAL ``.bmp`` file per document into a temp directory.

    Pixels are the deterministic fake decode of the doc's text payload
    (sha256-derived — same bytes the SQL oracle can rebuild), written
    with the real BMP encoder; the filename carries the doc_id. This is
    fixture STAGING, driver-side by design (exactly like
    streaming.events.staged_events_dir copies the events file): the
    measured/verified query is the binaryFile scan + real decode, not
    this one-time setup. At 100 TB the directory already exists — it IS
    the media lake.
    """
    import atexit
    import shutil
    import tempfile
    from pathlib import Path

    key = (sf_dir, height, width)  # dims are part of the staged content
    if key not in _BMP_STAGE_CACHE:
        d = Path(tempfile.mkdtemp(prefix="osx3_bmp_lake_"))
        atexit.register(shutil.rmtree, str(d), ignore_errors=True)
        from ..functions.codecs import encode_bmp

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .toPandas()
        )
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            img = fake_decode_image(str(text).encode(), height, width)
            (d / f"{int(doc_id)}.bmp").write_bytes(encode_bmp(img))
        _BMP_STAGE_CACHE[key] = str(d)
    return _BMP_STAGE_CACHE[key]


def binaryfile_image_stats(spark, path: str) -> DataFrame:
    """Ingest a directory of BMPs via Spark's ``binaryFile`` source and
    decode each with the real parser: (doc_id from filename, file
    length from source metadata, decoded dims, mean pixel).

    This is the production multimodal ingestion shape: the binaryFile
    source lists and splits files across executors (add
    ``recursiveFileLookup`` for a partitioned lake), ships (path,
    length, content) rows, and the decode runs Arrow-batched next to
    the data — no driver involvement per file.
    """
    from ..functions.codecs import decode_bmp

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(path)
        .select("path", "length", "content")
    )

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, ln, content in zip(pdf["path"], pdf["length"], pdf["content"]):
                img = decode_bmp(bytes(content))
                rows.append(
                    (
                        int(p.rsplit("/", 1)[-1].removesuffix(".bmp")),
                        int(ln),
                        int(img.shape[0]),
                        int(img.shape[1]),
                        float(img.astype(np.int64).sum()) / img.size,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "byte_len", "height", "width", "mean_pixel"],
            )

    return raw.mapInPandas(
        batch,
        schema="doc_id long, byte_len long, height long, width long, "
        "mean_pixel double",
    )


def augment_images(
    df: DataFrame, height: int = 8, width: int = 6, crop: int = 4,
    brightness: int = 17,
) -> DataFrame:
    """Deterministic image AUGMENTATION stage (E5): the three standard
    training-data transforms — horizontal flip, center crop, additive
    brightness with uint8 saturation — run as real numpy tensor ops
    over the real BMP encode→decode roundtrip (the
    ``bmp_image_features`` synthesis: pixel =
    (doc_id*7 + x*3 + y*5 + c*11) mod 256, so every augmented pixel is
    reproducible by pure arithmetic and the oracle re-derives the
    whole pipeline including the saturation clip). Emits per doc the
    augmented tensor's exact integer pixel sum and its saturated-pixel
    count — the evidence pair: the sum catches any geometry mistake
    (flip axis, crop offset), the clip count catches the saturation
    rule. Arrow-batched; at scale the decode input arrives from the
    media lake and the same kernel runs unchanged."""
    from ..functions.codecs import decode_bmp, encode_bmp

    r0 = (height - crop) // 2
    c0 = (width - crop) // 2

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        x = np.arange(height)[:, None, None]
        y = np.arange(width)[None, :, None]
        c = np.arange(3)[None, None, :]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                img = (
                    (int(doc_id) * 7 + x * 3 + y * 5 + c * 11) % 256
                ).astype(np.uint8)
                decoded = decode_bmp(encode_bmp(img))
                aug = decoded[:, ::-1, :]  # horizontal flip
                aug = aug[r0 : r0 + crop, c0 : c0 + crop, :]  # center crop
                lifted = aug.astype(np.int64) + brightness
                n_sat = int((lifted > 255).sum())
                aug = np.minimum(lifted, 255)  # saturating brightness
                rows.append(
                    (int(doc_id), int(aug.sum(dtype=np.int64)), n_sat)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "sum_aug", "n_saturated"]
            )

    return df.select("doc_id").mapInPandas(
        batch, schema="doc_id long, sum_aug long, n_saturated long"
    )


def image_dhash(
    df: DataFrame, height: int = 4, width: int = 4
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the standard
    near-duplicate IMAGE fingerprint (krawetz's dHash; the E5 x E2
    cross): integer grayscale = (R + G + B) // 3 per pixel, one bit
    per horizontally-adjacent pixel pair (left < right), packed
    row-major into a bigint. Structure-sensitive, brightness-shift
    tolerant; images bucket by hash exactly like MinHash bands bucket
    text. Arrow-batched over the payload column; all-integer, so the
    SQL oracle rebuilds every bit from the fake decode's sha256
    arithmetic. Returns (doc_id, phash)."""
    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = fake_decode_image(bytes(payload), height, width)
                gray = img.astype(np.int64).sum(axis=2) // 3
                bits = (gray[:, :-1] < gray[:, 1:]).astype(np.int64).ravel()
                h = int((bits << np.arange(bits.size)).sum())
                out.append((int(doc_id), h))
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return df.mapInPandas(batch, "doc_id long, phash long")


def melody_tone_bin(doc_id: int, seg: int) -> int:
    """The per-segment dominant frequency (in whole cycles per
    256-sample window, i.e. the rfft bin) of a doc's synthetic
    "melody": a NON-LINEAR portable hash (md5, the repo's oracle-"
    "replayable standard) picks each segment's tone, so two docs'
    melodies never align by arithmetic accident. (Two measured dead
    ends recorded here: the shared sawtooth fixture is useless for
    spectral work — every doc is a PHASE SHIFT of one periodic
    source and magnitude spectra are phase-blind, so every doc
    fingerprinted identically; and a multiplicative LINEAR hash
    produced exact shifted-melody collisions between unrelated docs
    — h(k+Δ) tracks h(k) linearly, so some pair always aligns.)"""
    import hashlib

    h = hashlib.md5(f"{doc_id}:{seg}".encode()).hexdigest()
    return 5 + int(h[:8], 16) % 97


def _synth_melody(doc_id: int, n_segments: int, frame: int) -> np.ndarray:
    """Piecewise pure tones, one per ``frame``-sample segment, each an
    INTEGER number of cycles per segment (so the segment's rfft peak
    is exactly its bin — robustly deterministic argmax)."""
    out = np.empty(n_segments * frame, dtype=np.int16)
    t = np.arange(frame, dtype=np.float64) / frame
    for seg in range(n_segments):
        b = melody_tone_bin(int(doc_id), seg)
        tone = np.sin(2.0 * np.pi * b * t) * 12000.0
        out[seg * frame : (seg + 1) * frame] = tone.astype(np.int16)
    return out


def _peak_shingles(
    samples: np.ndarray, frame: int
) -> list[tuple[int, int]]:
    """(fingerprint, frame_idx) pairs: per non-overlapping frame the
    dominant rfft bin (DC excluded; magnitude argmax, lowest-bin
    tiebreak via argmax's first-occurrence rule), then every 3
    consecutive peaks pack into one integer shingle — the landmark/
    constellation idea (Wang 2003) reduced to its deterministic core.
    Magnitudes are floats; the PINNED-oracle ledger covers the FFT
    like it covers eigvalsh: an implementation change surfaces as a
    pin mismatch."""
    from ..functions.codecs import decode_wav_pcm16, encode_wav_pcm16

    decoded, _ = decode_wav_pcm16(encode_wav_pcm16(samples, 16000))
    x = decoded.astype(np.float64)
    peaks = []
    for start in range(0, len(x) - frame + 1, frame):
        mag = np.abs(np.fft.rfft(x[start : start + frame]))
        peaks.append(int(np.argmax(mag[1:]) + 1))  # DC excluded
    nbin = frame // 2 + 1
    return [
        (peaks[j] * nbin * nbin + peaks[j + 1] * nbin + peaks[j + 2], j)
        for j in range(len(peaks) - 2)
    ]


def audio_fingerprints(
    df: DataFrame,
    n_segments: int = 15,
    frame: int = 256,
) -> DataFrame:
    """Constellation-style audio fingerprints over the synthesized WAV
    lake: one Arrow batch kernel per partition encodes+decodes the
    real RIFF bytes and emits (doc_id, fp, frame_idx) shingle rows —
    the searchable relation audio copy-detection joins on. Corpus
    work is per-doc-linear; nothing ever compares audio to audio
    directly."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                for fp, j in _peak_shingles(
                    _synth_melody(int(doc_id), n_segments, frame), frame
                ):
                    rows.append((int(doc_id), fp, j))
            yield pd.DataFrame(rows, columns=["doc_id", "fp", "frame_idx"])

    return df.select("doc_id").mapInPandas(
        batch, schema="doc_id long, fp long, frame_idx long"
    )

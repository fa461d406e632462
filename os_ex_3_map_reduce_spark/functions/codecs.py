"""Real media codecs for UNCOMPRESSED formats — pure numpy/stdlib.

The container has no imaging/audio libraries, which is why compressed
decode (JPEG/PNG/MP4/MP3) stays stubbed in :mod:`..operators.multimodal`.
Uncompressed containers need no library: 24-bit BI_RGB BMP and 16-bit
PCM WAV are fully specified byte layouts, implemented here from the
public format specifications (Windows BITMAPINFOHEADER; RIFF/WAVE).
With these, the engine's E5 decode path is REAL end-to-end for
uncompressed media: binary column in → parsed header + pixel/sample
tensor out — not a deterministic fake.

Format pinning: tests validate against HANDCRAFTED golden bytes (not
just encode→decode self-consistency), so an encoder/decoder bug cannot
cancel itself out.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP: 24bpp, BI_RGB (uncompressed), bottom-up ------------------------

_BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP.

    Rows are stored bottom-up in BGR order, each padded to a 4-byte
    boundary — the two details that break naive implementations.
    """
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    image_size = stride * h
    file_size = _BMP_HEADER_SIZE + image_size

    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)

    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER_SIZE)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40,  # header size
        w,
        h,  # positive height = bottom-up
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB (no compression)
        image_size,
        2835,  # ~72 DPI in pixels/metre
        2835,
        0,
        0,
    )
    return file_header + info_header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an (H, W, 3) uint8 RGB array.

    A real (if minimal) parser: validates magic, header size, bit
    depth, and compression; honors the pixel-data offset, bottom-up
    vs top-down height sign, BGR order, and row padding.
    """
    if len(data) < _BMP_HEADER_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (_, _file_size, _, _, offset) = struct.unpack("<2sIHHI", data[:14])
    (
        hdr_size,
        w,
        h_signed,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _used,
        _important,
    ) = struct.unpack("<IiiHHIIiiII", data[14:54])
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size})")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported (bpp={bpp}, compression={compression})"
        )
    bottom_up = h_signed > 0
    h = abs(h_signed)
    row_bytes = w * 3
    stride = (row_bytes + 3) // 4 * 4
    px = data[offset : offset + stride * h]
    if len(px) < stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


# --- WAV: RIFF/WAVE, mono 16-bit PCM --------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a canonical RIFF/WAVE PCM stream."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_pcm16 expects 1-D int16 samples")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # audio format: PCM
        1,  # channels: mono
        sample_rate,
        sample_rate * 2,  # byte rate = rate * channels * 2
        2,  # block align
        16,  # bits per sample
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(data), b"WAVE")
    return riff + fmt + data_hdr + data


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit PCM RIFF/WAVE stream → (samples, rate).

    Walks the chunk list (so streams with extra chunks, e.g. LIST,
    still parse) and validates format tag / channel count / bit depth.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, csize = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only mono 16-bit PCM supported (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            if len(body) != csize:
                raise ValueError("truncated data chunk")
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return samples, rate

"""Multimodal columns: opaque binary payloads + typed metadata.

Graft requirement: treat image/audio/video as ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over ``mapInPandas``. The actual
codec libraries are NOT in this container, so the decode kernels are
STUBBED: a deterministic fake decoder parses this module's own tiny
header format, and the real-codec entry points raise
``NotImplementedError`` — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.

Fake payload format (deterministic, produced by :func:`fake_payload`):
``b"LMIMG" + width:uint16 + height:uint16 + channels:uint8 + pixels``
(pixels = (w*h*c) bytes, generated from md5 stream).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"LMIMG"

DECODED_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "mean_pixel double, n_bytes long"
)

THUMB_SCHEMA = "media_id long, thumb_w int, thumb_h int, thumb binary"


def fake_payload(media_id: int, width: int = 8, height: int = 6, channels: int = 3) -> bytes:
    """Deterministic fake 'image' bytes for tests/benchmarks."""
    n = width * height * channels
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{media_id}:{i}".encode()).digest()
        i += 1
    return MAGIC + struct.pack("<HHB", width, height, channels) + bytes(out[:n])


def _decode_one(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    if payload[:5] != MAGIC:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "only the LMIMG fake-payload format is decodable"
        )
    if len(payload) < 10:
        raise ValueError(
            f"corrupt LMIMG payload: {len(payload)} bytes, header needs 10"
        )
    w, h, c = struct.unpack("<HHB", payload[5:10])
    need = 10 + w * h * c
    if len(payload) < need:
        raise ValueError(
            f"corrupt LMIMG payload: declared {w}x{h}x{c} needs {need} bytes, got {len(payload)}"
        )
    px = np.frombuffer(payload[10 : 10 + w * h * c], dtype=np.uint8)
    return w, h, c, px.reshape(h, w, c)


def decode_stage(media: DataFrame) -> DataFrame:
    """(media_id, payload binary) -> typed metadata + mean pixel.

    Arrow-batched mapInPandas; per-batch numpy, no per-row Python in
    the pixel math. The per-PAYLOAD Python loop inside the batch is
    deliberate: opaque variable-length binary blobs can't vectorize
    across rows (every real codec — PIL, ffmpeg — is called once per
    payload anyway), and the per-row cost is dominated by the decode
    itself; the Arrow transfer and the pixel math stay batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, px = _decode_one(bytes(payload))
                rows.append((int(mid), w, h, c, float(px.mean()), len(payload)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "mean_pixel", "n_bytes"],
            )

    return media.mapInPandas(gen, schema=DECODED_SCHEMA)


def resize_stage(media: DataFrame, out_w: int = 4, out_h: int = 3) -> DataFrame:
    """Nearest-neighbor 'resize' of the fake format (real codecs would
    plug in here); returns thumbnails as binary."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, px = _decode_one(bytes(payload))
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                thumb = px[np.ix_(ys, xs)].tobytes()
                rows.append((int(mid), out_w, out_h, thumb))
            yield pd.DataFrame(rows, columns=["media_id", "thumb_w", "thumb_h", "thumb"])

    return media.mapInPandas(gen, schema=THUMB_SCHEMA)


def frame_sample_stage(media: DataFrame, every: int = 2) -> DataFrame:
    """'Video' frame sampling stub: treats the payload as a stack of
    frames (h rows = frames) and keeps every Nth — the mapInPandas
    plumbing for a real ffmpeg-backed sampler."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, px = _decode_one(bytes(payload))
                kept = px[::every]
                rows.append((int(mid), len(kept), kept.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "n_frames", "frames"])

    return media.mapInPandas(gen, schema="media_id long, n_frames int, frames binary")


def real_decode_stage(media: DataFrame) -> DataFrame:  # pragma: no cover
    """Entry point for real codecs (PIL/ffmpeg) — not available here."""
    raise NotImplementedError("image/audio codec libraries are not installed in this container")

"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Real decode libraries (PIL, ffmpeg, torchaudio) are NOT in this container, so
the codec layer is split:

  - `FakeCodec` — a deterministic toy format (packed header + xxhash-derived
    payload) used by default. It exercises the REAL Spark plumbing: schemas,
    Arrow batch shapes, mapInPandas fan-out, partition-preserving column ops.
  - `RealCodec` — clearly-marked stub raising NotImplementedError with the
    exact dependency needed; swap in at deploy time behind the same interface.

Operators (all `mapInPandas` — iterator-of-batches, so one task streams many
Arrow batches without materializing the binary column twice):

  decode_media      binary payload -> typed metadata (width/height/channels/
                    duration/n_frames) per kind
  extract_features  payload -> fixed-length float feature vector (deterministic)
  resize_images     payload -> re-encoded payload at new dims (1:1)
  sample_frames     video payload -> one row per sampled frame (1:N fan-out)

Schema contract for a media table:
  (media_id: string, kind: string in {image,audio,video}, payload: binary)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"FAKE"
_HDR = struct.Struct("<4s4sIIII")  # magic, kind, a, b, c, payload_len

DECODED_SCHEMA = (
    "media_id string, kind string, width int, height int, channels int, "
    "duration_ms int, n_frames int, payload_bytes long"
)
FEATURES_SCHEMA = "media_id string, kind string, features array<double>"
FRAMES_SCHEMA = (
    "media_id string, frame_idx int, width int, height int, frame binary"
)


def encode_fake(kind: str, a: int, b: int, c: int, seed: int) -> bytes:
    """Deterministic toy payload: header + pseudo-random body.

    image: a=width, b=height, c=channels; audio: a=sample_rate, b=duration_ms,
    c=channels; video: a=width, b=height, c=n_frames.
    """
    body_len = min(a * b * c % 4096 + 64, 4096)
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=body_len, dtype=np.uint8).tobytes()
    return _HDR.pack(MAGIC, kind[:4].ljust(4).encode(), a, b, c, len(body)) + body


class FakeCodec:
    """Deterministic decoder for the toy format (the sandbox default)."""

    @staticmethod
    def decode_header(payload: bytes) -> tuple[str, int, int, int, int]:
        magic, kind, a, b, c, blen = _HDR.unpack_from(payload, 0)
        if magic != MAGIC:
            raise ValueError("not a FAKE payload")
        return kind.decode().strip(), a, b, c, blen

    @staticmethod
    def features(payload: bytes, dim: int = 16) -> np.ndarray:
        """Deterministic pseudo-features: byte-histogram folded to `dim`."""
        body = np.frombuffer(payload[_HDR.size :], dtype=np.uint8)
        hist = np.bincount(body % dim, minlength=dim).astype(np.float64)
        norm = np.linalg.norm(hist)
        return hist / norm if norm > 0 else hist


class RealCodec:
    """Deploy-time codec — STUB. Each method names its real dependency."""

    @staticmethod
    def decode_image(payload: bytes):
        raise NotImplementedError("requires Pillow: PIL.Image.open(io.BytesIO(payload))")

    @staticmethod
    def decode_audio(payload: bytes):
        raise NotImplementedError("requires soundfile/torchaudio")

    @staticmethod
    def sample_video_frames(payload: bytes, every_n: int):
        raise NotImplementedError("requires ffmpeg/pyav")


def decode_media(media: DataFrame) -> DataFrame:
    """(media_id, kind, payload) -> typed metadata row per item."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf.media_id, pdf.kind, pdf.payload):
                _, a, b, c, blen = FakeCodec.decode_header(bytes(payload))
                if kind == "image":
                    rows.append((mid, kind, a, b, c, None, None, len(payload)))
                elif kind == "audio":
                    rows.append((mid, kind, None, None, c, b, None, len(payload)))
                else:  # video
                    rows.append((mid, kind, a, b, None, None, c, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "channels",
                         "duration_ms", "n_frames", "payload_bytes"],
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """(media_id, kind, payload) -> (media_id, kind, features[dim])."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [FakeCodec.features(bytes(p), dim).tolist() for p in pdf.payload]
            yield pd.DataFrame(
                {"media_id": pdf.media_id, "kind": pdf.kind, "features": feats}
            )

    return media.mapInPandas(_feat, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode image payloads at new dimensions (1:1 row mapping)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf.payload:
                _, a, b, c, _ = FakeCodec.decode_header(bytes(p))
                # deterministic: seed from original dims so the fake "resample"
                # is a pure function of (payload, target dims)
                out_payloads.append(encode_fake("imag", width, height, c,
                                                seed=a * 31 + b))
            yield pd.DataFrame(
                {"media_id": pdf.media_id, "kind": pdf.kind, "payload": out_payloads}
            )

    return media.filter("kind = 'image'").mapInPandas(
        _resize, schema="media_id string, kind string, payload binary"
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video payload -> one row per sampled frame (1:N Arrow fan-out)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf.media_id, pdf.payload):
                _, w, h, n_frames, _ = FakeCodec.decode_header(bytes(p))
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        (mid, idx, w, h, encode_fake("imag", w, h, 3, seed=idx))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "width", "height", "frame"]
            )

    return media.filter("kind = 'video'").mapInPandas(_frames, schema=FRAMES_SCHEMA)


def make_media_df(spark, n: int = 30, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            payload = encode_fake("imag", int(rng.integers(16, 512)),
                                  int(rng.integers(16, 512)), 3, seed=i)
        elif kind == "audio":
            payload = encode_fake("audi", 16000, int(rng.integers(100, 60000)),
                                  2, seed=i)
        else:
            payload = encode_fake("vide", 640, 360, int(rng.integers(30, 300)),
                                  seed=i)
        rows.append((f"m{i:04d}", kind, bytearray(payload)))
    return spark.createDataFrame(rows, "media_id string, kind string, payload binary")

"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata — the Spark-side plumbing for a training-data pipeline.

Decode/resize/frame-sample run as Arrow-batched ``mapInPandas``
operators with real schemas, partitioning, and batch shapes. Codec
modes (``decode_stub``):

- ``'deterministic'`` — seeded fake feature from the bytes' sha256,
  so the full distributed path is testable for ANY media kind;
- ``'decode'`` — REAL decode for image rows via the dependency-free
  BMP/PPM codec (``functions/imagecodec.py``) and for audio rows via
  the RIFF/PCM WAV codec (``functions/audiocodec.py``): actual
  pixels/samples -> feature stats / nearest-neighbor resize. Video
  keeps the deterministic stub (no ffmpeg in this container); an
  image/audio row in an undecodable format raises
  ``UnsupportedImageError``/``UnsupportedAudioError`` — the exact
  plug points for PIL/ffmpeg;
- ``'raise'`` — surface the missing-codec error unconditionally.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epstein_pipeline_spark.functions.audiocodec import (
    audio_feature,
    decode_wav,
    encode_wav,
)
from epstein_pipeline_spark.functions.imagecodec import (
    decode_image,
    encode_bmp,
    encode_png,
    image_feature,
    resize_nearest,
)

MEDIA_SCHEMA = (
    "media_id string, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: seeded by content hash, unit-norm.
    Replace with a real encoder via the same signature."""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    v = rng.normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(
    media: DataFrame, dim: int = 64, decode_stub: str = "deterministic"
) -> DataFrame:
    """binary content -> feature vector, per Arrow batch.

    The Spark-side contract (schema, mapInPandas batching, column
    pruning of the heavy binary column after use) is real; only the
    codec is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            if decode_stub == "decode":

                def real(c, k):
                    if k == "image":
                        return image_feature(decode_image(bytes(c or b"")), dim)
                    if k == "audio":
                        return audio_feature(*decode_wav(bytes(c or b"")), dim)
                    return _fake_feature(bytes(c) if c is not None else b"", dim)

                feats = [real(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
            else:
                feats = [
                    _fake_feature(bytes(c) if c is not None else b"", dim)
                    for c in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    timestamp (codec stubbed: frame bytes = sha256 of (content, ts))."""
    with_ts = media.filter(F.col("kind") == "video").select(
        "media_id",
        "content",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                hashlib.sha256(bytes(c) + int(t).to_bytes(8, "little")).digest()
                for c, t in zip(pdf["content"], pdf["frame_ms"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "frame_ms": pdf["frame_ms"], "frame": frames}
            )

    return with_ts.mapInPandas(run, schema="media_id string, frame_ms long, frame binary")


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes(rng.randint(0, 256, rng.randint(64, 512), dtype=np.uint8))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                content,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.randint(16, 512)) if kind == "image" else None,
                int(rng.randint(16, 512)) if kind == "image" else None,
                int(rng.randint(1000, 10000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_bmp_media(spark, n: int = 16, seed: int = 42) -> DataFrame:
    """Deterministic REAL-image media table: each row is a valid
    24-bit BMP (solid color with one gradient stripe) whose pixel
    content is a pure function of the row index — so decoded feature
    stats and resized outputs are checkable against planted values."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.randint(5, 40)), int(rng.randint(5, 40))
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        rgb[:, :] = [(i * 37) % 256, (i * 91) % 256, (i * 53) % 256]
        rgb[:, 0, 0] = np.linspace(0, 255, h).astype(np.uint8)  # stripe
        rows.append((f"bmp{i:04d}", "image", encode_bmp(rgb), "image/bmp", w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_png_media(spark, n: int = 16, seed: int = 42) -> DataFrame:
    """Deterministic REAL-image media table in PNG form: same planted
    pixel rule as ``synth_bmp_media`` (so the two tables' decoded
    features are directly comparable), but DEFLATE-compressed through
    the PNG writer, cycling the scanline filter type per row so every
    unfilter path (None/Sub/Up/Average/Paeth) executes in the
    pipeline, not just in codec unit tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.randint(5, 40)), int(rng.randint(5, 40))
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        rgb[:, :] = [(i * 37) % 256, (i * 91) % 256, (i * 53) % 256]
        rgb[:, 0, 0] = np.linspace(0, 255, h).astype(np.uint8)  # stripe
        rows.append(
            (f"png{i:04d}", "image", encode_png(rgb, filter_type=i % 5),
             "image/png", w, h, None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_wav_media(spark, n: int = 16, seed: int = 42) -> DataFrame:
    """Deterministic REAL-audio media table: each row is a valid PCM16
    WAV (a pure sine at a row-dependent frequency, amplitude, channel
    count and rate) whose sample content is a pure function of the row
    index — so decoded feature stats are checkable against planted
    values (rms of a sine = amplitude/sqrt(2), spectral energy
    concentrates in the tone's bin)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rate = [8000, 16000, 22050, 44100][i % 4]
        n_ch = 1 + (i % 2)
        dur_ms = int(rng.randint(50, 400))
        freq = 100.0 + 37.0 * i
        amp = 0.2 + 0.05 * (i % 10)
        t = np.arange(int(rate * dur_ms / 1000)) / rate
        wave = amp * np.sin(2 * np.pi * freq * t)
        samples = np.stack([wave] * n_ch, axis=1)
        rows.append(
            (f"wav{i:04d}", "audio", encode_wav(samples, rate), "audio/wav",
             None, None, dur_ms)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, decode_stub: str = "deterministic"
) -> DataFrame:
    """Image-resize plumbing: (media_id, width, height, resized:binary).

    The Spark-side contract is real — kind filter, metadata columns,
    Arrow batching, bounded output size (the resized payload is
    width*height bytes stubbed / width*height*3 RGB decoded, never the
    original). ``decode_stub='decode'`` runs a REAL nearest-neighbor
    resample over BMP/PPM-decoded pixels (imagecodec.py);
    ``'deterministic'`` keeps the sha256-seeded byte tile;
    ``'raise'`` surfaces the missing-codec error instead."""

    def _fake_resize(content: bytes) -> bytes:
        seed = hashlib.sha256(content).digest()
        reps = (width * height) // len(seed) + 1
        return (seed * reps)[: width * height]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real image resize requires PIL — not in this container"
                )
            if decode_stub == "decode":
                resized = [
                    resize_nearest(
                        decode_image(bytes(c or b"")), width, height
                    ).tobytes()
                    for c in pdf["content"]
                ]
            else:
                resized = [
                    _fake_resize(bytes(c) if c is not None else b"")
                    for c in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "resized": resized,
                }
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(run, schema="media_id string, width int, height int, resized binary")

"""Dependency-free audio codec for the multimodal decode path — the
audio twin of ``imagecodec.py``.

The container has no ffmpeg/soundfile, so the general codec stays a
documented plug point (``operators/multimodal.py``) — but canonical
RIFF/WAVE PCM is parseable with nothing beyond ``struct`` + numpy,
which lets the decode -> feature pipeline run against REAL sample
bytes instead of a hash-seeded fake:

- WAV (RIFF/WAVE), PCM 16-bit signed little-endian (format tag 1) or
  PCM 8-bit unsigned, any channel count / sample rate; chunks are
  walked properly (a ``LIST``/``fact`` chunk before ``data`` — common
  in real encoder output — must not break parsing).

``decode_wav`` dispatches on the RIFF magic and raises
``UnsupportedAudioError`` for anything else (MP3, float WAV, ADPCM…)
— the exact spot a real codec (ffmpeg/soundfile) plugs in with the
same (samples, sample_rate) ndarray contract.

Reference parity note: the reference treats media attachments as
opaque downloads (downloaders/*, no audio decode) — this module is
part of the training-data-pipeline extension surface, not reference
parity.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAudioError(NotImplementedError):
    """Raised for formats the dependency-free codec cannot decode —
    plug a real codec (ffmpeg/soundfile) in at ``decode_wav``."""


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """bytes -> ((n_samples, n_channels) float64 in [-1, 1], rate).

    PCM16/PCM8 RIFF/WAVE only (see module docstring); anything else
    raises UnsupportedAudioError."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise UnsupportedAudioError("not a RIFF/WAVE file")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(content):
        cid = content[off : off + 4]
        (size,) = struct.unpack_from("<I", content, off + 4)
        body = content[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
            break  # data is what we came for; fmt always precedes it
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16:
        raise UnsupportedAudioError("missing/short fmt chunk")
    if data is None:
        raise UnsupportedAudioError("missing data chunk")
    tag, n_ch, rate, _brate, _balign, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 1 or n_ch < 1 or bits not in (8, 16):
        raise UnsupportedAudioError(
            f"only PCM8/PCM16 WAV supported (format_tag={tag}, bits={bits})"
        )
    if bits == 16:
        raw = np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.float64)
        samples = raw / 32768.0
    else:
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        samples = (raw - 128.0) / 128.0
    n = (len(samples) // n_ch) * n_ch
    return samples[:n].reshape(-1, n_ch), int(rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples, n_channels) float in [-1, 1] -> PCM16 WAV bytes
    (the test-fixture twin of ``decode_wav``)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_feature(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Real sample feature, the audio twin of ``image_feature``:
    global stats (rms, peak, mean, zero-crossing rate, log duration)
    + an 8-bin temporal RMS envelope + an 8-bin magnitude-spectrum
    profile (rFFT of the mono mix — energy distribution over
    frequency, the crudest honest spectral signature), tiled/truncated
    to ``dim`` and unit-normed — the same output contract as the stub
    feature, computed from decoded samples."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    mean = float(mono.mean())
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    dur = float(np.log1p(n / max(rate, 1)))
    edges = (np.arange(9) * n) // 8
    env = np.array(
        [
            np.sqrt(np.mean(mono[edges[i] : max(edges[i + 1], edges[i] + 1)] ** 2))
            for i in range(8)
        ]
    )
    mag = np.abs(np.fft.rfft(mono))
    fe = (np.arange(9) * len(mag)) // 8
    spec = np.array(
        [mag[fe[i] : max(fe[i + 1], fe[i] + 1)].mean() for i in range(8)]
    )
    s = spec.sum()
    spec = spec / s if s > 0 else spec
    base = np.concatenate([[rms, peak, mean, zcr, dur], env, spec])  # 21 dims
    reps = dim // len(base) + 1
    v = np.tile(base, reps)[:dim].astype(np.float32)
    nrm = float(np.linalg.norm(v))
    return v / nrm if nrm > 0 else v

"""RIFF/WAVE PCM codec (public Microsoft/IBM spec) — the uncompressed
audio interchange format real corpora carry alongside MP3.

- ``decode_wav``: chunk-framed parse (fmt / data, unknown chunks
  skipped), PCM 8/16/24/32-bit int and 32-bit float, any channel
  count. Returns (sample_rate, float32 array (n_samples, n_channels)
  in [-1, 1]).
- ``encode_wav``: 16-bit PCM writer for round-trip tests and sinks.

Compressed audio (MP3/AAC) stays behind the strict-mode policy in
sources/multimodal.py — no codec library in this container.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Corrupt or truncated WAV stream."""


class UnsupportedWavError(WavError):
    """Valid WAV, but a compression format this decoder does not cover
    (ADPCM, a-law/mu-law, ...)."""


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Any structural parse failure on the untrusted byte stream
    surfaces as ``WavError`` (``UnsupportedWavError`` for valid-but-
    uncovered formats), never a raw numpy/struct exception — the
    multimodal policy path catches the codec's own error types."""
    try:
        return _decode_impl(data)
    except WavError:
        raise
    except (struct.error, ValueError, IndexError) as e:
        raise WavError(f"corrupt WAV stream: {e}") from e


def _decode_impl(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[pos: pos + 8])
        body = data[pos + 8: pos + 8 + clen]
        if len(body) < clen:
            raise WavError(f"truncated {cid!r} chunk")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, nch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (tag, nch, rate, bits)
        elif cid == b"data":
            samples = body
    if fmt is None or samples is None:
        raise WavError("missing fmt/data chunk")
    tag, nch, rate, bits = fmt
    if tag == 1:  # integer PCM
        if bits == 8:  # unsigned
            a = (np.frombuffer(samples, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            a = np.frombuffer(samples, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(samples, np.uint8).reshape(-1, 3)
            v = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            a = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            a = np.frombuffer(samples, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise UnsupportedWavError(f"{bits}-bit integer PCM")
    elif tag == 3 and bits == 32:  # IEEE float
        a = np.frombuffer(samples, "<f4").astype(np.float32)
    else:
        raise UnsupportedWavError(f"format tag {tag} ({bits}-bit)")
    if nch < 1:
        raise WavError("zero channels")
    n = a.shape[0] // nch
    return rate, np.ascontiguousarray(a[: n * nch].reshape(n, nch))


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """float array in [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

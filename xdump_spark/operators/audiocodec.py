"""Pure-numpy audio codec kernels (WAV/PCM) for the multimodal operators.

Companion to imagecodec.py: the container has no audio libraries, but
RIFF/WAVE is a stdlib-parseable container, so the audio path is REAL —
decode, resample, and feature-extract operate on actual samples.
Coverage, honestly stated:

* **WAV decode** — PCM integer (8-bit unsigned, 16/24/32-bit signed)
  and IEEE float32, any channel count; samples normalized to float64
  in [-1, 1]. Compressed codecs (MP3/AAC/μ-law...) raise
  ``UnsupportedAudioError``.
* **WAV encode** — PCM16, any channel count.
* **Resample** — linear interpolation on a pixel-center grid:
  deterministic integer/float math, no windowed-sinc dependency; good
  enough for feature pipelines (a polyphase filter would slot into the
  same (samples, sr) → (samples, sr') kernel signature).
* **Features** — log-magnitude spectrum (numpy rfft) averaged into
  ``dim`` bands, mean-centered + L2-normalized: a real spectral
  descriptor that feeds cosine_topk/semantic_dedup directly.

Scale note: kernels are per-blob CPU work invoked from Arrow batches in
``mapInPandas``; parallelism is across blobs, the axis that matters at
100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedAudioError",
    "decode_wav",
    "encode_wav",
    "resample_linear",
    "audio_stats",
    "spectral_feature",
]


class UnsupportedAudioError(ValueError):
    """Raised for containers/encodings outside documented coverage."""


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 (n, channels) in [-1, 1], rate).

    Walks RIFF chunks (fmt/data can be in any order, with extension
    chunks between); PCM (format 1) at 8/16/24/32 bit and IEEE float32
    (format 3) are supported, plus WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    wrapping either."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise UnsupportedAudioError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedAudioError("WAV missing fmt/data chunks")
    audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt == 0xFFFE and len(fmt) >= 26:
        # EXTENSIBLE: the real format is the first 2 bytes of the GUID
        (audio_fmt,) = struct.unpack("<H", fmt[24:26])
    if channels < 1:
        raise UnsupportedAudioError("WAV with zero channels")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.int64)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise UnsupportedAudioError(f"PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits != 32:
            raise UnsupportedAudioError(f"float WAV bit depth {bits}")
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise UnsupportedAudioError(f"WAV format tag {audio_fmt} (PCM/float only)")
    n = len(x) - len(x) % channels
    return x[:n].reshape(-1, channels), int(rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) float in [-1, 1] → PCM16 WAV bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample (n, ch) → (round(n·dst/src), ch),
    sample-center grid — deterministic, no filter taps."""
    if src_rate == dst_rate:
        return samples
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[0]
    m = max(1, int(round(n * dst_rate / src_rate)))
    src_pos = (np.arange(m) + 0.5) * n / m - 0.5
    src_pos = np.clip(src_pos, 0, n - 1)
    lo = np.floor(src_pos).astype(np.int64)
    hi = np.minimum(lo + 1, n - 1)
    frac = (src_pos - lo)[:, None]
    return arr[lo] * (1.0 - frac) + arr[hi] * frac


def audio_stats(samples: np.ndarray, rate: int) -> dict:
    """duration_s, rms, peak, zero-crossing rate — over the channel-mean
    (mono mix) signal, rounded for cross-platform determinism."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 2:
        mono = arr.mean(axis=1)
    else:
        mono = arr
    n = len(mono)
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "peak": 0.0, "zcr": 0.0}
    zc = np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
    return {
        "duration_s": round(n / rate, 6),
        "rms": round(float(np.sqrt(np.mean(mono**2))), 6),
        "peak": round(float(np.abs(mono).max()), 6),
        "zcr": round(zc / max(1, n - 1), 6),
    }


def spectral_feature(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """``dim``-float descriptor: log-magnitude rfft spectrum of the mono
    mix averaged into ``dim`` equal frequency bands, mean-centered and
    L2-normalized. Deterministic; rate is unused by the band split (the
    bands are relative) but kept in the signature so a mel-scaled
    variant can slot in."""
    arr = np.asarray(samples, dtype=np.float64)
    mono = arr.mean(axis=1) if arr.ndim == 2 else arr
    if len(mono) < 2:
        return np.zeros(dim, dtype=np.float32)
    mag = np.abs(np.fft.rfft(mono))
    logmag = np.log1p(mag)
    bands = np.array_split(logmag, dim)
    v = np.array([b.mean() if len(b) else 0.0 for b in bands], dtype=np.float32)
    v = v - v.mean()
    n = float(np.linalg.norm(v))
    return v / n if n else v

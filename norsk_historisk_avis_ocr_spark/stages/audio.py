"""Minimal WAV (RIFF/PCM) decode — stdlib ``wave`` + numpy.

De-stubs the audio branch of ``operators/multimodal.py``: WAV payloads
get REAL metadata (channel count, sample rate, frame count, duration)
and a real deterministic feature vector (unit-normalized 16-bin
histogram of absolute 16-bit amplitude), the audio analog of the image
paths' grayscale histogram. Compressed audio (mp3/ogg/aac) stays out —
no codecs in this container; a non-PCM or truncated RIFF raises
``ValueError`` so callers quarantine (the same loud-failure contract as
the image codecs).

``encode_wav`` writes 16-bit PCM for test/bench input.
"""

from __future__ import annotations

import io
import wave

import numpy as np

FEATURE_BINS = 16


def wav_metadata(data: bytes) -> dict:
    """Header-only WAV probe: rate/channels/frames/duration WITHOUT
    reading the PCM payload — what metadata-only consumers (frame
    sampling, resize plumbing) should use; O(header), not O(bytes)."""
    try:
        with wave.open(io.BytesIO(data)) as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"bad WAV payload: {exc}") from exc
    if rate <= 0 or n_channels <= 0:
        raise ValueError("bad WAV header (zero rate/channels)")
    if sampwidth != 2:
        raise ValueError(
            f"unsupported WAV sample width {sampwidth * 8}-bit; "
            "16-bit PCM only")
    return {
        "sample_rate": int(rate),
        "n_channels": int(n_channels),
        "n_frames": int(n_frames),
        "duration_ms": int(n_frames * 1000 // rate),
    }


def decode_wav(data: bytes) -> dict:
    """WAV bytes → samples + typed metadata.

    Returns ``{"samples": (n_frames, n_channels) int16 array,
    "sample_rate": int, "n_channels": int, "n_frames": int,
    "duration_ms": int}``. 16-bit PCM only (8/24/32-bit and float PCM
    raise — supporting them is a widening, not a redesign)."""
    try:
        with wave.open(io.BytesIO(data)) as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
            if sampwidth != 2:
                raise ValueError(
                    f"unsupported WAV sample width {sampwidth * 8}-bit; "
                    "16-bit PCM only")
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"bad WAV payload: {exc}") from exc
    if rate <= 0 or n_channels <= 0:
        raise ValueError("bad WAV header (zero rate/channels)")
    samples = np.frombuffer(raw, dtype="<i2")
    n_frames = len(samples) // n_channels  # trust the data, not the header
    samples = samples[:n_frames * n_channels].reshape(n_frames, n_channels)
    return {
        "samples": samples,
        "sample_rate": int(rate),
        "n_channels": int(n_channels),
        "n_frames": int(n_frames),
        "duration_ms": int(n_frames * 1000 // rate),
    }


def amplitude_histogram(samples: np.ndarray,
                        bins: int = FEATURE_BINS) -> list[float]:
    """Unit-normalized histogram of |amplitude| over ``bins`` equal bands
    of the 16-bit range — the audio analog of the image legs' grayscale
    histogram feature (deterministic, order-insensitive)."""
    if samples.size == 0:
        return [0.0] * bins
    mag = np.abs(samples.astype(np.int32)).ravel()
    band = max(1, 32768 // bins)  # equal bands of the 16-bit magnitude range
    idx = np.minimum(mag // band, bins - 1)
    hist = np.bincount(idx, minlength=bins).astype(np.float64)
    norm = float(np.sqrt((hist * hist).sum())) or 1.0
    return [float(v / norm) for v in hist]


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n_frames,) or (n_frames, n_channels) int16 → WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()

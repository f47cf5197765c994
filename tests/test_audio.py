"""PCM WAV decode (stdlib wave): the audio branch of decode_media is
REAL — true frame counts/durations and amplitude-histogram features;
compressed/non-PCM RIFF degrades to the stub."""

import numpy as np
import pytest

from norsk_historisk_avis_ocr_spark.operators.multimodal import (
    decode_media, frame_samples, resize_media, sniff_media_type,
)
from norsk_historisk_avis_ocr_spark.stages.audio import (
    amplitude_histogram, decode_wav, encode_wav,
)


def _tone(n=16000, rate=16000, freq=440, amp=12000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_wav_roundtrip_and_metadata():
    samples = _tone(n=8000)
    data = encode_wav(samples, sample_rate=16000)
    assert sniff_media_type(data) == "audio/wav"
    wav = decode_wav(data)
    assert wav["sample_rate"] == 16000
    assert wav["n_channels"] == 1
    assert wav["n_frames"] == 8000
    assert wav["duration_ms"] == 500
    assert (wav["samples"].ravel() == samples).all()
    # stereo
    stereo = np.stack([samples, -samples], axis=1)
    wav2 = decode_wav(encode_wav(stereo, sample_rate=8000))
    assert wav2["n_channels"] == 2 and wav2["n_frames"] == 8000
    assert (wav2["samples"] == stereo).all()


def test_amplitude_histogram_properties():
    h = amplitude_histogram(_tone().reshape(-1, 1))
    assert len(h) == 16
    assert abs(sum(v * v for v in h) - 1.0) < 1e-9
    silent = amplitude_histogram(np.zeros((100, 1), dtype=np.int16))
    assert silent[0] == 1.0 and sum(silent[1:]) == 0.0
    assert amplitude_histogram(np.zeros((0, 1), dtype=np.int16)) == [0.0] * 16


def test_decode_media_wav_is_real():
    data = encode_wav(_tone(n=4000), sample_rate=8000)
    meta = decode_media(data)
    assert meta["width"] is None and meta["height"] is None
    assert meta["n_frames"] == 4000
    assert meta["duration_ms"] == 500
    assert abs(sum(v * v for v in meta["features"]) - 1.0) < 1e-6
    # truncated/non-PCM RIFF degrades to the deterministic stub
    broken = decode_media(data[:20])
    assert broken["width"] is not None and broken["duration_ms"] is None


def test_wav_loud_failures():
    with pytest.raises(ValueError, match="WAV"):
        decode_wav(b"RIFFjunkjunkjunk")
    # 8-bit PCM: unsupported width must raise, not mis-decode
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes(100))
    with pytest.raises(ValueError, match="16-bit"):
        decode_wav(buf.getvalue())


def test_audio_operators_on_spark(spark):
    """Audio flows through the multimodal operators: frame sampling keys
    on the REAL duration (one window per every_ms) and resize emits a
    null-raster row instead of crashing on dimensionless audio."""
    data = encode_wav(_tone(n=16000), sample_rate=16000)  # 1000 ms
    df = spark.createDataFrame([("a1", bytearray(data))],
                               "url string, payload binary")
    frames = frame_samples(df, every_ms=250, bytes_col="payload").collect()
    assert [(r.frame_idx, r.t_offset_ms) for r in frames] == \
        [(i, i * 250) for i in range(5)]  # 1000 ms // 250 + 1 windows
    r = resize_media(df, bytes_col="payload").first()
    assert r.width is None and r.height is None and r.resized is None

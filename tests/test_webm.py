"""WebM/EBML container metadata parsing: real track dimensions and
duration for the video multimodal branch (frame decode stays stubbed —
no VP8/VP9 codecs in the container)."""

import pytest

from norsk_historisk_avis_ocr_spark.operators.multimodal import (
    decode_media, frame_samples, sniff_media_type,
)
from norsk_historisk_avis_ocr_spark.stages.webm import (
    encode_webm_stub, parse_webm_metadata,
)


def test_metadata_roundtrip():
    data = encode_webm_stub(1280, 720, duration_ms=4200)
    assert sniff_media_type(data) == "video/webm"
    meta = parse_webm_metadata(data)
    assert meta["width"] == 1280 and meta["height"] == 720
    assert meta["duration_ms"] == 4200
    assert meta["n_video_tracks"] == 1


def test_nondefault_timestamp_scale():
    # 100 µs ticks: duration element value scales accordingly
    data = encode_webm_stub(320, 240, duration_ms=1500, scale_ns=100_000)
    meta = parse_webm_metadata(data)
    assert meta["duration_ms"] == 1500


def test_loud_or_empty_on_bad_input():
    with pytest.raises(ValueError, match="EBML"):
        parse_webm_metadata(b"not ebml at all")
    data = encode_webm_stub(640, 480, duration_ms=1000)
    # a segment truncated before its children either raises or yields
    # all-None metadata — it must never fabricate values
    try:
        meta = parse_webm_metadata(data[:10])
        assert meta["width"] is None and meta["duration_ms"] is None
    except ValueError:
        pass
    # truncation INSIDE an element body must raise (child overrun)
    with pytest.raises(ValueError):
        parse_webm_metadata(data[:len(data) - 3])


def test_decode_media_webm_metadata_is_real():
    data = encode_webm_stub(1920, 1080, duration_ms=2500)
    meta = decode_media(data)
    assert (meta["width"], meta["height"]) == (1920, 1080)
    assert meta["duration_ms"] == 2500 and meta["n_frames"] is None
    assert abs(sum(v * v for v in meta["features"]) - 1.0) < 1e-6
    # malformed EBML degrades to the deterministic stub
    broken = decode_media(b"\x1aE\xdf\xa3garbage")
    assert broken["duration_ms"] is None and broken["width"] >= 256


def test_webm_frame_sampling_uses_duration(spark):
    data = encode_webm_stub(640, 360, duration_ms=3000)
    df = spark.createDataFrame([("v1", bytearray(data))],
                               "url string, payload binary")
    frames = frame_samples(df, every_ms=1000, bytes_col="payload").collect()
    assert [(r.frame_idx, r.t_offset_ms) for r in frames] == \
        [(0, 0), (1, 1000), (2, 2000), (3, 3000)]

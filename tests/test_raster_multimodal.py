"""Spark wiring of the raster layout path (L1-L4) and multimodal plumbing."""

import numpy as np
import pytest

from norsk_historisk_avis_ocr_spark.operators.multimodal import (
    MEDIA_FEATURE_DIM, media_features, sniff_media_type,
)
from norsk_historisk_avis_ocr_spark.operators.raster import segment_rasters


def _page_bytes():
    img = np.full((1200, 2000), 255, dtype=np.uint8)
    img[:, 712:715] = 0
    img[:, 1440:1443] = 0
    img[0:1200:2, 10:700] = 0
    img[0:1200:2, 730:1430] = 0
    img[0:1200:2, 1460:1990] = 0
    return img.tobytes(), 2000, 1200


def test_segment_rasters_geometry(spark):
    data, w, h = _page_bytes()
    df = spark.createDataFrame(
        [("p1", bytearray(data), w, h)],
        "page_id string, gray binary, width int, height int")
    got = segment_rasters(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r.boundaries == [0, 713, 1441, 2000]
    assert [b.x0 for b in r.column_boxes] == [0, 693, 1421]
    assert r.title_box is None


def test_segment_rasters_matches_local_library(spark):
    from norsk_historisk_avis_ocr_spark.stages.layout import (
        split_columns_geometry,
    )
    data, w, h = _page_bytes()
    local = split_columns_geometry(
        np.frombuffer(data, dtype=np.uint8).reshape(h, w))
    df = spark.createDataFrame(
        [("p1", bytearray(data), w, h)],
        "page_id string, gray binary, width int, height int")
    r = segment_rasters(df).first()
    assert r.boundaries == local["boundaries"]
    assert r.body_top == local["body_top"]


def test_sniff_media_type():
    assert sniff_media_type(b"\x89PNG\r\n") == "image/png"
    assert sniff_media_type(b"\xff\xd8\xffdata") == "image/jpeg"
    assert sniff_media_type(b"%PDF-1.4") == "application/pdf"
    assert sniff_media_type(b"whatever") == "application/octet-stream"


def test_media_features_plumbing(spark):
    df = spark.createDataFrame(
        [("u1", bytearray(b"\x89PNGabc")), ("u2", bytearray(b"%PDFxyz"))],
        "url string, html binary")
    got = {r.url: r for r in media_features(df).collect()}
    assert got["u1"].media_type == "image/png"
    assert got["u2"].media_type == "application/pdf"
    for r in got.values():
        assert len(r.features) == MEDIA_FEATURE_DIM
        norm = sum(v * v for v in r.features) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-3)
        assert r.width >= 256 and r.n_frames >= 1


def test_media_features_deterministic(spark):
    df = spark.createDataFrame([("a", bytearray(b"same-bytes")),
                                ("b", bytearray(b"same-bytes"))],
                               "url string, html binary")
    rows = media_features(df).collect()
    feats = {r.url: tuple(r.features) for r in rows}
    assert feats["a"] == feats["b"]


def test_frame_samples_one_to_many(spark):
    from norsk_historisk_avis_ocr_spark.operators.multimodal import (
        frame_samples,
    )
    df = spark.createDataFrame(
        [("v1", bytearray(b"\x1aE\xdf\xa3 webm-ish")),
         ("v2", bytearray(b"other payload"))],
        "url string, html binary")
    rows = frame_samples(df, every_ms=500).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    for u, frames in by_url.items():
        assert [f.frame_idx for f in sorted(frames, key=lambda x: x.frame_idx)] \
            == list(range(len(frames)))
        assert all(f.t_offset_ms == f.frame_idx * 500 for f in frames)
        assert len({f.frame for f in frames}) == len(frames)


def test_resize_media_clamps_aspect(spark):
    from norsk_historisk_avis_ocr_spark.operators.multimodal import (
        decode_media, resize_media,
    )
    df = spark.createDataFrame([("m1", bytearray(b"payload-bytes"))],
                               "url string, html binary")
    r = resize_media(df, max_side=512).first()
    meta = decode_media(b"payload-bytes")
    scale = min(1.0, 512 / max(meta["width"], meta["height"]))
    assert r.width == int(meta["width"] * scale)
    assert r.height == int(meta["height"] * scale)
    assert max(r.width, r.height) <= 512

"""X3 image-prep/encode loop: the reference's quality/downscale schedule
implemented offline against the in-tree JPEG codec
(``claude_vision_engine.py:98-127``; the X2 network call stays out of
scope)."""

import base64

import numpy as np
import pytest

from norsk_historisk_avis_ocr_spark.stages.jpeg import decode_jpeg_gray
from norsk_historisk_avis_ocr_spark.stages.visionprep import (
    adjust_contrast, encode_image_under_limit, prepare_image,
    resize_bilinear, sharpen,
)


def _page(h=300, w=400, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.int32).astype(np.uint8)


def test_prep_filters_shapes_and_ranges():
    img = _page()
    for out in (sharpen(img), adjust_contrast(img), prepare_image(img)):
        assert out.shape == img.shape and out.dtype == np.uint8
    flat = np.full((20, 20), 100, dtype=np.uint8)
    assert (sharpen(flat) == flat).all()          # sharpen fixes flat areas
    assert (adjust_contrast(flat) == flat).all()  # contrast fixes the mean
    # contrast 1.3 spreads values away from the mean
    two = np.full((10, 10), 100, dtype=np.uint8)
    two[:, 5:] = 150
    out = adjust_contrast(two)
    assert out.min() < 100 and out.max() > 150


def test_resize_bilinear_properties():
    img = _page(64, 96)
    small = resize_bilinear(img, 48, 32)
    assert small.shape == (32, 48)
    flat = np.full((40, 40), 77, dtype=np.uint8)
    assert (resize_bilinear(flat, 13, 29) == 77).all()
    # identity resize reproduces the image
    assert (resize_bilinear(img, 96, 64) == img).all()


def test_budget_loop_schedule():
    """Fits-at-95 returns immediately; a tight budget walks the quality
    ladder and then downscales ×0.8 with quality reset — the payload
    always fits and decodes."""
    img = _page(120, 160)
    easy = encode_image_under_limit(img, max_bytes=10**7)
    assert easy["quality"] == 95 and easy["n_attempts"] == 1
    assert easy["width"] == 160 and easy["height"] == 120

    tight = encode_image_under_limit(img, max_bytes=6000)
    assert tight["n_bytes"] <= 6000
    assert tight["n_attempts"] > 1
    # terminal quality is always a ladder rung (95, 85, ..., 55, 45)
    assert tight["quality"] in {95, 85, 75, 65, 55, 45}
    if (tight["width"], tight["height"]) != (160, 120):
        assert tight["width"] < 160 and tight["height"] < 120
        # a downscale means the full 6-rung ladder ran at least once
        assert tight["n_attempts"] >= 7
    decoded = decode_jpeg_gray(base64.standard_b64decode(
        tight["payload_b64"]))
    assert decoded.shape == (tight["height"], tight["width"])
    # the exact schedule: attempts before the first downscale walk
    # 95,85,75,65,55,45 — a budget between two rungs terminates mid-ladder
    mid = encode_image_under_limit(img, max_bytes=2500)
    assert mid["quality"] in {95, 85, 75, 65, 55, 45}

    with pytest.raises(ValueError, match="budget"):
        encode_image_under_limit(img, max_bytes=10)


def test_vision_payloads_operator(spark):
    from norsk_historisk_avis_ocr_spark.operators.multimodal import (
        vision_payloads,
    )
    from norsk_historisk_avis_ocr_spark.stages.png import encode_png
    img = _page(100, 140)
    df = spark.createDataFrame(
        [("p1", bytearray(encode_png(img))),
         ("p2", bytearray(b"not an image"))],
        "url string, png binary")
    rows = {r.url: r for r in vision_payloads(df, max_bytes=8000).collect()}
    ok = rows["p1"]
    assert ok.prep_error is None and ok.n_bytes <= 8000
    assert ok.media_type == "image/jpeg"
    decoded = decode_jpeg_gray(base64.standard_b64decode(ok.payload_b64))
    assert decoded.shape == (ok.height, ok.width)
    bad = rows["p2"]
    assert bad.prep_error is not None and bad.payload_b64 is None

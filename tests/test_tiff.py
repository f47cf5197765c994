"""Baseline TIFF codec: round-trips, byte orders, PackBits, photometric
inversion, strip handling, loud failure, and the raster-leg wiring (the
reference decodes newspaper scans from TIFF via PIL,
``tesseract_engine.py:133-144``)."""

import struct

import numpy as np
import pytest

from norsk_historisk_avis_ocr_spark.stages.tiff import (
    _unpackbits_decode, decode_tiff_gray, encode_tiff_gray,
)


def _gradient(h, w):
    y = np.arange(h).reshape(-1, 1)
    x = np.arange(w).reshape(1, -1)
    return ((y * 7 + x * 3) % 256).astype(np.uint8)


def _build_tiff(bo, tags, payload):
    """Hand-assemble a single-IFD TIFF with the given (tag, type, count,
    value-or-bytes) entries; out-of-line values land after the IFD."""
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    header = magic + struct.pack(bo + "I", 8)
    ifd = struct.pack(bo + "H", len(tags))
    extra = b""
    extra_off = 8 + 2 + 12 * len(tags) + 4
    for tag, typ, count, value in tags:
        if isinstance(value, bytes):
            ifd += struct.pack(bo + "HHII", tag, typ, count,
                               extra_off + len(extra) + len(payload))
            extra += value
        elif typ == 3:
            ifd += struct.pack(bo + "HHI", tag, typ, count) \
                + struct.pack(bo + "H", value) + b"\x00\x00"
        else:
            ifd += struct.pack(bo + "HHII", tag, typ, count, value)
    ifd += struct.pack(bo + "I", 0)
    # payload sits right after the IFD; strip offset tags must match
    return header + ifd + payload + extra


def test_roundtrip_exact():
    img = _gradient(33, 47)
    assert (decode_tiff_gray(encode_tiff_gray(img)) == img).all()


def test_big_endian_and_white_is_zero():
    img = _gradient(6, 8)
    strip_off = 8 + 2 + 12 * 9 + 4
    tags = [(256, 3, 1, 8), (257, 3, 1, 6), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 0),       # WhiteIsZero
            (273, 4, 1, strip_off), (277, 3, 1, 1), (278, 3, 1, 6),
            (279, 4, 1, 48)]
    data = _build_tiff(">", tags, img.tobytes())
    out = decode_tiff_gray(data)
    assert (out == 255 - img).all()               # inverted to BlackIsZero


def test_multi_strip_and_packbits():
    img = _gradient(8, 10)
    # PackBits-compress each 4-row strip: literal runs only (worst case)
    def pack_literal(b):
        out = bytearray()
        i = 0
        while i < len(b):
            n = min(128, len(b) - i)
            out += bytes([n - 1]) + b[i:i + n]
            i += n
        return bytes(out)

    s1 = pack_literal(img[:4].tobytes())
    s2 = pack_literal(img[4:].tobytes())
    base = 8 + 2 + 12 * 9 + 4
    # strips first, then the out-of-line offset/count arrays
    payload = s1 + s2
    off_arr = struct.pack("<II", base, base + len(s1))
    cnt_arr = struct.pack("<II", len(s1), len(s2))
    tags = [(256, 3, 1, 10), (257, 3, 1, 8), (258, 3, 1, 8),
            (259, 3, 1, 32773), (262, 3, 1, 1),
            (273, 4, 2, off_arr), (277, 3, 1, 1), (278, 3, 1, 4),
            (279, 4, 2, cnt_arr)]
    data = _build_tiff("<", tags, payload)
    assert (decode_tiff_gray(data) == img).all()


def test_packbits_runs():
    # repeat run: -3 encodes 4 copies; literal run; no-op -128 skipped
    packed = bytes([0xFD, 7, 2, 1, 2, 3, 0x80, 0x00, 9])
    assert _unpackbits_decode(packed, 8) == bytes([7, 7, 7, 7, 1, 2, 3, 9])
    with pytest.raises(ValueError, match="shorter"):
        _unpackbits_decode(bytes([0xFD, 7]), 10)


def test_rejects_unsupported_and_garbage():
    img = _gradient(6, 6)
    data = bytearray(encode_tiff_gray(img))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff_gray(b"not a tiff")
    with pytest.raises(ValueError):
        decode_tiff_gray(bytes(data[:20]))        # truncated IFD
    # flip compression to LZW (5): loud reject, not a mis-decode
    lzw = bytearray(data)
    idx = bytes(lzw).find(struct.pack("<HH", 259, 3))
    lzw[idx + 8] = 5
    with pytest.raises(ValueError, match="compression"):
        decode_tiff_gray(bytes(lzw))


def test_decode_media_tiff_is_real():
    from norsk_historisk_avis_ocr_spark.operators.multimodal import (
        decode_media, sniff_media_type,
    )
    img = _gradient(24, 40)
    data = encode_tiff_gray(img)
    assert sniff_media_type(data) == "image/tiff"
    meta = decode_media(data)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (40, 24, 1)
    broken = decode_media(data[:16])              # stub fallback
    assert broken["width"] >= 256


def test_tiff_raster_leg_geometry_parity(spark):
    """TIFF page bytes → decode → L1-L4 geometry, vs the EXECUTED
    reference on the same decoded pixels (lossless, so also identical to
    the PNG leg's geometry for the same page)."""
    from norsk_historisk_avis_ocr_spark.operators.raster import (
        segment_image_pages,
    )
    from norsk_historisk_avis_ocr_spark.refexec import golden_geometry
    from norsk_historisk_avis_ocr_spark.sources.rasters import (
        synth_page_array,
    )
    pages = [(f"tf-{i}", bytearray(encode_tiff_gray(
        synth_page_array(f"tf-{i}", width=700, height=520))))
        for i in range(3)]
    df = spark.createDataFrame(pages, "page_id string, png binary")
    rows = {r.page_id: r for r in segment_image_pages(df).collect()}
    for pid, _raw in pages:
        r = rows[pid]
        assert r.decode_error is None
        want_title, want_cols = golden_geometry(
            synth_page_array(pid, width=700, height=520))
        got_cols = [(b.x0, b.y0, b.x1, b.y1) for b in r.column_boxes]
        assert got_cols == want_cols, pid
        got_title = (None if r.title_box is None else
                     (r.title_box.x0, r.title_box.y0,
                      r.title_box.x1, r.title_box.y1))
        assert got_title == want_title, pid

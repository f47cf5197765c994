"""WebM/Matroska (EBML) container *metadata* parser — stdlib only.

Completes the multimodal matrix: every sniffed media class now yields
REAL typed metadata. For video this is container parsing only — track
pixel dimensions and duration from the EBML structure (public Matroska/
WebM spec element IDs); actual frame decode (VP8/VP9/AV1) needs codecs
the container doesn't have and stays stubbed behind per-frame digests in
``operators/multimodal.py``.

- :func:`parse_webm_metadata` — Segment → Info (TimestampScale,
  Duration) and Tracks → TrackEntry → Video (PixelWidth/PixelHeight).
- :func:`encode_webm_stub` — assembles a minimal spec-shaped container
  around the given metadata (test input generator; carries no frames).

Malformed/truncated EBML raises ``ValueError`` (quarantine contract).
"""

from __future__ import annotations

import struct

_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA


def _read_id(data: bytes, pos: int) -> tuple[int, int]:
    """EBML element ID: length from leading zeros, marker bits KEPT."""
    if pos >= len(data):
        raise ValueError("truncated EBML (id)")
    first = data[pos]
    for n in range(1, 5):
        if first & (0x100 >> n):
            raw = data[pos:pos + n]
            if len(raw) != n:
                raise ValueError("truncated EBML id")
            return int.from_bytes(raw, "big"), pos + n
    raise ValueError("bad EBML id")


def _read_size(data: bytes, pos: int) -> tuple[int | None, int]:
    """EBML size varint: length from leading zeros, marker bit STRIPPED.
    The all-value-bits-1 encoding (e.g. a lone 0xFF) means UNKNOWN size
    (standard for live-muxed Segments/Clusters) → returns None."""
    if pos >= len(data):
        raise ValueError("truncated EBML (size)")
    first = data[pos]
    for n in range(1, 9):
        if first & (0x100 >> n):
            raw = data[pos:pos + n]
            if len(raw) != n:
                raise ValueError("truncated EBML size")
            value = int.from_bytes(raw, "big") - (1 << (8 * n - n))
            if value == (1 << (7 * n)) - 1:
                return None, pos + n  # unknown size
            return value, pos + n
    raise ValueError("bad EBML size")


def _children(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, pos = _read_id(data, pos)
        size, pos = _read_size(data, pos)
        if size is None:
            # unknown-size child (master element): extends to parent end
            yield eid, pos, end
            return
        if pos + size > end:
            raise ValueError("EBML child overruns parent")
        yield eid, pos, pos + size
        pos += size


def _uint(data: bytes, a: int, b: int) -> int:
    return int.from_bytes(data[a:b], "big")


def _float(data: bytes, a: int, b: int) -> float:
    n = b - a
    if n == 4:
        return struct.unpack(">f", data[a:b])[0]
    if n == 8:
        return struct.unpack(">d", data[a:b])[0]
    raise ValueError(f"bad EBML float width {n}")


def parse_webm_metadata(data: bytes) -> dict:
    """WebM/Matroska bytes → {width, height, duration_ms, n_video_tracks}.

    Width/height come from the FIRST video track; duration from Segment
    Info (Duration × TimestampScale, default scale 1 ms/tick). Missing
    elements yield None rather than guesses."""
    eid, pos = _read_id(data, 0)
    if eid != _EBML_HEADER:
        raise ValueError("not an EBML stream")
    size, pos = _read_size(data, pos)
    if size is None:
        raise ValueError("EBML header with unknown size")
    pos += size  # skip the EBML header body
    eid, pos = _read_id(data, pos)
    if eid != _SEGMENT:
        raise ValueError("no Matroska Segment")
    seg_size, pos = _read_size(data, pos)
    seg_end = (len(data) if seg_size is None  # unknown-size live segment
               else min(pos + seg_size, len(data)))

    scale_ns = 1_000_000  # spec default: 1 ms per tick
    duration_ticks: float | None = None
    width = height = None
    n_video = 0
    for eid, a, b in _children(data, pos, seg_end):
        if eid == _INFO:
            for cid, ca, cb in _children(data, a, b):
                if cid == _TIMESTAMP_SCALE:
                    scale_ns = _uint(data, ca, cb)
                elif cid == _DURATION:
                    duration_ticks = _float(data, ca, cb)
        elif eid == _TRACKS:
            for cid, ca, cb in _children(data, a, b):
                if cid != _TRACK_ENTRY:
                    continue
                ttype = None
                vdims = None
                for gid, ga, gb in _children(data, ca, cb):
                    if gid == _TRACK_TYPE:
                        ttype = _uint(data, ga, gb)
                    elif gid == _VIDEO:
                        w = h = None
                        for vid, va, vb in _children(data, ga, gb):
                            if vid == _PIXEL_WIDTH:
                                w = _uint(data, va, vb)
                            elif vid == _PIXEL_HEIGHT:
                                h = _uint(data, va, vb)
                        vdims = (w, h)
                if ttype == 1:
                    n_video += 1
                    if vdims and width is None:
                        width, height = vdims
    duration_ms = (int(duration_ticks * scale_ns / 1_000_000)
                   if duration_ticks is not None else None)
    return {"width": width, "height": height,
            "duration_ms": duration_ms, "n_video_tracks": n_video}


# --- minimal writer (test input generator) ---------------------------------

def _size_varint(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return (n | (1 << (8 * length - length))) \
                .to_bytes(length, "big")
    raise ValueError("size too large")


def _elem(eid: int, body: bytes) -> bytes:
    id_len = (eid.bit_length() + 7) // 8
    return eid.to_bytes(id_len, "big") + _size_varint(len(body)) + body


def encode_webm_stub(width: int, height: int, duration_ms: float,
                     scale_ns: int = 1_000_000) -> bytes:
    """Minimal spec-shaped WebM container carrying only metadata."""
    info = _elem(_INFO,
                 _elem(_TIMESTAMP_SCALE, scale_ns.to_bytes(4, "big"))
                 + _elem(_DURATION, struct.pack(
                     ">d", duration_ms * 1_000_000 / scale_ns)))
    video = _elem(_VIDEO,
                  _elem(_PIXEL_WIDTH, int(width).to_bytes(2, "big"))
                  + _elem(_PIXEL_HEIGHT, int(height).to_bytes(2, "big")))
    track = _elem(_TRACK_ENTRY, _elem(_TRACK_TYPE, b"\x01") + video)
    tracks = _elem(_TRACKS, track)
    segment = _elem(_SEGMENT, info + tracks)
    header = _elem(_EBML_HEADER, b"")
    return header + segment

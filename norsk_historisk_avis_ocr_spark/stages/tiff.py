"""Minimal baseline TIFF codec (grayscale) — stdlib struct + numpy.

Newspaper scan corpora are commonly TIFF (the reference decodes them via
PIL, ``engines/tesseract_engine.py:133-144``); this closes the last
sniffed-but-stubbed image format in ``operators/multimodal.py``:

- :func:`decode_tiff_gray` — single-IFD baseline TIFF → (H, W) uint8:
  8-bit grayscale (PhotometricInterpretation 0/1, BlackIsZero or
  WhiteIsZero), 1-bit bilevel (the newspaper-archive staple — bits
  unpacked MSB-first per row), and 8-bit RGB (converted with the same
  PIL-exact integer luma as the PNG path); uncompressed (Compression=1),
  PackBits (32773), or LZW (5, the classic archival-scan compression,
  libtiff early-change semantics) with optional horizontal-differencing
  Predictor (tag 317 = 2); strip-based, both byte orders (II/MM).
- :func:`encode_tiff_gray` — single-strip uncompressed little-endian
  grayscale writer; tests additionally hand-build LZW/bilevel streams
  with an in-module LZW compressor.

Anything else (tiles, JPEG-in-TIFF, 16-bit, planar, palettes, CCITT fax)
raises ``ValueError`` — the same loud-failure/quarantine contract as the
PNG and JPEG codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (public TIFF 6.0 spec constants)
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_BYTE_COUNTS = 279
_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


def _unpackbits_decode(data: bytes, expected: int) -> bytes:
    """PackBits (RLE) decompression, spec algorithm: n in [0,127] copies
    n+1 literal bytes; n in [-127,-1] repeats the next byte 1-n times;
    -128 is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        code = b - 256 if b > 127 else b
        if code >= 0:
            out += data[i:i + code + 1]
            i += code + 1
        elif code != -128:
            if i >= n:
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (1 - code)
            i += 1
    if len(out) < expected:
        raise ValueError("PackBits output shorter than strip")
    return bytes(out[:expected])


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW decompression (TIFF 6.0 §13, libtiff "early change"
    semantics): MSB-first variable-width codes starting at 9 bits,
    ClearCode=256, EOI=257; the code width bumps when the table reaches
    511/1023/2047 entries (one code earlier than GIF-style LZW)."""
    out = bytearray()
    buf = nbits = i = 0
    n = len(data)
    table: list[bytes] = []
    width = 9
    prev = b""

    def reset():
        nonlocal table, width, prev
        table = [bytes([k]) for k in range(256)] + [b"", b""]
        width = 9
        prev = b""

    reset()
    while len(out) < expected:
        while nbits < width:
            if i >= n:
                raise ValueError("truncated TIFF LZW data")
            buf = (buf << 8) | data[i]
            i += 1
            nbits += 8
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_CLEAR:
            reset()
            continue
        if code == _LZW_EOI:
            break
        if not prev:
            if code >= 256:
                raise ValueError("bad TIFF LZW first code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError("bad TIFF LZW code")
            table.append(prev + entry[:1])
            # early change: the decoder's table lags the encoder's by one
            # entry, so it must widen one entry earlier (TIFF 6.0 §13)
            if len(table) in (510, 1022, 2046):
                width += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW output shorter than strip")
    return bytes(out[:expected])


class _LZWWriter:
    """TIFF LZW compressor (test generator; same early-change discipline
    as the decoder, with table reset at 4093 entries like libtiff)."""

    def __init__(self):
        self.bits: list[tuple[int, int]] = []
        self.reset()
        self._emit(_LZW_CLEAR)

    def reset(self):
        self.table = {bytes([k]): k for k in range(256)}
        self.next_code = 258
        self.width = 9

    def _emit(self, code: int):
        self.bits.append((code, self.width))

    def feed(self, data: bytes):
        w = b""
        for b in data:
            wc = w + bytes([b])
            if wc in self.table:
                w = wc
                continue
            self._emit(self.table[w])
            self.table[wc] = self.next_code
            self.next_code += 1
            if self.next_code in (511, 1023, 2047):
                self.width += 1
            elif self.next_code == 4093:
                self._emit(_LZW_CLEAR)
                self.reset()
            w = bytes([b])
        if w:
            self._emit(self.table[w])
        self._emit(_LZW_EOI)

    def tobytes(self) -> bytes:
        buf = nbits = 0
        out = bytearray()
        for code, width in self.bits:
            buf = (buf << width) | code
            nbits += width
            while nbits >= 8:
                out.append((buf >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            out.append((buf << (8 - nbits)) & 0xFF)
        return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    wtr = _LZWWriter()
    wtr.feed(data)
    return wtr.tobytes()


def _read_ifd(data: bytes, bo: str) -> dict[int, list[int]]:
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF (no IFD)")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(data):
            raise ValueError("truncated TIFF IFD")
        tag, typ, count = struct.unpack(bo + "HHI", data[off:off + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * count
        if total <= 4:
            raw = data[off + 8:off + 8 + total]
        else:
            (voff,) = struct.unpack(bo + "I", data[off + 8:off + 12])
            raw = data[voff:voff + total]
            if len(raw) != total:
                raise ValueError("truncated TIFF tag data")
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * count, raw))
        elif typ == 1:
            vals = list(raw)
        else:  # rationals etc — resolution metadata, not needed
            vals = []
        tags[tag] = vals
    return tags


def decode_tiff_gray(data: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (H, W) uint8 luma plane."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order header)")
    tags = _read_ifd(data, bo)

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(_WIDTH), one(_HEIGHT)
    if w == 0 or h == 0:
        raise ValueError("empty TIFF frame")
    spp = one(_SAMPLES_PER_PIXEL, 1)
    bits = tags.get(_BITS, [8])
    bilevel = bits == [1] and spp == 1
    gray16 = bits == [16] and spp == 1
    if not bilevel and not gray16 and (any(b != 8 for b in bits)
                                       or spp not in (1, 3)):
        raise ValueError(f"unsupported TIFF (bits={bits} samples={spp}); "
                         "8/16-bit gray, 8-bit RGB, or 1-bit bilevel only")
    compression = one(_COMPRESSION, 1)
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}; "
                         "uncompressed/LZW/PackBits only")
    predictor = one(_PREDICTOR, 1)
    if predictor not in (1, 2) or (predictor == 2 and bilevel):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    photometric = one(_PHOTOMETRIC, 1)
    # photometric must MATCH the sample layout: gray needs 0/1, RGB needs
    # 2 — a WhiteIsZero tag on RGB data would otherwise be silently
    # ignored (the spp==3 branch never runs the inversion)
    if spp == 3:
        if photometric != 2:
            raise ValueError(
                f"unsupported TIFF photometric {photometric} for RGB")
    elif photometric not in (0, 1):
        raise ValueError(f"unsupported TIFF photometric {photometric}")

    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(_ROWS_PER_STRIP, h)

    row_bytes = (-(-w // 8)) if bilevel else w * spp * (2 if gray16 else 1)
    out = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        strip = data[off:off + cnt]
        if len(strip) != cnt:
            raise ValueError("truncated TIFF strip")
        n_rows = min(rows_per_strip, remaining_rows)
        expected = n_rows * row_bytes
        if compression == 32773:
            out += _unpackbits_decode(strip, expected)
        elif compression == 5:
            out += _lzw_decode(strip, expected)
        else:
            if len(strip) < expected:
                raise ValueError("TIFF strip shorter than its rows")
            out += strip[:expected]
        remaining_rows -= n_rows
    if remaining_rows > 0:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    if gray16:
        # 16-bit samples in the FILE's byte order -> high byte (the same
        # I;16 -> L view as the PNG path); predictor 2 diffs 16-bit values
        a16 = np.frombuffer(bytes(out), dtype=bo + "u2") \
            .reshape(h, w).astype(np.uint32)
        if predictor == 2:
            a16 = np.cumsum(a16, axis=1, dtype=np.uint32) & 0xFFFF
        gray = (a16 >> 8).astype(np.uint8)
        if photometric == 0:
            gray = (255 - gray.astype(np.int16)).astype(np.uint8)
        return gray
    if bilevel:
        # bits MSB-first per row, each row padded to a byte boundary;
        # bit 1 = max value under BlackIsZero, = black under WhiteIsZero
        rows = np.unpackbits(arr.reshape(h, row_bytes), axis=1)[:, :w]
        gray = (rows * 255).astype(np.uint8)
        if photometric == 0:
            gray = (255 - gray.astype(np.int16)).astype(np.uint8)
        return gray
    if predictor == 2:
        # horizontal differencing: each sample is stored as the delta to
        # the previous sample of the same channel in the row
        px = arr.reshape(h, w, spp).astype(np.uint32)
        arr = np.cumsum(px, axis=1, dtype=np.uint32).astype(np.uint8) \
            .reshape(-1)
    if spp == 3:
        from .png import to_grayscale
        return to_grayscale(arr.reshape(h, w, 3))
    gray = arr.reshape(h, w)
    if photometric == 0:  # WhiteIsZero: invert to the BlackIsZero view
        gray = (255 - gray.astype(np.int16)).astype(np.uint8)
    return gray


def encode_tiff_gray(arr: np.ndarray) -> bytes:
    """(H, W) uint8 → single-strip uncompressed little-endian TIFF."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("encode_tiff_gray takes a 2-D grayscale array")
    h, w = arr.shape
    pixels = arr.tobytes()
    # layout: header(8) | pixel strip | IFD
    strip_off = 8
    ifd_off = strip_off + len(pixels)
    entries = [
        (_WIDTH, 3, 1, w),
        (_HEIGHT, 3, 1, h),
        (_BITS, 3, 1, 8),
        (_COMPRESSION, 3, 1, 1),
        (_PHOTOMETRIC, 3, 1, 1),          # BlackIsZero
        (_STRIP_OFFSETS, 4, 1, strip_off),
        (_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_ROWS_PER_STRIP, 3, 1, h),
        (_STRIP_BYTE_COUNTS, 4, 1, len(pixels)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        ifd += struct.pack("<HHII", tag, typ, count, value)
    ifd += struct.pack("<I", 0)  # no next IFD
    header = b"II*\x00" + struct.pack("<I", ifd_off)
    return header + pixels + ifd

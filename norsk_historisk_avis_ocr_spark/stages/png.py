"""Pure-stdlib PNG codec (zlib + struct + numpy) — no image libraries.

The reference's native input class is raster newspaper pages decoded by PIL
(``engines/tesseract_engine.py:133-144``); this container has no image
codecs, so the raster path ships its own minimal PNG reader/writer:

- :func:`decode_png` — 8/16-bit grayscale / RGB / RGBA and 8-bit
  palette (PLTE
  lookup, optional tRNS ignored for opaque decode), non-interlaced or
  Adam7-interlaced (each of the 7 passes is an independently filtered
  sub-image, defiltered and scattered into place), all five scanline
  filters. Filters 0-2 (None/Sub/Up) defilter as vectorized numpy (Sub
  is a per-channel cumsum mod 256); 3-4 (Average/Paeth) fall back to a
  scanline loop — our own encoder never emits them, they exist for
  foreign files.
- :func:`encode_png` — writes filter-0 scanlines (the fast decode path).
- :func:`to_grayscale` — PIL-compatible ITU-R 601-2 integer luma
  (``(19595 R + 38470 G + 7471 B + 0x8000) >> 16``), so geometry computed
  on our decode matches what the reference would compute after
  ``image.convert("L")``.

16-bit samples decode via the high byte (PIL's ``I;16`` → ``L`` view);
1/2/4-bit grayscale (the bilevel archive-scan shape) and palette decode
by unpacking the MSB-first bit fields per defiltered row (gray scales to
the full 0-255 range, PIL's low-depth view). Anything unsupported
(16-bit palette, sub-byte RGB) raises ``ValueError`` so the caller can
quarantine rather than mis-decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # gray, RGB, palette-indexed, RGBA

# Adam7 pass geometry: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → PNG bytes (filter 0 rows)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, h, w = 0, arr.shape[0], arr.shape[1]
        rows = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, h, w = 2, arr.shape[0], arr.shape[1]
        rows = arr.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rows], axis=1).tobytes()
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _defilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = data[:, 0]
    if not filters.any():  # all filter-0 (what encode_png writes): no
        return data[:, 1:].copy()  # per-row defilter work at all
    scan = data[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = int(filters[y])
        row = scan[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-channel cumsum mod 256
            rec = row.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                rec[x] = (row[x] + ((a + prior[x]) >> 1)) % 256
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int16)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prior[x])
                c = int(prior[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prior = rec.astype(np.int16)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W) uint8 for grayscale, (H, W, C) for RGB/RGBA."""
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos, w = len(_SIGNATURE), 0
    h = bit_depth = color_type = interlace = None
    plte = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(data):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        # loud-failure contract: a bit-flipped body that still inflates to
        # the right length must not decode silently to wrong pixels
        (stored_crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != stored_crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if length % 3 or length == 0 or length > 768:
                raise ValueError("malformed PNG PLTE chunk")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            saw_iend = True
            break
    if h is None:
        raise ValueError("no IHDR chunk")
    if not saw_iend:
        raise ValueError("truncated PNG (no IEND chunk)")
    if bit_depth not in (1, 2, 4, 8, 16) or color_type not in _CHANNELS \
            or interlace not in (0, 1) \
            or (bit_depth == 16 and color_type == 3) \
            or (bit_depth in (1, 2, 4) and color_type not in (0, 3)):
        raise ValueError(
            f"unsupported PNG (depth={bit_depth} color={color_type} "
            f"interlace={interlace}); 1/2/4-bit gray+palette, 8/16-bit "
            f"gray/RGB/RGBA/palette")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")

    if bit_depth in (1, 2, 4):
        # sub-byte samples (bilevel/low-depth archive scans): filters
        # operate on ROW BYTES with bpp=1, so defilter on the byte grid,
        # then unpack MSB-first fields to samples
        def unpack_rows(block: bytes, ph: int, pw: int) -> np.ndarray:
            rb = (pw * bit_depth + 7) // 8
            if len(block) != ph * (rb + 1):
                raise ValueError("PNG data length mismatch")
            rows = _defilter(block, ph, rb, 1)
            bits = np.unpackbits(rows, axis=1)
            if bit_depth == 1:
                samples = bits[:, :pw]
            else:
                k = 8 // bit_depth
                weights = (1 << np.arange(bit_depth - 1, -1, -1)) \
                    .astype(np.uint8)
                samples = (bits.reshape(ph, rb * k, bit_depth)
                           * weights).sum(axis=2)[:, :pw]
            return samples.astype(np.uint8)

        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error as exc:
            raise ValueError(f"corrupt PNG stream: {exc}") from exc
        if interlace == 0:
            samples = unpack_rows(raw, h, w)
        else:
            samples = np.zeros((h, w), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw == 0 or ph == 0:
                    continue
                need = ph * ((pw * bit_depth + 7) // 8 + 1)
                sub = raw[off:off + need]
                off += need
                samples[y0::dy, x0::dx] = unpack_rows(sub, ph, pw)
            if off != len(raw):
                raise ValueError("PNG data length mismatch (interlaced)")
        if color_type == 3:
            if samples.size and int(samples.max()) >= len(plte):
                raise ValueError("PNG palette index out of range")
            return plte[samples]
        # gray: scale the sample range to 0-255 (PIL's 1/2/4-bit view)
        return (samples * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)

    ch = _CHANNELS[color_type]
    bch = ch * (2 if bit_depth == 16 else 1)  # filter bytes-per-pixel
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG stream: {exc}") from exc
    if interlace == 0:
        if len(raw) != h * (w * bch + 1):
            raise ValueError("PNG data length mismatch")
        out = _defilter(raw, h, w, bch).reshape(h, w, bch)
    else:
        # Adam7: seven independently filtered sub-images, scattered back
        out = np.zeros((h, w, bch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass has NO data at all (not even filters)
            need = ph * (pw * bch + 1)
            sub = raw[off:off + need]
            if len(sub) != need:
                raise ValueError("PNG data length mismatch (interlaced)")
            off += need
            pix = _defilter(sub, ph, pw, bch).reshape(ph, pw, bch)
            out[y0::dy, x0::dx] = pix
        if off != len(raw):
            raise ValueError("PNG data length mismatch (interlaced)")
    if bit_depth == 16:
        # big-endian 16-bit samples -> high byte (PIL's I;16 -> L view)
        out = out.reshape(h, w, ch, 2)[:, :, :, 0]
    if color_type == 3:
        idx = out.reshape(h, w)
        if idx.size and int(idx.max()) >= len(plte):
            # out-of-range index must be the quarantine ValueError, not
            # an IndexError escaping from the numpy lookup
            raise ValueError("PNG palette index out of range")
        return plte[idx]  # (h, w) indices -> (h, w, 3)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """RGB/RGBA → L with PIL's integer ITU-R 601-2 luma; gray passes
    through. Matches ``Image.convert("L")`` byte-for-byte on RGB input,
    which is what the reference applies before segmentation
    (``engines/_columns.py:442``)."""
    if arr.ndim == 2:
        return arr
    rgb = arr[:, :, :3].astype(np.uint32)
    luma = (19595 * rgb[:, :, 0] + 38470 * rgb[:, :, 1]
            + 7471 * rgb[:, :, 2] + 0x8000) >> 16
    return luma.astype(np.uint8)

"""Progressive (SOF2) JPEG — grayscale decode + encoder test generator.

Web images and library-digitized scans are routinely progressive; the
reference gets them free from PIL/libjpeg. The baseline module
(``stages/jpeg.py``) quarantines SOF2 loudly; this module decodes the
single-component (grayscale) progressive class for real:

- DC scans, first pass (diff-coded, scaled by the successive-approximation
  shift ``Al``) and refinement passes (one correction bit per block);
- AC scans over a spectral band ``Ss..Se``, first pass with EOB-run
  coding, and refinement passes with the ITU T.81 §G.1.2.3
  correction-bit protocol (newly-significant coefficients interleaved
  with history-coefficient refinements);
- restart markers (DC predictors and the EOB run reset per interval).

Progressive COLOR stays a loud ``ValueError`` (non-interleaved scans
traverse each component's own unpadded block grid — a different geometry
than the baseline decoder's MCU grid; grayscale is the newspaper-scan
shape and the two grids coincide for one component). Everything else
non-baseline (arithmetic, 12-bit, hierarchical) is rejected by the
caller's marker walk as before.

Exactness: the companion :func:`encode_jpeg_progressive` emits a
standard multi-scan script (DC first + refine, two AC bands, two AC
refinement passes) from the SAME quantized coefficients the baseline
encoder produces — so tests assert progressive decode ≡ baseline decode
of the identically-quantized image, byte-for-byte, and every scan kind
is exercised.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    _DC_BITS, _DC_VALS, _PeekTable, _ZZ_COLS, _ZZ_ROWS, _ac_table_spec,
    _BitWriter, _canonical_codes, _destuff, _idct_blocks, _pad_edge,
    _quant_table, _quantized_zigzag, _seg,
)


def _ac_table_spec_prog() -> tuple[list[int], list[int]]:
    """Baseline AC alphabet + the EOBn symbols (run 1-14, size 0)
    progressive scans need for EOB-run coding (T.81 §G.1.2.2). Appended
    at code length 16 — suboptimal but valid; the table is written into
    the DHT segment so the decoder needs no agreement beyond the file."""
    bits, syms = _ac_table_spec()
    extra = [r << 4 for r in range(1, 15)]
    bits = list(bits)
    bits[15] += len(extra)
    return bits, list(syms) + extra


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment with the
    same zero-fill-past-end semantics as the baseline decoder (loud
    truncation is checked by the caller via :meth:`overrun`)."""

    __slots__ = ("data", "n", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, want: int) -> None:
        while self.nbits < want:
            b = self.data[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFFFF
            self.nbits += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.buf >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        return v

    def huff(self, entry: list) -> tuple[int, int]:
        """(symbol, code length) via the 2^16 peek table."""
        self._fill(16)
        e = entry[(self.buf >> (self.nbits - 16)) & 0xFFFF]
        if e < 0:
            raise ValueError("bad Huffman code (progressive)")
        length = e & 31
        self.nbits -= length
        return e >> 5, length

    def consumed_bits(self) -> int:
        return (self.pos << 3) - self.nbits

    def overrun(self) -> bool:
        return self.consumed_bits() > (self.n << 3)


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def decode_progressive_gray(data: bytes) -> np.ndarray:
    """Progressive grayscale JPEG bytes → (H, W) uint8 plane. Raises
    ``ValueError`` for anything outside the supported class (progressive
    color, missing scans, truncated/corrupt entropy data)."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _PeekTable] = {}
    frame = None
    restart_interval = 0
    coef = None  # (n_blocks, 64) zigzag-order accumulated coefficients
    saw_scan = False
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq == 0:
                    vals = np.frombuffer(body[j:j + 64], dtype=np.uint8)
                    j += 64
                else:
                    vals = np.frombuffer(body[j:j + 128],
                                         dtype=">u2").astype(np.int64)
                    j += 128
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                qtables[tq] = t
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                htables[(tc, th)] = _PeekTable(bits, vals)
                j += 17 + nv
        elif marker == 0xC2:  # SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp != 1:
                raise ValueError(
                    "progressive color JPEG unsupported (grayscale only)")
            cid, hv, tq = body[6:9]
            if hv != 0x11:
                raise ValueError("subsampled single-component JPEG")
            if w == 0 or h == 0:
                raise ValueError("empty JPEG frame")
            frame = {"w": w, "h": h, "id": cid, "tq": tq}
            bx, by = -(-w // 8), -(-h // 8)
            coef = np.zeros((by * bx, 64), dtype=np.int32)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported SOF in progressive stream")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            pos = _decode_scan_progressive(
                data, pos + 2 + seglen, body, frame, htables,
                restart_interval, coef)
            saw_scan = True
            continue  # pos already advanced past the scan's entropy data
        pos += 2 + seglen

    if frame is None or coef is None:
        raise ValueError("no SOF2 frame")
    if not saw_scan:
        # headers alone would "decode" to a uniform gray plane — silent
        # garbage; same contract as the baseline "no SOS marker" raise
        raise ValueError("no SOS marker (no image data)")
    q = qtables.get(frame["tq"])
    if q is None:
        raise ValueError("missing quantization table")
    natural = np.zeros_like(coef)
    natural[:, _ZZ_ROWS.astype(np.int64) * 8 + _ZZ_COLS] = coef
    pix = _idct_blocks(natural.astype(np.int64).reshape(-1, 8, 8) * q)
    w, h = frame["w"], frame["h"]
    bx = -(-w // 8)
    img = pix.reshape(-1, bx, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, bx * 8)
    return np.ascontiguousarray(img[:h, :w])


def _decode_scan_progressive(data, scan_start, sos, frame, htables,
                             restart_interval, coef) -> int:
    ns = sos[0]
    if ns != 1:
        raise ValueError("progressive color scan unsupported")
    _cs, tables = sos[1], sos[2]
    ss, se, aa = sos[3], sos[4], sos[5]
    ah, al = aa >> 4, aa & 15
    if not (0 <= ss <= se <= 63):
        raise ValueError("bad spectral selection")
    n_blocks = coef.shape[0]

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        table = htables.get((0, tables >> 4))
        if table is None and ah == 0:
            raise ValueError("missing Huffman table")
    else:
        table = htables.get((1, tables & 15))
        if table is None:
            raise ValueError("missing Huffman table")

    segments, end = _destuff(data, scan_start)
    block = 0
    for seg in segments:
        limit = (min(block + restart_interval, n_blocks)
                 if restart_interval else n_blocks)
        br = _BitReader(seg)
        if ss == 0:
            if ah == 0:
                pred = 0
                while block < limit:
                    sym, _ = br.huff(table.entry)
                    if sym > 11:
                        raise ValueError("bad DC size")
                    pred += _extend(br.bits(sym), sym) if sym else 0
                    coef[block, 0] = pred << al
                    block += 1
            else:
                while block < limit:  # DC refinement: one bit per block
                    if br.bits(1):
                        coef[block, 0] |= 1 << al
                    block += 1
        elif ah == 0:
            eobrun = 0
            while block < limit:
                if eobrun > 0:
                    eobrun -= 1
                    block += 1
                    continue
                k = ss
                while k <= se:
                    sym, _ = br.huff(table.entry)
                    r, s = sym >> 4, sym & 15
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1 + br.bits(r)
                            break
                        k += 16  # ZRL
                    else:
                        k += r
                        if k > se:
                            raise ValueError("AC run overflows band")
                        coef[block, k] = _extend(br.bits(s), s) << al
                        k += 1
                block += 1
        else:
            eobrun = 0
            p1, m1 = 1 << al, -1 << al
            while block < limit:
                row = coef[block]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym, _ = br.huff(table.entry)
                        r, s = sym >> 4, sym & 15
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) + br.bits(r)
                                break
                            # ZRL: skip 16 zero-history positions,
                            # refining nonzeros passed over
                        elif s == 1:
                            newval = p1 if br.bits(1) else m1
                        else:
                            raise ValueError(
                                "bad refinement magnitude (must be ±1)")
                        while k <= se:
                            if row[k] != 0:
                                if br.bits(1) and (row[k] & p1) == 0:
                                    row[k] += p1 if row[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s == 1:
                            if k > se:
                                raise ValueError("AC run overflows band")
                            row[k] = newval
                        k += 1
                if eobrun > 0:
                    # refine every remaining nonzero in the band
                    while k <= se:
                        if row[k] != 0:
                            if br.bits(1) and (row[k] & p1) == 0:
                                row[k] += p1 if row[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
                block += 1
        if br.overrun():
            raise ValueError("JPEG entropy data truncated (progressive)")
        if block >= n_blocks:
            break
    if block < n_blocks:
        raise ValueError("progressive scan ended early")
    return end


# --- encoder (test generator) ----------------------------------------------

_DEFAULT_SCRIPT = (
    # (Ss, Se, Ah, Al) — libjpeg-style script: DC first at Al=1, two AC
    # bands at Al=2, AC refinements down to Al=0, DC refinement last
    (0, 0, 0, 1),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 63, 2, 1),
    (1, 63, 1, 0),
    (0, 0, 1, 0),
)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 95,
                            script=_DEFAULT_SCRIPT) -> bytes:
    """(H, W) uint8 → progressive (SOF2) grayscale JPEG whose quantized
    coefficients are IDENTICAL to :func:`~.jpeg.encode_jpeg_gray` at the
    same quality — so progressive decode must reproduce the baseline
    decode byte-for-byte (the exactness oracle the tests assert)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("encode_jpeg_progressive takes a 2-D array")
    h, w = arr.shape
    q = _quant_table(quality)
    by, bx = -(-h // 8), -(-w // 8)
    # same pad + DCT + quantize + zigzag pipeline as the baseline/color
    # encoders (shared helpers — both encoders MUST produce identical
    # quantized coefficients; the test exactness oracle depends on it)
    zz = _quantized_zigzag(_pad_edge(arr, by * 8, bx * 8), by, bx, q)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_bits, ac_vals = _ac_table_spec_prog()
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    scans = []
    for ss, se, ahh, all_ in script:
        bw = _BitWriter()
        if ss == 0 and ahh == 0:
            pred = 0
            for b in range(zz.shape[0]):
                v = int(zz[b, 0]) >> all_
                diff = v - pred
                pred = v
                size = abs(diff).bit_length()
                code, ln = dc_codes[size]
                bw.write(code, ln)
                if size:
                    vv = diff if diff > 0 else diff + (1 << size) - 1
                    bw.write(vv, size)
        elif ss == 0:
            for b in range(zz.shape[0]):
                bw.write((int(zz[b, 0]) >> all_) & 1, 1)
        elif ahh == 0:
            _encode_ac_first(bw, zz, ss, se, all_, ac_codes)
        else:
            _encode_ac_refine(bw, zz, ss, se, ahh, all_, ac_codes)
        scans.append((ss, se, ahh, all_, bw.flush()))

    zz_q = np.zeros(64, dtype=np.int64)
    zz_q[:] = q[_ZZ_ROWS, _ZZ_COLS]
    dqt = bytes([0x00]) + bytes(int(x) for x in zz_q)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    out = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof)
           + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac))
    for ss, se, ahh, all_, entropy in scans:
        sos = bytes([1, 1, 0x00, ss, se, (ahh << 4) | all_])
        out += _seg(0xDA, sos) + entropy
    return out + b"\xff\xd9"


def _encode_ac_first(bw, zz, ss, se, al, ac_codes):
    """AC first pass with EOB-run coding (T.81 §G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        # one EOBn symbol covers the whole run: r = floor(log2(run)),
        # extension bits encode run - 2^r (run < 2^15 by the 0x7FFF cap)
        nonlocal eobrun
        if eobrun > 0:
            r = min(eobrun.bit_length() - 1, 14)
            code, ln = ac_codes[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    for b in range(zz.shape[0]):
        band = [int(zz[b, k]) >> al if zz[b, k] >= 0
                else -(int(-zz[b, k]) >> al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(band) if v != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
                eobrun = 0
            continue
        flush_eob()
        eobrun = 0
        run = 0
        for i, v in enumerate(band):
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            size = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | size]
            bw.write(code, ln)
            vv = v if v > 0 else v + (1 << size) - 1
            bw.write(vv, size)
            run = 0
        if nz[-1] < len(band) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
                eobrun = 0
    flush_eob()


def _encode_ac_refine(bw, zz, ss, se, ah, al, ac_codes):
    """AC refinement pass (T.81 §G.1.2.3): newly-significant coefficients
    (value >> al == ±1) are coded as run/1 symbols over ZERO-history
    positions; already-significant coefficients are transparent to the
    run and emit one buffered correction bit each. ZRL folding must
    happen at EVERY nonzero current-level position (not just at new
    coefficients): the decoder reads correction bits positionally while
    walking a symbol's zero run, so deferring a fold past a transparent
    coefficient would put its bit on the wrong side of the ZRL symbol.
    Runs after the last new coefficient fold into the EOB run, whose
    buffered bits (current block's trailing + each EOB block's band) are
    emitted right after the EOBn symbol — the order the decoder's
    refine-remainder walks consume them."""
    eobrun = 0
    pending: list[int] = []  # correction bits owed to the next EOBn

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            r = min(eobrun.bit_length() - 1, 14)
            code, ln = ac_codes[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            for bit in pending:
                bw.write(bit, 1)
            pending.clear()
            eobrun = 0

    for b in range(zz.shape[0]):
        hist = [int(zz[b, k]) >> (al + 1) if zz[b, k] >= 0
                else -(int(-zz[b, k]) >> (al + 1))
                for k in range(ss, se + 1)]
        now = [int(zz[b, k]) >> al if zz[b, k] >= 0
               else -(int(-zz[b, k]) >> al) for k in range(ss, se + 1)]
        newly = [i for i in range(len(now))
                 if hist[i] == 0 and now[i] != 0]
        if not newly:  # whole block folds into the EOB run
            pending.extend(abs(now[i]) & 1
                           for i in range(len(now)) if hist[i] != 0)
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        last_new = newly[-1]
        run = 0
        corr: list[int] = []
        for i in range(last_new + 1):
            if now[i] == 0:
                run += 1
                continue
            while run > 15:  # fold before handling ANY nonzero position
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
                for bit in corr:
                    bw.write(bit, 1)
                corr = []
            if hist[i] != 0:  # transparent: buffer its correction bit
                corr.append(abs(now[i]) & 1)
                continue
            code, ln = ac_codes[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if now[i] > 0 else 0, 1)
            for bit in corr:
                bw.write(bit, 1)
            corr = []
            run = 0
        if last_new < len(now) - 1:
            # trailing positions: correction bits ride the next EOBn
            pending.extend(abs(now[i]) & 1
                           for i in range(last_new + 1, len(now))
                           if hist[i] != 0)
            eobrun += 1
    flush_eob()

"""Minimal PDF page-image extractor (stdlib + the in-tree codecs).

The reference's first-listed input format is ``.pdf`` (``ocr.py:25``); its
engines rasterize pages via poppler (``engines/tesseract_engine.py:
133-142``, ``engines/claude_vision_engine.py:285-294``). This container
has no poppler/PIL, so — like ``stages/png.py`` and ``stages/jpeg.py`` —
the raster path ships its own minimal parser: classic xref table →
trailer ``/Root`` → ``/Pages`` tree → first page → largest image XObject
→ ``DCTDecode`` (``stages/jpeg.py``) or ``FlateDecode`` with optional PNG
predictors (the ``stages/png.py`` defilter path).

This is deliberately NOT a general PDF renderer: no content-stream
interpretation, no fonts, no vector graphics. Scanned-newspaper PDFs are
one full-page image per page, and that image is exactly what the
reference OCRs — extracting it IS the reference's page decode. Anything
outside that shape (xref/object streams, encryption, unsupported filters
or color spaces, multi-filter chains) raises ``ValueError`` so callers
can quarantine rather than mis-decode — the same loud-failure contract as
the other codecs.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Stream:
    """An indirect object carrying a stream: its dict + raw bytes."""

    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment → end of line
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_REF_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+R\b")


def _parse_object(data: bytes, i: int, depth: int = 0):
    """One PDF object at ``i`` → (value, next_pos). Names are returned
    without the leading slash; references as ``("ref", num, gen)``.
    Nesting is depth-bounded so pathological input is a ValueError
    (quarantine), never a RecursionError escaping the task."""
    if depth > 32:
        raise ValueError("PDF object nesting too deep")
    i = _skip_ws(data, i)
    if i >= len(data):
        raise ValueError("unexpected end of PDF object data")
    c = data[i]
    if data.startswith(b"<<", i):
        i += 2
        d: dict = {}
        while True:
            i = _skip_ws(data, i)
            if data.startswith(b">>", i):
                return d, i + 2
            key, i = _parse_object(data, i, depth + 1)
            if not isinstance(key, _Name):
                raise ValueError("PDF dict key is not a name")
            val, i = _parse_object(data, i, depth + 1)
            d[str(key)] = val
    if c == 0x5B:  # [
        i += 1
        arr = []
        while True:
            i = _skip_ws(data, i)
            if i < len(data) and data[i] == 0x5D:
                return arr, i + 1
            val, i = _parse_object(data, i, depth + 1)
            arr.append(val)
    if c == 0x2F:  # /Name
        m = _NAME_RE.match(data, i)
        return _Name(m.group()[1:].decode("latin-1")), m.end()
    if c == 0x28:  # (string) — value unused downstream; skip with nesting
        parens = 1
        i += 1
        out_end = i
        n = len(data)
        while out_end < n and parens:
            b = data[out_end]
            if b == 0x5C:  # backslash escape
                out_end += 2
                continue
            if b == 0x28:
                parens += 1
            elif b == 0x29:
                parens -= 1
            out_end += 1
        if parens:
            raise ValueError("unterminated PDF string")
        return b"", out_end
    if c == 0x3C:  # <hexstring>
        j = data.find(b">", i)
        if j < 0:
            raise ValueError("unterminated PDF hex string")
        return bytes.fromhex(
            data[i + 1:j].translate(None, _WS).decode("ascii")), j + 1
    m = _REF_RE.match(data, i)
    if m:
        return ("ref", int(m.group(1)), int(m.group(2))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        tok = m.group()
        return (float(tok) if b"." in tok else int(tok)), m.end()
    for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data.startswith(kw, i):
            return val, i + len(kw)
    raise ValueError(f"unparseable PDF token at offset {i}")


class _Name(str):
    """PDF name — a str subtype so dict keys compare naturally but name
    values are distinguishable from parsed strings."""


def _parse_xref(data: bytes) -> tuple[dict[int, int], dict]:
    """Classic xref table(s) → ({obj_num: offset}, trailer dict). Follows
    ``/Prev`` chains (earlier sections never override later ones). Xref
    *streams* (PDF 1.5 cross-reference streams) raise — quarantine."""
    tail = data[-2048:]
    k = tail.rfind(b"startxref")
    if k < 0:
        raise ValueError("PDF missing startxref")
    m = _NUM_RE.search(tail, k + len(b"startxref"))
    if not m:
        raise ValueError("PDF startxref has no offset")
    offset = int(m.group())

    offsets: dict[int, int] = {}
    trailer: dict = {}
    seen = set()
    # first-wins across sections for BOTH kinds: an object marked free
    # ('f') in a newer incremental-update section must shadow an older
    # section's 'n' entry, not be resurrected from its stale offset
    seen_objs: set[int] = set()
    while True:
        if offset in seen or offset >= len(data):
            raise ValueError("PDF xref chain is cyclic or out of range")
        seen.add(offset)
        i = _skip_ws(data, offset)
        if not data.startswith(b"xref", i):
            raise ValueError(
                "PDF xref stream (1.5+) or damaged xref — classic tables "
                "only")
        i = _skip_ws(data, i + 4)
        while not data.startswith(b"trailer", i):
            m = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)").match(data, i)
            if not m:
                raise ValueError("malformed PDF xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            i = _skip_ws(data, m.end())
            for k2 in range(count):
                ent = data[i:i + 20]
                if len(ent) < 18:
                    raise ValueError("truncated PDF xref entry")
                kind = ent[17:18]
                num = start + k2
                if kind == b"n":
                    if num not in seen_objs:
                        seen_objs.add(num)
                        offsets[num] = int(ent[0:10])
                elif kind == b"f":
                    seen_objs.add(num)
                else:
                    raise ValueError("malformed PDF xref entry")
                i += 20
            i = _skip_ws(data, i)
        t, i = _parse_object(data, i + len(b"trailer"))
        if not isinstance(t, dict):
            raise ValueError("PDF trailer is not a dictionary")
        if not trailer:
            trailer = t
        prev = t.get("Prev")
        if prev is None:
            break
        if not isinstance(prev, int):  # spec: /Prev is a direct integer
            raise ValueError("PDF trailer /Prev is not an integer")
        offset = prev
    return offsets, trailer


_OBJ_RE = re.compile(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+obj\b")


class _Doc:
    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (bad header)")
        self.data = data
        self.offsets, self.trailer = _parse_xref(data)
        self._cache: dict[int, object] = {}

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            raise ValueError(f"PDF object {num} not in xref")
        m = _OBJ_RE.match(self.data, _skip_ws(self.data, off))
        if not m or int(m.group(1)) != num:
            raise ValueError(f"PDF xref offset for object {num} is wrong")
        val, i = _parse_object(self.data, m.end())
        i = _skip_ws(self.data, i)
        if self.data.startswith(b"stream", i):
            if not isinstance(val, dict):
                raise ValueError("PDF stream without a dict")
            i += len(b"stream")
            # spec: CRLF or LF (never bare CR) after the keyword
            if self.data.startswith(b"\r\n", i):
                i += 2
            elif self.data.startswith(b"\n", i):
                i += 1
            length = self.deref(val.get("Length"))
            if not isinstance(length, int) or length < 0:
                raise ValueError("PDF stream /Length missing or invalid")
            raw = self.data[i:i + length]
            if len(raw) != length:
                raise ValueError("PDF stream truncated")
            j = _skip_ws(self.data, i + length)
            if not self.data.startswith(b"endstream", j):
                raise ValueError("PDF stream /Length does not reach "
                                 "endstream")
            val = _Stream(val, raw)
        self._cache[num] = val
        return val

    def deref(self, v):
        seen = 0
        while isinstance(v, tuple) and len(v) == 3 and v[0] == "ref":
            v = self.obj(v[1])
            seen += 1
            if seen > 32:
                raise ValueError("PDF reference chain too deep")
        return v


def _walk_pages(doc: _Doc) -> list[tuple[dict, dict | None]]:
    """Depth-first walk of the /Pages tree → [(leaf page dict, nearest
    inherited /Resources)] in document order (PDF 1.7 §7.7.3)."""
    root = doc.deref(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise ValueError("PDF trailer /Root missing")
    pages: list[tuple[dict, dict | None]] = []

    def walk(node, resources, depth):
        if depth > 64 or len(pages) > 10_000:
            raise ValueError("PDF page tree too deep or too large")
        if not isinstance(node, dict):
            raise ValueError("malformed PDF page tree")
        if node.get("Resources") is not None:
            resources = doc.deref(node["Resources"])
        if str(node.get("Type")) == "Page":
            pages.append((node, resources))
            return
        kids = doc.deref(node.get("Kids"))
        if not isinstance(kids, list) or not kids:
            raise ValueError("PDF page tree has no pages")
        for kid in kids:
            walk(doc.deref(kid), resources, depth + 1)

    walk(doc.deref(root.get("Pages")), None, 0)
    return pages


def _page_images(doc: _Doc, page: dict,
                 resources: dict | None) -> list[_Stream]:
    if not isinstance(resources, dict):
        raise ValueError("PDF page has no /Resources")
    xobjects = doc.deref(resources.get("XObject"))
    if not isinstance(xobjects, dict):
        raise ValueError("PDF page has no image XObjects")
    images = []
    for name in sorted(xobjects):
        xo = doc.deref(xobjects[name])
        if isinstance(xo, _Stream) and str(xo.d.get("Subtype")) == "Image":
            images.append(xo)
    if not images:
        raise ValueError("PDF page has no image XObjects")
    return images


def _decode_image(doc: _Doc, img: _Stream) -> np.ndarray:
    from .jpeg import decode_jpeg_gray
    from .png import _defilter, to_grayscale

    d = img.d
    w = doc.deref(d.get("Width"))
    h = doc.deref(d.get("Height"))
    if not (isinstance(w, int) and isinstance(h, int) and w > 0 and h > 0):
        raise ValueError("PDF image has invalid dimensions")
    # sample-remap / masking semantics this decoder does not implement:
    # a /Decode [1 0] image would decode with silently inverted polarity
    # and an /ImageMask is a stencil, not a raster — quarantine both (and
    # /SMask, whose alpha would be dropped) per the loud-failure contract
    if doc.deref(d.get("ImageMask")) is True:
        raise ValueError("PDF /ImageMask stencils unsupported")
    if d.get("SMask") is not None:  # presence alone disqualifies
        raise ValueError("PDF /SMask soft masks unsupported")
    decode_arr = doc.deref(d.get("Decode"))
    if decode_arr is not None:
        vals = [doc.deref(v) for v in decode_arr] \
            if isinstance(decode_arr, list) else None
        ncomp_d = len(vals) // 2 if vals else 0
        if vals != [0, 1] * ncomp_d or ncomp_d == 0:
            raise ValueError(
                f"non-default PDF /Decode array unsupported: {decode_arr}")
    filt = doc.deref(d.get("Filter"))
    if isinstance(filt, list):
        if len(filt) != 1:
            raise ValueError("PDF multi-filter image streams unsupported")
        filt = doc.deref(filt[0])
    filt = str(filt) if filt is not None else None

    if filt == "DCTDecode":
        # the embedded JPEG is self-describing — dims/components come from
        # its own SOF; the in-tree decoder quarantines what it can't do
        out = decode_jpeg_gray(img.raw)
        if out.shape != (h, w):
            raise ValueError("PDF /Width /Height disagree with JPEG SOF")
        return out

    if filt in (None, "FlateDecode"):
        bpc = doc.deref(d.get("BitsPerComponent", 8))
        if bpc != 8:
            raise ValueError(f"unsupported PDF image depth {bpc}")
        cs = doc.deref(d.get("ColorSpace"))
        ncomp = {"DeviceGray": 1, "DeviceRGB": 3}.get(str(cs))
        if ncomp is None:
            raise ValueError(f"unsupported PDF color space {cs}")
        raw = zlib.decompress(img.raw) if filt == "FlateDecode" else img.raw
        predictor = 1
        parms = doc.deref(d.get("DecodeParms"))
        if isinstance(parms, list):
            parms = doc.deref(parms[0]) if parms else None
        if isinstance(parms, dict):
            predictor = doc.deref(parms.get("Predictor", 1))
            colors = doc.deref(parms.get("Colors", 1))
            columns = doc.deref(parms.get("Columns", w))
            if not all(isinstance(x, int)
                       for x in (predictor, colors, columns)):
                raise ValueError("PDF DecodeParms values are not integers")
            if colors != ncomp or columns != w:
                raise ValueError("PDF DecodeParms disagree with image dims")
        if predictor >= 10:
            # PNG predictors: each row prefixed with a filter-type byte —
            # exactly the stages/png.py defilter input shape
            if len(raw) != h * (w * ncomp + 1):
                raise ValueError("PDF image data length mismatch "
                                 "(PNG-predicted)")
            plane = _defilter(raw, h, w, ncomp)
        elif predictor == 1:
            if len(raw) != h * w * ncomp:
                raise ValueError("PDF image data length mismatch")
            plane = np.frombuffer(raw, dtype=np.uint8).reshape(h, w * ncomp)
        else:
            raise ValueError(f"unsupported PDF predictor {predictor}")
        arr = plane.reshape(h, w, ncomp)
        return to_grayscale(arr if ncomp == 3 else arr.reshape(h, w))

    raise ValueError(f"unsupported PDF image filter {filt}")


# Exceptions a malformed object graph can surface from untyped PDF values
# (e.g. a /Prev that is a reference, arithmetic on a _Name). Public entry
# points translate them so the quarantine contract stays ValueError-only.
_MALFORMED = (TypeError, AttributeError, KeyError, OverflowError)


def decode_pdf_page_image(data: bytes, page: int = 0) -> np.ndarray:
    """Page ``page``'s largest image XObject → (H, W) uint8 luma — the
    scanned-page decode path (a newspaper scan PDF is one full-page image
    per page). Largest by pixel count, ties broken by XObject name order
    (deterministic). Raises ``ValueError`` on anything it cannot decode
    faithfully."""
    try:
        doc = _Doc(data)
        pages = _walk_pages(doc)
        if not 0 <= page < len(pages):
            raise ValueError(f"PDF has {len(pages)} pages, no page {page}")
        return _decode_largest(doc, *pages[page])
    except _MALFORMED as exc:
        raise ValueError(
            f"malformed PDF object graph: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_largest(doc: _Doc, page: dict,
                    resources: dict | None) -> np.ndarray:
    images = _page_images(doc, page, resources)

    def pixels(s: _Stream) -> int:
        w, h = doc.deref(s.d.get("Width")), doc.deref(s.d.get("Height"))
        return int(w) * int(h) if isinstance(w, int) and isinstance(h, int) \
            else -1

    return _decode_image(doc, max(images, key=pixels))


def pdf_page_count(data: bytes) -> int:
    """Number of pages (an O(page-tree) metadata probe — no image
    decode)."""
    try:
        return len(_walk_pages(_Doc(data)))
    except _MALFORMED as exc:
        raise ValueError(
            f"malformed PDF object graph: {type(exc).__name__}: {exc}"
        ) from exc


def decode_pdf_page_images(data: bytes):
    """Every page's largest image XObject, in document order — the shape
    a multi-page newspaper issue has (the reference rasterizes and OCRs
    each page: ``engines/tesseract_engine.py:133-142`` iterates poppler's
    per-page output). Yields (page_index, (H, W) uint8) lazily so callers
    can bound work."""
    try:
        doc = _Doc(data)
        for idx, (page, resources) in enumerate(_walk_pages(doc)):
            yield idx, _decode_largest(doc, page, resources)
    except _MALFORMED as exc:
        raise ValueError(
            f"malformed PDF object graph: {type(exc).__name__}: {exc}"
        ) from exc


# --- encoder (test/bench input generator) ----------------------------------

def encode_pdf_pages(imgs: list[np.ndarray], codec: str = "flate",
                     quality: int = 97, predictor: bool = True,
                     thumb: np.ndarray | None = None,
                     restart_interval: int = 0) -> bytes:
    """(H, W) uint8 pages → a minimal multi-page PDF, one page-filling
    image XObject per page — the shape a scanned newspaper issue has.
    ``codec``: ``"jpeg"`` (DCTDecode via the in-tree encoder) or
    ``"flate"`` (FlateDecode; ``predictor=True`` writes PNG-predicted
    rows with filter-type-0 prefixes). ``thumb`` adds a second, smaller
    image XObject to page 1 so decoders must pick the largest. Writes a
    valid classic xref table (byte-exact offsets) so parsers exercise
    the real object graph, not a scan fallback."""
    if not imgs:
        raise ValueError("encode_pdf_pages wants at least one page")
    for img in imgs:
        if img.ndim != 2 or img.dtype != np.uint8:
            raise ValueError("encode_pdf_pages wants (H, W) uint8 pages")

    def image_obj(arr: np.ndarray) -> bytes:
        ih, iw = arr.shape
        if codec == "jpeg":
            from .jpeg import encode_jpeg_gray
            payload = encode_jpeg_gray(arr, quality=quality,
                                       restart_interval=restart_interval)
            extra = b"/Filter /DCTDecode"
        elif codec == "flate":
            if predictor:
                rows = np.concatenate(
                    [np.zeros((ih, 1), dtype=np.uint8), arr], axis=1)
                payload = zlib.compress(rows.tobytes(), 9)
                extra = (b"/Filter /FlateDecode /DecodeParms "
                         b"<< /Predictor 15 /Colors 1 /BitsPerComponent 8 "
                         b"/Columns " + str(iw).encode()) + b" >>"
            else:
                payload = zlib.compress(arr.tobytes(), 9)
                extra = b"/Filter /FlateDecode"
        else:
            raise ValueError(f"unknown codec {codec}")
        head = (b"<< /Type /XObject /Subtype /Image /Width "
                + str(iw).encode() + b" /Height " + str(ih).encode()
                + b" /ColorSpace /DeviceGray /BitsPerComponent 8 "
                + extra + b" /Length " + str(len(payload)).encode()
                + b" >>\nstream\n")
        return head + payload + b"\nendstream"

    # object layout: 1 catalog, 2 pages node, then per page p (0-based):
    # 3+3p page, 4+3p image, 5+3p contents; thumb (if any) last
    bodies: dict[int, bytes] = {}
    kids = []
    thumb_num = 3 + 3 * len(imgs)
    for p, img in enumerate(imgs):
        h, w = img.shape
        page_num, img_num, cont_num = 3 + 3 * p, 4 + 3 * p, 5 + 3 * p
        kids.append(f"{page_num} 0 R".encode())
        xobjects = b"/Im0 " + str(img_num).encode() + b" 0 R"
        if thumb is not None and p == 0:
            xobjects += b" /Im1 " + str(thumb_num).encode() + b" 0 R"
        content = (b"q " + str(w).encode() + b" 0 0 " + str(h).encode()
                   + b" 0 0 cm /Im0 Do Q")
        bodies[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 "
            + str(w).encode() + b" " + str(h).encode()
            + b"] /Resources << /XObject << " + xobjects
            + b" >> >> /Contents " + str(cont_num).encode() + b" 0 R >>")
        bodies[img_num] = image_obj(img)
        bodies[cont_num] = (b"<< /Length " + str(len(content)).encode()
                            + b" >>\nstream\n" + content + b"\nendstream")
    bodies[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    bodies[2] = (b"<< /Type /Pages /Kids [" + b" ".join(kids)
                 + b"] /Count " + str(len(imgs)).encode() + b" >>")
    if thumb is not None:
        bodies[thumb_num] = image_obj(thumb)

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + bodies[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(bodies) + 1
    out += b"xref\n0 " + str(n).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(n).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)


def encode_pdf_gray(img: np.ndarray, codec: str = "flate",
                    quality: int = 97, predictor: bool = True,
                    thumb: np.ndarray | None = None,
                    restart_interval: int = 0) -> bytes:
    """One-page convenience wrapper over :func:`encode_pdf_pages`."""
    return encode_pdf_pages([img], codec=codec, quality=quality,
                            predictor=predictor, thumb=thumb,
                            restart_interval=restart_interval)

"""Deterministic synthetic newspaper-page rasters (test/bench input).

The reference's native input is scanned newspaper pages
(``engines/tesseract_engine.py:133-144``); the sandbox has no scan corpus,
so raster-path tests and the driver contract run on pages synthesized here:
multi-column layouts with ink dividers (with per-band skew drift), masthead
regions with title-like large gaps, dense body-text lines, and light paper
noise — every structure the L1-L4 geometry operators (``stages/layout.py``)
and the reference's ``engines/_columns.py`` key on.

Determinism: all randomness comes from a ``numpy`` PCG64 generator seeded
with the md5 of the page id — identical pages on every executor, every
engine, every run (no Python ``hash()``, no wall clock).
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

PAGE_WIDTH = 1460
PAGE_HEIGHT = 1100


def _rng_for(page_id: str) -> np.random.Generator:
    seed = int.from_bytes(hashlib.md5(page_id.encode()).digest()[:8], "big")
    return np.random.default_rng(np.random.PCG64(seed))


def _draw_text_lines(img: np.ndarray, rng: np.random.Generator,
                     x0: int, x1: int, y0: int, y1: int,
                     line_h: int = 12, gap_h: int = 5,
                     density: float = 0.55) -> None:
    """Dense body-text texture: dark speckle rows with thin blank gaps."""
    y = y0
    while y + line_h <= y1:
        xs = np.arange(x0, x1)
        mask = rng.random(xs.size) < density
        rows = slice(y, y + line_h)
        img[rows, x0:x1][:, mask] = rng.integers(
            0, 120, size=(line_h, int(mask.sum())), dtype=np.uint8)
        y += line_h + gap_h
        if rng.random() < 0.08:  # paragraph break
            y += gap_h * 2


def synth_page_array(page_id: str, width: int = PAGE_WIDTH,
                     height: int = PAGE_HEIGHT) -> np.ndarray:
    """One deterministic grayscale newspaper page as (H, W) uint8."""
    rng = _rng_for(page_id)
    img = rng.integers(236, 256, size=(height, width),
                       dtype=np.int32).astype(np.uint8)  # light paper noise

    n_cols = int(rng.integers(2, 5))
    # interior boundaries: even spacing with jitter, gutters stay light
    bounds = [0]
    for i in range(1, n_cols):
        jitter = int(rng.integers(-25, 26))
        bounds.append(int(i * width / n_cols) + jitter)
    bounds.append(width)

    # masthead on most pages: title-like lines with >=45-row gaps across a
    # contiguous column span
    has_masthead = rng.random() < 0.7
    masthead_bottom = 0
    mast_cols = (0, n_cols)
    if has_masthead:
        first = int(rng.integers(0, max(1, n_cols - 1)))
        last = int(rng.integers(first + 1, n_cols + 1))
        mast_cols = (first, last)
        mx0, mx1 = bounds[first] + 12, bounds[last] - 12
        y = 20
        for _ in range(int(rng.integers(2, 4))):
            block_h = int(rng.integers(26, 40))
            img[y:y + block_h, mx0:mx1] = rng.integers(
                0, 90, size=(block_h, mx1 - mx0), dtype=np.int32
            ).astype(np.uint8)
            y += block_h + int(rng.integers(46, 70))  # the "large gap"
        masthead_bottom = min(y, int(height * 0.38))

    # ink dividers at interior boundaries; one may be omitted to force the
    # gap-coverage subdivision path (L2). Dividers drift ±skew across bands
    # (the clustering hazard) and usually skip the masthead span.
    skip_divider = (int(rng.integers(1, n_cols))
                    if n_cols >= 3 and rng.random() < 0.35 else -1)
    band_h = 200
    n_bands = max(1, height // band_h)
    for i in range(1, n_cols):
        if i == skip_divider:
            continue
        skew = rng.integers(-6, 7, size=n_bands + 1)
        in_masthead_span = (has_masthead
                            and mast_cols[0] < i < mast_cols[1])
        for b in range(n_bands + 1):
            y0 = b * band_h
            y1 = min((b + 1) * band_h, height)
            if y0 >= y1:
                continue
            if in_masthead_span and y0 < masthead_bottom:
                continue
            x = bounds[i] + int(skew[b])
            img[y0:y1, x - 1:x + 2] = 25

    # body text per column, starting below the masthead where covered
    for c in range(n_cols):
        x0, x1 = bounds[c] + 14, bounds[c + 1] - 14
        covered = has_masthead and mast_cols[0] <= c < mast_cols[1]
        y_top = masthead_bottom + 10 if covered else 18
        _draw_text_lines(img, rng, x0, x1, y_top, height - 12)

    return img


RASTER_SCHEMA = StructType([
    StructField("page_id", StringType(), False),
    StructField("png", BinaryType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
])


def raster_pages_df(spark: SparkSession, sf_dir: str,
                    limit: int | None = None,
                    partitions: int | None = None) -> DataFrame:
    """Deterministic PNG page per document id at the given scale factor.

    Page ids come from ``documents.parquet`` so the corpus scales with sf;
    synthesis happens executor-side in one Arrow-batched stage (the driver
    never holds pixels). ``partitions`` splits the single small parquet
    input so generation parallelizes (one input split = serial otherwise).
    """
    from ..stages.png import encode_png

    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if limit is not None:
        ids = ids.orderBy("doc_id").limit(limit)
    if partitions:
        ids = ids.repartition(partitions, F.col("doc_id"))

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                pid = f"page-{int(doc_id)}"
                arr = synth_page_array(pid)
                rows.append({"page_id": pid, "png": encode_png(arr),
                             "width": arr.shape[1], "height": arr.shape[0]})
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=RASTER_SCHEMA)


def synth_color_page_array(page_id: str, width: int = PAGE_WIDTH,
                           height: int = PAGE_HEIGHT) -> np.ndarray:
    """Deterministic sepia-toned color scan of the same page: (H, W, 3)
    uint8 with per-channel attenuation of the grayscale page — the shape
    an aged-newspaper color scan has (smooth, low-variance chroma, which
    is exactly what 4:2:0 subsampling assumes)."""
    g = synth_page_array(page_id, width=width, height=height) \
        .astype(np.float64)
    return np.stack([g, np.clip(g * 0.94, 0, 255),
                     np.clip(g * 0.82, 0, 255)], axis=-1).astype(np.uint8)


def pdf_pages_df(spark: SparkSession, sf_dir: str,
                 limit: int | None = None,
                 partitions: int | None = None,
                 width: int = 700, height: int = 520,
                 quality: int = 97) -> DataFrame:
    """PDF-encoded deterministic page per document id — the reference's
    PRIMARY input format (``ocr.py:25``; decoded via poppler at
    ``engines/tesseract_engine.py:133-142``). Same shape/contract as
    :func:`raster_pages_df`; the ``png`` column holds a one-page PDF whose
    page image alternates deterministically between the scan payload
    classes: DCTDecode (embedded baseline JPEG) for even doc_ids,
    FlateDecode with PNG predictors for odd ones, and bilevel
    CCITTFaxDecode G4 (the fax/archive payload) every eighth document
    (doc_id % 8 == 3), so one contract leg exercises the gray, color,
    and bilevel branches of ``stages/pdf.py``. The cross-reference
    layout ALSO alternates (doc_id % 4): classic xref tables vs PDF 1.5
    xref streams with /ObjStm-packed object graphs (predicted xref rows
    on the flate arm) — the modern layout poppler reads for the
    reference. Dims follow the JPEG leg (entropy decode is the slow
    path; see CLAUDE.md)."""
    from ..stages.pdf import encode_pdf_gray

    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if limit is not None:
        ids = ids.orderBy("doc_id").limit(limit)
    if partitions:
        ids = ids.repartition(partitions, F.col("doc_id"))

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                pid = f"page-{int(doc_id)}"
                arr = synth_page_array(pid, width=width, height=height)
                codec = "jpeg" if int(doc_id) % 2 == 0 else "flate"
                if int(doc_id) % 8 == 3:
                    # bilevel CCITT G4 arm — the fax/archive payload
                    codec = "ccitt"
                # doc_id % 4: 0 jpeg+classic, 1 flate+xrefstream/objstm
                # (predicted rows), 2 jpeg+xrefstream/objstm, 3
                # flate-or-ccitt+classic — codec arms ride both layouts
                modern = int(doc_id) % 4 in (1, 2)
                # restart lanes let the DCT arm ride the lockstep decoder
                rows.append({"page_id": pid,
                             "png": encode_pdf_gray(
                                 arr, codec=codec, quality=quality,
                                 restart_interval=2,
                                 xref="stream" if modern else "table",
                                 objstm=modern,
                                 xref_predictor=int(doc_id) % 4 == 1),
                             "width": arr.shape[1], "height": arr.shape[0]})
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=RASTER_SCHEMA)


def jpeg_pages_df(spark: SparkSession, sf_dir: str,
                  limit: int | None = None,
                  partitions: int | None = None,
                  width: int = 700, height: int = 520,
                  quality: int = 97,
                  arms: tuple[str, ...] = ("gray", "color",
                                           "progressive")) -> DataFrame:
    """JPEG-encoded deterministic page per document id — the reference's
    other native payload encoding (``tesseract_engine.py:143-144``). Same
    shape/contract as :func:`raster_pages_df` but the ``png`` column holds
    baseline JPEG bytes (the column name is the payload slot, sniffing
    dispatches the codec). Alternates deterministically over ``arms`` by
    doc_id: grayscale baseline, 3-component YCbCr 4:2:0 color scans of
    the sepia page, and progressive (SOF2) grayscale — the default
    covers every JPEG decode path (the contract leg's job). The bench
    leg passes ``arms=("gray", "color")``: progressive decode is a
    per-symbol Python compatibility path (no restart lanes), ~20×
    slower per page, and would dominate a leg meant to characterize the
    production (lockstep-vector) decoder. Default dims are smaller than
    the PNG pages: JPEG entropy decode is the engine's slowest per-byte
    path, and the contract leg only needs enough page to exercise every
    geometry path."""
    from ..stages.jpeg import encode_jpeg_color, encode_jpeg_gray
    from ..stages.jpeg_progressive import encode_jpeg_progressive

    unknown = set(arms) - {"gray", "color", "progressive"}
    if unknown or not arms:
        raise ValueError(f"unknown jpeg_pages_df arms {sorted(unknown)}")

    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if limit is not None:
        ids = ids.orderBy("doc_id").limit(limit)
    if partitions:
        ids = ids.repartition(partitions, F.col("doc_id"))

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                pid = f"page-{int(doc_id)}"
                # restart intervals (standard scanner-output practice for
                # error resilience) also enable the decoder's lockstep
                # vector path: one lane per restart segment
                arm = arms[int(doc_id) % len(arms)]
                if arm == "gray":
                    arr = synth_page_array(pid, width=width, height=height)
                    payload = encode_jpeg_gray(arr, quality=quality,
                                               restart_interval=2)
                elif arm == "color":
                    arr = synth_color_page_array(pid, width=width,
                                                 height=height)
                    payload = encode_jpeg_color(arr, quality=quality,
                                                sampling=(2, 2),
                                                restart_interval=1)
                else:
                    arr = synth_page_array(pid, width=width, height=height)
                    payload = encode_jpeg_progressive(arr, quality=quality)
                rows.append({"page_id": pid, "png": payload,
                             "width": arr.shape[1], "height": arr.shape[0]})
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=RASTER_SCHEMA)

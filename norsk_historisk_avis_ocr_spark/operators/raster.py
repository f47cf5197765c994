"""Raster layout segmentation as a DataFrame operator (L1-L4 on Spark).

The geometry library (``stages/layout.py``) is pure numpy; this wires it to
DataFrames for corpora where the page payload is a raster (scanned
newspapers — the reference's native input) rather than HTML. Pages are
carried as raw grayscale bytes + dimensions (the decoded-raster analog of
the reference's PIL image; PNG/JPEG decode would slot into the same UDF if
an image codec were available — the container has none, so raw grayscale is
the supported interchange format and is exactly what ``numpy.frombuffer``
needs).

Output is the ``blocks`` struct-array row the SURVEY data model specifies:
one row per page with boundaries, per-column body tops, the title box, and
column crop boxes — the contents of the reference's ``detection_info.txt``
(``engines/_columns.py:383-418``) as queryable columns (S8 debug sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

BOX_TYPE = StructType([
    StructField("x0", IntegerType(), False),
    StructField("y0", IntegerType(), False),
    StructField("x1", IntegerType(), False),
    StructField("y1", IntegerType(), False),
])

LAYOUT_SCHEMA = StructType([
    StructField("page_id", StringType(), False),
    StructField("boundaries", ArrayType(IntegerType()), False),
    StructField("body_top", ArrayType(IntegerType()), False),
    StructField("title_box", BOX_TYPE, True),
    StructField("column_boxes", ArrayType(BOX_TYPE), False),
])


def segment_rasters(df: DataFrame, id_col: str = "page_id",
                    bytes_col: str = "gray", width_col: str = "width",
                    height_col: str = "height") -> DataFrame:
    """Grayscale page rasters → layout geometry rows.

    Input columns: ``id_col`` (string key), ``bytes_col`` (H*W uint8 raw
    grayscale), ``width_col``/``height_col``. One vectorized stage — each
    page segments independently (map-only, no shuffle).
    """
    def fn(batches):
        import numpy as np
        import pandas as pd

        from ..stages.layout import split_columns_geometry

        def box(t):
            if t is None:
                return None
            return {"x0": int(t[0]), "y0": int(t[1]),
                    "x1": int(t[2]), "y1": int(t[3])}

        for pdf in batches:
            rows = []
            for pid, data, w, h in zip(pdf[id_col], pdf[bytes_col],
                                       pdf[width_col], pdf[height_col]):
                img = np.frombuffer(bytes(data), dtype=np.uint8) \
                    .reshape(int(h), int(w))
                geo = split_columns_geometry(img)
                rows.append({
                    "page_id": pid,
                    "boundaries": [int(x) for x in geo["boundaries"]],
                    "body_top": [int(x) for x in geo["body_top"]],
                    "title_box": box(geo["title_box"]),
                    "column_boxes": [box(b) for b in geo["column_boxes"]],
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=LAYOUT_SCHEMA)


def segment_png_pages(df: DataFrame, id_col: str = "page_id",
                      png_col: str = "png") -> DataFrame:
    """PNG page payloads → layout geometry rows (the reference's input
    class: encoded raster in, geometry out, ``tesseract_engine.py:143-144``).

    Decode (stdlib PNG reader, ``stages/png.py``), PIL-compatible grayscale
    conversion, and L1-L4 segmentation are fused into one Arrow-batched
    stage — raw pixels never cross an Arrow boundary, only the compressed
    payload in and the small geometry struct out. Map-only, no shuffle;
    undecodable payloads yield a null geometry row (quarantine semantics)
    instead of failing the task.
    """
    schema = StructType(
        [LAYOUT_SCHEMA[0]]
        + [StructField(f.name, f.dataType, True) for f in LAYOUT_SCHEMA[1:]]
        + [StructField("decode_error", StringType(), True)])

    def fn(batches):
        import pandas as pd

        from ..stages.layout import split_columns_geometry
        from ..stages.png import decode_png, to_grayscale

        def box(t):
            if t is None:
                return None
            return {"x0": int(t[0]), "y0": int(t[1]),
                    "x1": int(t[2]), "y1": int(t[3])}

        for pdf in batches:
            rows = []
            for pid, data in zip(pdf[id_col], pdf[png_col]):
                try:
                    gray = to_grayscale(decode_png(bytes(data)))
                    geo = split_columns_geometry(gray)
                    rows.append({
                        "page_id": pid,
                        "boundaries": [int(x) for x in geo["boundaries"]],
                        "body_top": [int(x) for x in geo["body_top"]],
                        "title_box": box(geo["title_box"]),
                        "column_boxes": [box(b) for b in geo["column_boxes"]],
                        "decode_error": None,
                    })
                except Exception as exc:  # noqa: BLE001 - quarantine row
                    rows.append({
                        "page_id": pid, "boundaries": None, "body_top": None,
                        "title_box": None, "column_boxes": None,
                        "decode_error": f"{type(exc).__name__}: {exc}",
                    })
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=schema)

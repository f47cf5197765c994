"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / quality); each
SQL-expressible one has a value-exact DuckDB oracle in ``oracle_sql()``.

Cross-engine value identity strategy: every float-bearing output is either
derived from exact-integer intermediates with a fixed fp expression tree
(identical operands → identical IEEE result in both engines) or rounded at a
scale far above accumulated fp error. Hashes use the portable 56-bit md5
hash computed identically in Spark (``conv(substr(md5(x),1,14),16,10)``) and
DuckDB (``('0x' || substr(md5(x),1,14))::BIGINT``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from norsk_historisk_avis_ocr_spark.operators import extract_pages  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import corpus as cp  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import dedup as dd  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import kmeans as km  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import lexicon as lx  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import multimodal as mm  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import quality as q  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import similarity as sim  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import skew as sk  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import windows as w  # noqa: E402
from norsk_historisk_avis_ocr_spark.sources import pages_df  # noqa: E402


def _ensure_worker_path(spark: SparkSession) -> None:
    """Executor Python workers must import this repo's package even when the
    caller's SparkSession was built elsewhere with an unrelated cwd/env.

    PYTHONPATH exports only help before the JVM starts; for an already-live
    session the reliable channel is ``addPyFile`` with a package zip — the
    runtime equivalent of ``spark-submit --py-files`` (north rule)."""
    existing = os.environ.get("PYTHONPATH", "")
    if _REPO not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = _REPO + (
            os.pathsep + existing if existing else "")
    sc = spark.sparkContext
    if getattr(sc, "_nhao_pyfile_added", False):
        return
    try:
        import tempfile
        import zipfile
        import hashlib
        pkg_dir = os.path.join(_REPO, "norsk_historisk_avis_ocr_spark")
        payload: list[tuple[str, bytes]] = []
        digest = hashlib.sha256()
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    data = open(full, "rb").read()
                    payload.append((os.path.relpath(full, _REPO), data))
                    digest.update(data)
        # content-addressed name: a stale cached zip from an earlier code
        # version must never be shipped
        zpath = os.path.join(tempfile.gettempdir(),
                             f"nhao_engine_{digest.hexdigest()[:12]}.zip")
        if not os.path.exists(zpath):
            with zipfile.ZipFile(zpath, "w") as z:
                for rel, data in payload:
                    z.writestr(rel, data)
        sc.addPyFile(zpath)
        sc._nhao_pyfile_added = True
    except Exception:  # pragma: no cover - best effort
        pass


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# Deterministic pattern seeds for the PII audit/scrub contract queries
# (apostrophe-free so the same literals embed in the DuckDB oracle).
_SEED_A = (" Kontakt ola.nordmann@avis.no eller https://avis.no/arkiv "
           "tlf +47 22 33 44 55.")
_SEED_B = " Se http://eksempel.no/side?id=4 i dag."


def _seed_patterns(docs: DataFrame) -> DataFrame:
    seed = (F.when(F.col("doc_id") % 7 == 0, F.lit(_SEED_A))
             .when(F.col("doc_id") % 5 == 0, F.lit(_SEED_B))
             .otherwise(F.lit("")))
    return docs.withColumn("text", F.concat(F.col("text"), seed))


# ---------------------------------------------------------------------------
# entry — flagship query (driver smoke check)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full main-content extraction over synthesized CC-style
    pages at sf0.001 — url, masthead, per-column text, combined text,
    reflowed text, normalized text, span offsets, metrics."""
    _ensure_worker_path(spark)
    pages = pages_df(spark, "/root/testdata/sf0.001")
    res = extract_pages(pages)
    return res.select(
        "url", "header", "combined", "transcribed", "normalized",
        F.col("metrics.n_blocks").alias("n_blocks"),
        F.col("metrics.n_cols").alias("n_cols"),
        F.col("metrics.has_masthead").alias("has_masthead"),
    )


# ---------------------------------------------------------------------------
# queries — one entry per operator
# ---------------------------------------------------------------------------

def _j1_antijoin(spark: SparkSession, sf: str) -> DataFrame:
    """Resume anti-join shape (J1): keys with no committed counterpart —
    the ``pages LEFT ANTI JOIN done ON url`` resume pattern
    (``operators/resume.py``) over oracle-checkable tables: customers with
    no 'P'-status order yet."""
    cust = _t(spark, sf, "customer")
    done = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(done, cust.c_custkey == done.o_custkey,
                     "left_anti").select("c_custkey", "c_name")


def _dedup_exact_with_dupes(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup over a corpus with planted duplicates (the base table has
    none): every doc unioned once more under a shifted id."""
    from norsk_historisk_avis_ocr_spark.operators.dedup import exact_duplicates
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    dupes = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    return exact_duplicates(docs.unionAll(dupes))


def _dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level exact dedup over the planted-duplicate corpus: only the
    original (smaller) ids survive."""
    from norsk_historisk_avis_ocr_spark.operators.dedup import dedup_keep_first
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    dupes = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    return dedup_keep_first(docs.unionAll(dupes)).select("doc_id")


def _salted_hot_keys(spark: SparkSession, sf: str) -> DataFrame:
    """Hot-key skew pattern: salted two-phase count AND sum per event user
    (user_id is Zipf-ish in events), joined on the key. The oracle is the
    plain GROUP BY — salting must be value-invariant. Sum runs on exact
    milli-unit integers so the salted re-aggregation order cannot drift."""
    from norsk_historisk_avis_ocr_spark.operators.skew import (
        salted_count, salted_sum,
    )
    ev = _t(spark, sf, "events")
    cnt = salted_count(ev, "user_id", n_salts=16)
    tot = salted_sum(ev, "user_id",
                     F.round(F.col("value") * 1000).cast("long"),
                     "value_milli", n_salts=16)
    return cnt.join(tot, "user_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def extract_pipeline(spark, sf):
        _ensure_worker_path(spark)
        res = extract_pages(pages_df(spark, sf))
        return res.select(
            "url", "header", "combined", "transcribed", "normalized",
            F.col("metrics.n_blocks").alias("n_blocks"),
            F.col("metrics.n_cols").alias("n_cols"))

    def multimodal_features(spark, sf):
        """Media metadata + feature vector over an oracle-visible corpus
        (documents.text as the opaque binary payload). The stub decode is
        sha256-deterministic, so every output is DuckDB-reproducible; the
        feature array is projected to a scalar (count of positive
        components — integer-exact: sign of component i is sign of the
        16-bit digest slice, unchanged by the positive norm) because the
        driver's canonicalizer cannot sort list cells."""
        _ensure_worker_path(spark)
        docs = _t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("doc_key"),
            F.encode("text", "UTF-8").alias("payload"))
        feats = mm.media_features(docs, url_col="doc_key",
                                  bytes_col="payload")
        return feats.select(
            F.col("url").alias("doc_key"), "media_type", "n_bytes",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.col("n_frames").cast("long").alias("n_frames"),
            F.size(F.filter("features", lambda x: x > 0)).cast("long")
             .alias("n_pos_features"))

    def raster_layout(spark, sf):
        """L1-L4 raster segmentation from PNG bytes to geometry (rows-only:
        the pixel math is not SQL-expressible; correctness is pinned by
        tests/test_layout_reference_parity.py, which executes the
        reference's engines/_columns.py side-by-side). Pages are
        deterministic synthetic newspaper rasters keyed on doc_id, so the
        corpus scales with sf and every round exercises the full
        PNG-decode → grayscale → segment path. The 80-page limit and
        repartition(8) are probe bounds for the correctness gate, not
        pipeline properties — the bench runs this path at 1,024 pages and
        the operator itself is map-only."""
        _ensure_worker_path(spark)
        from norsk_historisk_avis_ocr_spark.operators.raster import (
            segment_png_pages,
        )
        from norsk_historisk_avis_ocr_spark.sources.rasters import (
            raster_pages_df,
        )
        pages = raster_pages_df(spark, sf, limit=80, partitions=8)
        geo = segment_png_pages(pages)
        def _n(col):  # size(NULL) is -1 by default — keep NULLs NULL
            return F.when(F.col(col).isNull(), F.lit(None)) \
                .otherwise(F.size(col)).cast("long")

        return geo.select(
            "page_id",
            (_n("boundaries") - 1).alias("n_cols"),
            F.to_json("boundaries").alias("boundaries_json"),
            F.to_json("body_top").alias("body_top_json"),
            F.col("title_box.x0").cast("long").alias("title_x0"),
            F.col("title_box.y1").cast("long").alias("title_y1"),
            _n("column_boxes").alias("n_boxes"),
            "decode_error")

    def extract_verified(spark, sf):
        """Self-verifying contract row for the non-SQL extraction pipeline:
        run the REAL ``extract_pages`` operator, join its output against the
        planted sidecar ground truth, and — inside the UDF — execute the
        *reference's own* text functions (``refexec.golden_text``) to derive
        the expected bytes per url. Emits one ``(n_checked, n_mismatch)``
        row whose oracle is constant SQL, so any byte drift in the pipeline
        becomes a value-hash FAIL at the driver gate (VERDICT r2 item 1)."""
        _ensure_worker_path(spark)
        pages = pages_df(spark, sf, with_sidecar=True)
        res = extract_pages(pages).select("url", "combined", "transcribed")
        truth = pages.select("url", "planted_header", "planted_columns")
        joined = res.join(truth, "url")

        def vfn(batches):
            import pandas as pd

            from norsk_historisk_avis_ocr_spark.refexec import golden_text
            n = bad = 0
            for pdf in batches:
                for combined, transcribed, header, cols in zip(
                        pdf["combined"], pdf["transcribed"],
                        pdf["planted_header"], pdf["planted_columns"]):
                    want_c, want_t = golden_text(header, cols)
                    n += 1
                    if combined != want_c or transcribed != want_t:
                        bad += 1
                yield pd.DataFrame({"n": [n], "bad": [bad]})
                n = bad = 0

        flags = joined.mapInPandas(vfn, schema="n long, bad long")
        return flags.agg(F.sum("n").alias("n_checked"),
                         F.sum("bad").alias("n_mismatch"))

    def raster_verified(spark, sf):
        """Self-verifying contract row for the raster L1-L4 pipeline: run
        the REAL ``segment_png_pages`` path (PNG decode → grayscale →
        geometry), then — inside the UDF — re-synthesize each page
        (deterministic generator) and execute the *reference's*
        ``_split_columns`` (``refexec.golden_geometry``) to compare title
        and column crop boxes exactly. One ``(n_checked, n_mismatch)`` row,
        constant oracle: geometry drift becomes a driver-gate FAIL."""
        _ensure_worker_path(spark)
        from norsk_historisk_avis_ocr_spark.operators.raster import (
            segment_png_pages,
        )
        from norsk_historisk_avis_ocr_spark.sources.rasters import (
            raster_pages_df,
        )
        pages = raster_pages_df(spark, sf, limit=40, partitions=8)
        geo = segment_png_pages(pages)

        def vfn(batches):
            import pandas as pd

            from norsk_historisk_avis_ocr_spark.refexec import golden_geometry
            from norsk_historisk_avis_ocr_spark.sources.rasters import (
                synth_page_array,
            )

            def as_tuple(box):
                if box is None:
                    return None
                return (box["x0"], box["y0"], box["x1"], box["y1"])

            for pdf in batches:
                n = bad = 0
                for row in pdf.itertuples(index=False):
                    n += 1
                    if row.decode_error is not None:
                        bad += 1
                        continue
                    want_title, want_cols = golden_geometry(
                        synth_page_array(row.page_id))
                    got_cols = [as_tuple(b) for b in row.column_boxes]
                    if (as_tuple(row.title_box) != want_title
                            or got_cols != want_cols):
                        bad += 1
                yield pd.DataFrame({"n": [n], "bad": [bad]})

        flags = geo.mapInPandas(vfn, schema="n long, bad long")
        return flags.agg(F.sum("n").alias("n_checked"),
                         F.sum("bad").alias("n_mismatch"))

    def raster_verified_jpeg(spark, sf):
        """JPEG leg of the self-verifying raster row: pages alternate by
        doc_id % 3 between grayscale baseline, 3-component YCbCr 4:2:0
        COLOR scans, and progressive (SOF2) grayscale (round-4 upgrades:
        newspaper scans are routinely color, library digitizations
        routinely progressive) — decoded by the in-tree ``stages/jpeg.py``
        / ``stages/jpeg_progressive.py`` decoders inside
        ``segment_image_pages`` and verified against the reference's
        ``_split_columns`` executed on the SAME decoded pixels — exact by
        construction regardless of JPEG loss. 700×520 pages keep the
        contract probe fast while still exercising dividers, masthead
        gaps, and subdivision."""
        _ensure_worker_path(spark)
        from norsk_historisk_avis_ocr_spark.operators.raster import (
            segment_image_pages,
        )
        from norsk_historisk_avis_ocr_spark.sources.rasters import (
            jpeg_pages_df,
        )
        pages = jpeg_pages_df(spark, sf, limit=16, partitions=8)
        geo = segment_image_pages(pages)

        def vfn(batches):
            import pandas as pd

            from norsk_historisk_avis_ocr_spark.refexec import golden_geometry
            from norsk_historisk_avis_ocr_spark.sources.rasters import (
                synth_color_page_array, synth_page_array,
            )
            from norsk_historisk_avis_ocr_spark.stages.jpeg import (
                decode_jpeg_gray, encode_jpeg_color, encode_jpeg_gray,
            )
            from norsk_historisk_avis_ocr_spark.stages.jpeg_progressive \
                import encode_jpeg_progressive

            def as_tuple(box):
                if box is None:
                    return None
                return (box["x0"], box["y0"], box["x1"], box["y1"])

            for pdf in batches:
                n = bad = 0
                for row in pdf.itertuples(index=False):
                    n += 1
                    if row.decode_error is not None:
                        bad += 1
                        continue
                    doc_id = int(row.page_id.split("-", 1)[1])
                    arm = doc_id % 3
                    if arm == 0:
                        decoded = decode_jpeg_gray(encode_jpeg_gray(
                            synth_page_array(row.page_id, width=700,
                                             height=520), quality=97))
                    elif arm == 1:
                        decoded = decode_jpeg_gray(encode_jpeg_color(
                            synth_color_page_array(row.page_id, width=700,
                                                   height=520),
                            quality=97, sampling=(2, 2)))
                    else:
                        decoded = decode_jpeg_gray(encode_jpeg_progressive(
                            synth_page_array(row.page_id, width=700,
                                             height=520), quality=97))
                    want_title, want_cols = golden_geometry(decoded)
                    got_cols = [as_tuple(b) for b in row.column_boxes]
                    if (as_tuple(row.title_box) != want_title
                            or got_cols != want_cols):
                        bad += 1
                yield pd.DataFrame({"n": [n], "bad": [bad]})

        flags = geo.mapInPandas(vfn, schema="n long, bad long")
        return flags.agg(F.sum("n").alias("n_checked"),
                         F.sum("bad").alias("n_mismatch"))

    def raster_verified_pdf(spark, sf):
        """PDF leg of the self-verifying raster row — the reference's
        PRIMARY input format (``ocr.py:25``; poppler rasterization at
        ``engines/tesseract_engine.py:133-142``). Pages arrive as one-page
        PDFs whose image XObject alternates DCTDecode (even doc_ids),
        FlateDecode+PNG-predictor (odd), and bilevel CCITTFaxDecode G4
        (doc_id % 8 == 3 — new r5), and whose cross-reference layout
        alternates classic tables vs PDF 1.5 xref streams with
        /ObjStm-packed graphs (doc_id % 4 — new r5), decoded by the
        in-tree ``stages/pdf.py`` inside ``segment_image_pages`` and
        verified
        against the reference's ``_split_columns`` executed on the SAME
        decoded pixels — exact by construction for both arms (the flate
        arm is lossless; the DCT arm re-derives the identical JPEG
        round-trip)."""
        _ensure_worker_path(spark)
        from norsk_historisk_avis_ocr_spark.operators.raster import (
            segment_image_pages,
        )
        from norsk_historisk_avis_ocr_spark.sources.rasters import (
            pdf_pages_df,
        )
        pages = pdf_pages_df(spark, sf, limit=16, partitions=8)
        geo = segment_image_pages(pages)

        def vfn(batches):
            import pandas as pd

            from norsk_historisk_avis_ocr_spark.refexec import golden_geometry
            from norsk_historisk_avis_ocr_spark.sources.rasters import (
                synth_page_array,
            )
            from norsk_historisk_avis_ocr_spark.stages.jpeg import (
                decode_jpeg_gray, encode_jpeg_gray,
            )

            def as_tuple(box):
                if box is None:
                    return None
                return (box["x0"], box["y0"], box["x1"], box["y1"])

            for pdf in batches:
                n = bad = 0
                for row in pdf.itertuples(index=False):
                    n += 1
                    if row.decode_error is not None:
                        bad += 1
                        continue
                    doc_id = int(row.page_id.split("-", 1)[1])
                    arr = synth_page_array(row.page_id, width=700,
                                           height=520)
                    if doc_id % 8 == 3:
                        # CCITT G4 arm: bilevel threshold, ink -> 0
                        import numpy as _np
                        decoded = _np.where(arr < 128, 0, 255) \
                            .astype(_np.uint8)
                    elif doc_id % 2 == 0:
                        decoded = decode_jpeg_gray(
                            encode_jpeg_gray(arr, quality=97))
                    else:
                        decoded = arr
                    want_title, want_cols = golden_geometry(decoded)
                    got_cols = [as_tuple(b) for b in row.column_boxes]
                    if (as_tuple(row.title_box) != want_title
                            or got_cols != want_cols):
                        bad += 1
                yield pd.DataFrame({"n": [n], "bad": [bad]})

        flags = geo.mapInPandas(vfn, schema="n long, bad long")
        return flags.agg(F.sum("n").alias("n_checked"),
                         F.sum("bad").alias("n_mismatch"))

    def overlay_verified(spark, sf):
        """Self-verifying row for the S8 annotated debug rasters
        (``render_debug_overlay`` — the reference's debug artifacts,
        ``engines/_columns.py:294-418``): run ``segment_image_pages`` with
        ``debug_overlay=True``, then in a second Arrow stage (1) re-render
        the overlay *from the stored geometry columns* on the regenerated
        page and require byte-identical PNG output — proving the geometry
        columns alone reproduce the artifact and the binary column survives
        Arrow/Spark transport untouched — and (2) decode the stored PNG
        with the in-tree decoder and audit dimensions + the body-top
        marker color (drawn last, so never overdrawn). One
        ``(n_checked, n_mismatch)`` row against a constant oracle."""
        _ensure_worker_path(spark)
        from norsk_historisk_avis_ocr_spark.operators.raster import (
            segment_image_pages,
        )
        from norsk_historisk_avis_ocr_spark.sources.rasters import (
            raster_pages_df,
        )
        pages = raster_pages_df(spark, sf, limit=24, partitions=8)
        geo = segment_image_pages(pages, debug_overlay=True)

        def vfn(batches):
            import numpy as np
            import pandas as pd

            from norsk_historisk_avis_ocr_spark.operators.raster import (
                render_debug_overlay,
            )
            from norsk_historisk_avis_ocr_spark.sources.rasters import (
                synth_page_array,
            )
            from norsk_historisk_avis_ocr_spark.stages.png import decode_png

            def as_tuple(box):
                if box is None:
                    return None
                return (box["x0"], box["y0"], box["x1"], box["y1"])

            for pdf in batches:
                n = bad = 0
                for row in pdf.itertuples(index=False):
                    n += 1
                    if row.decode_error is not None or row.debug_png is None:
                        bad += 1
                        continue
                    gray = synth_page_array(row.page_id)
                    geo_dict = {
                        "boundaries": list(row.boundaries),
                        "body_top": list(row.body_top),
                        "title_box": as_tuple(row.title_box),
                        "column_boxes": [as_tuple(b)
                                         for b in row.column_boxes],
                    }
                    got = bytes(row.debug_png)
                    if got != render_debug_overlay(gray, geo_dict):
                        bad += 1
                        continue
                    rgb = decode_png(got)
                    if rgb.shape != gray.shape + (3,):
                        bad += 1
                        continue
                    if len(row.body_top):
                        orange = ((rgb[:, :, 0] == 255)
                                  & (rgb[:, :, 1] == 160)
                                  & (rgb[:, :, 2] == 0))
                        if not bool(np.any(orange)):
                            bad += 1
                yield pd.DataFrame({"n": [n], "bad": [bad]})

        flags = geo.mapInPandas(vfn, schema="n long, bad long")
        return flags.agg(F.sum("n").alias("n_checked"),
                         F.sum("bad").alias("n_mismatch"))

    def vision_payloads_verified(spark, sf):
        """Self-verifying row for the X3 prep/encode budget loop
        (``stages/visionprep.py``): run ``vision_payloads`` over small
        synthetic pages with a tight byte budget (forcing the quality
        ladder + downscale schedule), then — in the verify UDF — decode
        each emitted base64 JPEG with the in-tree decoder and check it
        fits the budget, has the reported dimensions, and downscaled
        monotonically. (n_checked, n_mismatch) vs a constant oracle."""
        _ensure_worker_path(spark)

        def gen(batches):
            import pandas as pd

            from norsk_historisk_avis_ocr_spark.sources.rasters import (
                synth_page_array,
            )
            from norsk_historisk_avis_ocr_spark.stages.png import encode_png
            for pdf in batches:
                rows = []
                for doc_id in pdf["doc_id"]:
                    pid = f"vp-{int(doc_id)}"
                    arr = synth_page_array(pid, width=400, height=300)
                    rows.append({"page_id": pid, "png": encode_png(arr)})
                yield pd.DataFrame(rows)

        ids = _t(spark, sf, "documents").select("doc_id") \
            .orderBy("doc_id").limit(12).repartition(4, "doc_id")
        pages = ids.mapInPandas(gen, schema="page_id string, png binary")
        payloads = mm.vision_payloads(pages, url_col="page_id",
                                      max_bytes=30000)

        def vfn(batches):
            import base64

            import pandas as pd

            from norsk_historisk_avis_ocr_spark.stages.jpeg import (
                decode_jpeg_gray,
            )
            for pdf in batches:
                n = bad = 0
                for row in pdf.itertuples(index=False):
                    n += 1
                    if row.prep_error is not None:
                        bad += 1
                        continue
                    data = base64.standard_b64decode(row.payload_b64)
                    decoded = decode_jpeg_gray(data)
                    ok = (len(data) <= 30000
                          and len(data) == row.n_bytes
                          and decoded.shape == (row.height, row.width)
                          and row.width <= 400 and row.height <= 300
                          and row.media_type == "image/jpeg"
                          and 1 <= row.quality <= 95
                          and row.n_attempts >= 1)
                    if not ok:
                        bad += 1
                yield pd.DataFrame({"n": [n], "bad": [bad]})

        flags = payloads.mapInPandas(vfn, schema="n long, bad long")
        return flags.agg(F.sum("n").alias("n_checked"),
                         F.sum("bad").alias("n_mismatch"))

    def sections_verified(spark, sf):
        """Self-verifying row for the per-section sink (S6,
        ``explode_sections``): every exploded section row's byte span must
        slice out of ``combined`` exactly, reading order must start with
        the header when present, and per-url section counts must match the
        spans column. (n_checked, n_mismatch) vs a constant oracle."""
        _ensure_worker_path(spark)
        from norsk_historisk_avis_ocr_spark.operators.extract import (
            explode_sections,
        )
        res = extract_pages(pages_df(spark, sf))
        sections = explode_sections(res)
        joined = sections.join(
            res.select("url", "combined", "header",
                       F.size("spans").alias("n_spans")), "url")

        def vfn(batches):
            import pandas as pd
            for pdf in batches:
                n = bad = 0
                for row in pdf.itertuples(index=False):
                    if row.ord == 0:
                        n += 1  # one count per url (every url has ord 0),
                        # so n_checked is corpus-size-derivable in SQL;
                        # EVERY section row is still checked below
                    data = row.combined.encode("utf-8")
                    ok = (data[row.start:row.end].decode("utf-8") == row.text
                          and 0 <= row.ord < row.n_spans)
                    if row.section == "header":
                        ok = ok and row.ord == 0 and row.text == row.header
                    if not ok:
                        bad += 1
                yield pd.DataFrame({"n": [n], "bad": [bad]})

        flags = joined.mapInPandas(vfn, schema="n long, bad long")
        return flags.agg(F.sum("n").alias("n_checked"),
                         F.sum("bad").alias("n_mismatch"))

    def multimodal_frames(spark, sf):
        """Video frame-sampling plumbing (1→N mapInPandas expansion) over
        the oracle-visible corpus: frame count and time offsets derive
        from the sha256 stub, so DuckDB reproduces every row (the frame
        digest column is projected out — binary concat of NUL bytes is not
        portable SQL)."""
        _ensure_worker_path(spark)
        docs = _t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("doc_key"),
            F.encode("text", "UTF-8").alias("payload"))
        frames = mm.frame_samples(docs, every_ms=250, url_col="doc_key",
                                  bytes_col="payload")
        return frames.select(
            F.col("url").alias("doc_key"),
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.col("t_offset_ms").cast("long").alias("t_offset_ms"))

    def multimodal_resize(spark, sf):
        """Resize plumbing: aspect-preserving clamp of the stub dimensions
        to max_side=512 — the geometry math is exact-integer-reproducible
        in SQL (identical fp expression tree for the scale factor)."""
        _ensure_worker_path(spark)
        docs = _t(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("doc_key"),
            F.encode("text", "UTF-8").alias("payload"))
        resized = mm.resize_media(docs, max_side=512, url_col="doc_key",
                                  bytes_col="payload")
        return resized.select(
            F.col("url").alias("doc_key"),
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"))

    return {
        # -- extraction pipeline (non-SQL; rows-only checks) --------------
        "extract_pipeline": extract_pipeline,
        "multimodal_features": multimodal_features,
        "raster_layout": raster_layout,
        # -- self-verifying rows: Spark output vs EXECUTED reference -------
        "extract_verified": extract_verified,
        "raster_verified": raster_verified,
        "raster_verified_jpeg": raster_verified_jpeg,
        "raster_verified_pdf": raster_verified_pdf,
        "overlay_verified": overlay_verified,
        "vision_payloads_verified": vision_payloads_verified,
        "sections_verified": sections_verified,
        "multimodal_frames": multimodal_frames,
        "multimodal_resize": multimodal_resize,
        # -- window-shaped W1-W4 + friends ---------------------------------
        "w1_runlength_islands":
            lambda s, sf: w.runlength_islands(_t(s, sf, "events")),
        "w2_largest_island":
            lambda s, sf: w.largest_island_per_user(_t(s, sf, "events")),
        "w3_moving_average":
            lambda s, sf: w.moving_average(_t(s, sf, "events")),
        "w4_reading_order":
            lambda s, sf: w.reading_order_concat(_t(s, sf, "lineitem")),
        "sessionize_events":
            lambda s, sf: w.sessionize(_t(s, sf, "events")),
        "a4_upper_median":
            lambda s, sf: w.upper_median(_t(s, sf, "lineitem")),
        "topk_per_group":
            lambda s, sf: w.topk_per_group(_t(s, sf, "orders"), k=3),
        "exact_quantiles":
            lambda s, sf: w.exact_quantiles(_t(s, sf, "lineitem")),
        "value_histogram":
            lambda s, sf: _t(s, sf, "events").groupBy(
                F.floor(F.col("value") / 10).cast("long").alias("bucket"))
                .agg(F.count("*").alias("n"))
                .select("bucket", "n"),
        # -- joins / filters / aggregates ----------------------------------
        "j1_resume_antijoin": _j1_antijoin,
        "p_filter_project":
            lambda s, sf: _t(s, sf, "documents")
                .filter((F.col("lang") == "en") &
                        F.col("n_chars").between(100, 400))
                .select("doc_id", "source", "n_chars"),
        "agg_pricing_summary":
            lambda s, sf: _t(s, sf, "lineitem")
                .groupBy("l_returnflag", "l_linestatus").agg(
                    F.sum(F.round(F.col("l_quantity")).cast("long"))
                     .alias("sum_qty"),
                    F.sum(F.round(F.col("l_extendedprice") * 100)
                          .cast("long")).alias("sum_price_cents"),
                    F.count("*").alias("n_rows")),
        "broadcast_dim_join":
            lambda s, sf: _t(s, sf, "orders")
                .join(_t(s, sf, "customer"),
                      F.col("o_custkey") == F.col("c_custkey"))
                .join(F.broadcast(_t(s, sf, "nation")),
                      F.col("c_nationkey") == F.col("n_nationkey"))
                .join(F.broadcast(_t(s, sf, "region")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                .groupBy("r_name").agg(
                    F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                     .alias("revenue_cents"),
                    F.count("*").alias("n_orders")),
        # -- dedup ----------------------------------------------------------
        "dedup_exact": _dedup_exact_with_dupes,
        # uncapped + hot-shingle-capped (max_shingle_df=3) variants of the
        # same operator in one driver row, tagged by max_df (0 = uncapped)
        # — variant folding keeps every distinct operator inside the
        # driver gate's 50-query window
        "dedup_ngram_jaccard":
            lambda s, sf: dd.ngram_jaccard_pairs(
                _t(s, sf, "documents"), k=3, threshold=0.12)
                .withColumn("max_df", F.lit(0).cast("long"))
                .unionByName(
                    dd.ngram_jaccard_pairs(
                        _t(s, sf, "documents"), k=3, threshold=0.12,
                        max_shingle_df=3)
                    .withColumn("max_df", F.lit(3).cast("long"))),
        # both per-doc signature generators (16-perm minhash + 56-bit
        # simhash) in one row, joined on doc_id
        "dedup_signatures":
            lambda s, sf: dd.minhash_signatures(_t(s, sf, "documents"))
                .join(dd.simhash_values(_t(s, sf, "documents")), "doc_id"),
        "dedup_minhash_lsh":
            lambda s, sf: dd.minhash_lsh_pairs(
                _t(s, sf, "documents"), est_threshold=0.125),
        # BOTH transitive-closure algorithms (sequential min-label and the
        # O(log d)-round large-star/small-star scale variant) run and must
        # produce the identical labeling — one row, tagged by algo
        "dedup_components":
            lambda s, sf: dd.connected_components(
                dd.minhash_lsh_pairs(_t(s, sf, "documents"),
                                     est_threshold=0.125))
                .withColumn("algo", F.lit("min_label"))
                .unionByName(
                    dd.connected_components_star(
                        dd.minhash_lsh_pairs(_t(s, sf, "documents"),
                                             est_threshold=0.125))
                    .withColumn("algo", F.lit("star"))),
        # the two one-pass survivor policies (keep component min /
        # keep-smallest-of-pair) in one row, tagged by policy
        "dedup_survivors":
            lambda s, sf: dd.dedup_by_components(
                _t(s, sf, "documents").select("doc_id"),
                dd.minhash_lsh_pairs(_t(s, sf, "documents"),
                                     est_threshold=0.125))
                .select("doc_id")
                .withColumn("policy", F.lit("component_min"))
                .unionByName(
                    dd.drop_near_duplicates(
                        _t(s, sf, "documents").select("doc_id"),
                        dd.minhash_lsh_pairs(_t(s, sf, "documents"),
                                             est_threshold=0.125))
                    .select("doc_id")
                    .withColumn("policy", F.lit("drop_larger"))),
        # approximate h<=12 + pigeonhole-guaranteed h<=3 variants of the
        # 4-chunk banding in one row, tagged by max_h
        "dedup_simhash":
            lambda s, sf: dd.simhash_dup_pairs(
                _t(s, sf, "documents"), max_hamming=12)
                .withColumn("max_h", F.lit(12).cast("long"))
                .unionByName(
                    dd.simhash_dup_pairs(
                        _t(s, sf, "documents"), max_hamming=3)
                    .withColumn("max_h", F.lit(3).cast("long"))),
        # d+1-chunk banding: 7 chunks pigeonhole-guarantee FULL recall at
        # hamming <= 6 — the arbitrary-distance variant the 4-chunk default
        # can't provide (see simhash_dup_pairs docstring)
        "dedup_simhash_h6_c7":
            lambda s, sf: dd.simhash_dup_pairs(
                _t(s, sf, "documents"), max_hamming=6, chunks=7),
        # -- similarity search ---------------------------------------------
        "emb_cosine_topk":
            lambda s, sf: sim.cosine_topk(_t(s, sf, "embeddings"), 0, k=10),
        "emb_ivf_topk":
            lambda s, sf: sim.ivf_topk(_t(s, sf, "embeddings"), 0, k=5),
        # dim=64 (TESTDATA.md embeddings) keeps plan construction fully
        # lazy — no first() probe job inside hyperplane_signature.
        # exact-bucket + one-bit multi-probe variants tagged by probed
        "emb_lsh_topk":
            lambda s, sf: sim.lsh_bucket_topk(_t(s, sf, "embeddings"), 0,
                                              k=5, dim=64)
                .withColumn("probed", F.lit(0).cast("long"))
                .unionByName(
                    sim.lsh_bucket_topk(_t(s, sf, "embeddings"), 0, k=5,
                                        multi_probe=True, dim=64)
                    .withColumn("probed", F.lit(1).cast("long"))),
        # learned-cell IVF (deterministic Lloyd k-means). quantize=6 rounds
        # each recomputed centroid component so the iteration is
        # engine-reproducible: the DuckDB oracle re-runs the SAME unrolled
        # 3-round Lloyd recursion (seeds = 4 smallest vec_ids are raw input
        # floats, distances are computed from identical doubles, and the
        # only cross-engine fp divergence — avg aggregation order — is
        # absorbed by the rounding). Upgraded from rows-only in round 3.
        "emb_ivf_learned_topk":
            lambda s, sf: km.ivf_cells_topk(_t(s, sf, "embeddings"), 0,
                                            k_cells=4, top_k=5, iters=3,
                                            quantize=6),
        "emb_dup_pairs":
            lambda s, sf: sim.embedding_dup_pairs(_t(s, sf, "embeddings"),
                                                  threshold=0.4),
        # exact-bucket + one-bit multi-probe candidate generation in one
        # row, tagged by probed
        "emb_dup_pairs_lsh":
            lambda s, sf: sim.embedding_dup_pairs_lsh(_t(s, sf, "embeddings"),
                                                      threshold=0.3, dim=64)
                .withColumn("probed", F.lit(0).cast("long"))
                .unionByName(
                    sim.embedding_dup_pairs_lsh(
                        _t(s, sf, "embeddings"), threshold=0.3,
                        multi_probe=True, dim=64)
                    .withColumn("probed", F.lit(1).cast("long"))),
        "dedup_keep_first": _dedup_keep_first,
        # -- skew handling ----------------------------------------------------
        "salted_hot_keys": _salted_hot_keys,
        # -- text analysis ---------------------------------------------------
        "lang_id": lambda s, sf: q.language_id(_t(s, sf, "documents")),
        # per-doc token counts + quality components + stopword ratio in one
        # row (all three operators run; joined on doc_id)
        "text_stats":
            lambda s, sf: q.token_counts(_t(s, sf, "documents"))
                .join(q.quality_scores(_t(s, sf, "documents")), "doc_id")
                .join(q.stopword_ratios(_t(s, sf, "documents")), "doc_id"),
        "fingerprints": lambda s, sf: q.fingerprints(_t(s, sf, "documents")),
        # corpus-driven confusion-lexicon induction (operators/lexicon.py):
        # top-50 alphabetic token frequencies with a deterministic tie-break
        # — the word list the confusion table is expanded from; the top-N
        # cut is TakeOrderedAndProject, not a global sort
        "lexicon_top_tokens":
            lambda s, sf: lx.token_frequencies(_t(s, sf, "documents"))
                .orderBy(F.desc("cnt"), F.asc("token")).limit(50),
        # PII-pattern audit + scrub over deterministically seeded text
        # (the synthetic corpus plants no emails/URLs; the seed does) —
        # per-doc pattern counts joined with the masked text in one row
        "pattern_audit":
            lambda s, sf: q.pattern_hygiene(
                _seed_patterns(_t(s, sf, "documents")))
                .join(q.scrub_patterns(_seed_patterns(_t(s, sf, "documents")))
                      .select("doc_id", F.col("text").alias("scrubbed")),
                      "doc_id"),
        # corpus-relative fluency: fraction of a doc's char bigrams that
        # are common corpus-wide (integer-exact perplexity analog)
        "bigram_familiarity":
            lambda s, sf: q.bigram_familiarity(_t(s, sf, "documents"),
                                               min_count=200),
        # -- corpus assembly (splits / sampling / packing) -------------------
        # stratified sample composed with the deterministic split (both
        # operators run; split labels over the surviving sample)
        "corpus_split_sample":
            lambda s, sf: cp.deterministic_split(
                cp.stratified_sample(
                    _t(s, sf, "documents"), rate=0.2, rates={"en": 0.5}))
                .select("doc_id", "lang", "split"),
        # default packing + the sub_shards=4 de-skew variant in one row
        # (pack_bucket = -1 tags the unsalted arm)
        "pack_sequences":
            lambda s, sf: cp.pack_sequences(_t(s, sf, "documents"),
                                            budget=512)
                .withColumn("pack_bucket", F.lit(-1).cast("long"))
                .unionByName(
                    cp.pack_sequences(_t(s, sf, "documents"), budget=512,
                                      sub_shards=4)),
        # composed pipeline: dedup (keep-first over the planted-duplicate
        # corpus) → language allowlist → quality floor → token counts
        "corpus_prep":
            lambda s, sf: q.corpus_prep(
                _t(s, sf, "documents").select("doc_id", "text").unionAll(
                    _t(s, sf, "documents").select(
                        (F.col("doc_id") + 100000).alias("doc_id"), "text")),
                min_quality=0.6, langs=("en",)),
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — value-exact equivalents
# ---------------------------------------------------------------------------

_H60 = "('0x' || substr(md5({x}), 1, 14))::BIGINT"  # 56-bit portable hash

_ISLANDS_CTE = """
WITH r AS (
  SELECT user_id, event_type, event_id,
         event_id - row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY event_id) AS island
  FROM events
),
isl AS (
  SELECT user_id, event_type,
         MIN(event_id) AS island_start, MAX(event_id) AS island_end,
         COUNT(*) AS island_len
  FROM r GROUP BY user_id, event_type, island
)
"""


def oracle_sql() -> dict[str, str]:
    sw_en = ",".join(f"'{x}'" for x in
                     ["the", "and", "of", "to", "in", "is", "that", "for",
                      "with"])
    # single source of truth: the oracle's marker table IS the classifier's
    # STOPWORDS dict, so the two engines cannot drift
    from norsk_historisk_avis_ocr_spark.functions.textqual import STOPWORDS
    markers = ",".join(f"('{lang}','{word}')"
                       for lang, ws in STOPWORDS.items() for word in ws)

    mh_prime = 2305843009213693951
    mh_terms = ",".join(
        f"MIN((h * {2 * i + 3} + {1000003 * (i + 1)}) % {mh_prime}) AS mh{i}"
        for i in range(16))
    band_keys = []
    for b in range(4):
        cols = "||'_'||".join(
            f"CAST(mh{b * 4 + r} AS VARCHAR)" for r in range(4))
        band_keys.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS band_key"
                         f" FROM sig")
    eq_terms = "+".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(16))

    shingles_cte = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    list_transform(range(1, len(t) - 1),
                   i -> array_to_string(list_slice(t, i, i + 2), ' '))
  ) AS shingle
  FROM toks WHERE len(t) >= 3
)
"""

    sig_cte = shingles_cte + f""",
h AS (SELECT doc_id, {_H60.format(x='shingle')} AS h FROM sh),
sig AS (SELECT doc_id, {mh_terms} FROM h GROUP BY doc_id)
"""

    # Hyperplane-LSH signature: the ±1 sign matrix is the same driver-side
    # precompute operators/similarity.py:plane_sign_rows embeds as literals
    # (md5-parity of "p:d"), so the oracle reproduces signatures exactly.
    # Embeddings are 64-dim in the driver testdata (TESTDATA.md).
    from norsk_historisk_avis_ocr_spark.operators.similarity import (
        plane_sign_rows,
    )
    sign_rows = plane_sign_rows(8, 64)
    sig_terms = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(str(s) for s in sign_rows[p])}]::DOUBLE[]) > 0 "
        f"THEN {2 ** p} ELSE 0 END)"
        for p in range(8))
    lsh_sig_cte = f"""
WITH sig AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         CAST({sig_terms} AS BIGINT) AS lsh_sig
  FROM embeddings
)
"""

    # chunk banding table shared with the Spark operator: (chunk, shift,
    # mask) rows come from the SAME simhash_chunk_spans the operator bands
    # with, so the two engines cannot drift on band geometry
    from norsk_historisk_avis_ocr_spark.operators.dedup import (
        simhash_chunk_spans,
    )

    def simhash_pairs_oracle(max_hamming: int, chunks: int) -> str:
        bands = ", ".join(
            f"({c}, {shift}, {(1 << width) - 1})"
            for c, (shift, width) in enumerate(simhash_chunk_spans(chunks)))
        return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
h AS (SELECT doc_id, {_H60.format(x='tok')} AS h FROM toks),
bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 55)) AS bit) b
  GROUP BY doc_id, b.bit
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
keyed AS (
  SELECT doc_id, simhash, c.chunk,
         (simhash >> c.shift) & c.mask AS chunk_val
  FROM sh, (VALUES {bands}) c(chunk, shift, mask)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM keyed a JOIN keyed b
    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""

    components_oracle = sig_cte.replace(
        "WITH toks", "WITH RECURSIVE toks", 1) + f""",
banded AS ({' UNION ALL '.join(band_keys)}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sig sa ON sa.doc_id = doc_a
  JOIN sig sb ON sb.doc_id = doc_b
  WHERE ({eq_terms}) / 16.0 >= 0.125
),
e AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, x.dst FROM reach r JOIN e x ON r.dst = x.src
)
SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
FROM reach GROUP BY src
"""

    # Learned-IVF (deterministic Lloyd, k=4, iters=3, quantize=6) unrolled
    # into SQL: assignment = row_number argmin over the centroid set with
    # the (d2 asc, cell asc) tie-break the Spark operator's array_min struct
    # ordering implements; centroid recompute = 64 per-dim ROUND(avg, 6)
    # terms — the same quantization kmeans_assign(quantize=6) applies, which
    # is what makes the iteration engine-reproducible (seeds and distances
    # are computed from bit-identical doubles; only avg order differs and
    # the rounding absorbs it).
    _km_d2 = ("list_sum(list_transform(range(1, 65), "
              "i -> (e.v[i] - s.v[i]) * (e.v[i] - s.v[i])))")

    def _km_assign(cents: str, out: str) -> str:
        return f"""
{out} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, s.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_km_d2} ASC, s.cell ASC) AS rn
    FROM e CROSS JOIN {cents} s
  ) WHERE rn = 1
)"""

    _km_means = "[" + ", ".join(
        f"round(avg(v[{i + 1}]), 6)" for i in range(64)) + "]"
    kmeans_ivf_oracle = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64
),
c1 AS (SELECT vec_id AS cell, v FROM e ORDER BY vec_id LIMIT 4),
{_km_assign('c1', 'a1')},
c2 AS (SELECT cell, {_km_means} AS v FROM a1 GROUP BY cell),
{_km_assign('c2', 'a2')},
c3 AS (SELECT cell, {_km_means} AS v FROM a2 GROUP BY cell),
{_km_assign('c3', 'a3')},
q AS (SELECT cell AS qcell, v AS qv FROM a3 WHERE vec_id = 0),
s AS (
  SELECT a3.vec_id,
         ROUND(list_dot_product(a3.v, qv) /
               (sqrt(list_dot_product(a3.v, a3.v)) *
                sqrt(list_dot_product(qv, qv))), 3) AS cos_sim
  FROM a3, q WHERE a3.vec_id <> 0 AND a3.cell = qcell
)
SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
"""

    cos = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
               (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(qv, qv))), 3) AS cos_sim
  FROM embeddings, q WHERE vec_id <> 0
)
"""

    return {
        # self-verifying pipeline rows: the Spark side compares its own
        # output against the EXECUTED reference inside the UDF and reports
        # (n_checked, n_mismatch); the oracle only has to assert the corpus
        # size and zero mismatches — any byte/geometry drift hash-FAILs
        "extract_verified": """
SELECT COUNT(*) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch FROM documents
""",
        "raster_verified": """
SELECT LEAST(COUNT(*), 40) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch
FROM documents
""",
        "raster_verified_jpeg": """
SELECT LEAST(COUNT(*), 16) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch
FROM documents
""",
        "raster_verified_pdf": """
SELECT LEAST(COUNT(*), 16) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch
FROM documents
""",
        "overlay_verified": """
SELECT LEAST(COUNT(*), 24) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch
FROM documents
""",
        "vision_payloads_verified": """
SELECT LEAST(COUNT(*), 12) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch
FROM documents
""",
        # one check-count per url (ord-0 row), every section row verified
        "sections_verified": """
SELECT COUNT(*) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch FROM documents
""",
        # stub-deterministic 1→N frame expansion: n_frames and offsets
        # derive from sha256(text) byte 2 (hex chars 5-6), every_ms=250
        "multimodal_frames": """
WITH h AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_key, sha256(text) AS hx
  FROM documents
),
n AS (
  SELECT doc_key, 1 + ('0x' || substr(hx, 5, 2))::INT % 4 AS n_frames
  FROM h
)
SELECT doc_key, frame_idx, frame_idx * 250 AS t_offset_ms FROM (
  SELECT doc_key, CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_idx
  FROM n
)
""",
        # aspect-preserving clamp of the stub dims to max_side=512; the
        # scale expression tree matches resize_media's fp ops exactly
        "multimodal_resize": """
WITH h AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_key, sha256(text) AS hx
  FROM documents
),
d AS (
  SELECT doc_key,
         256 + ('0x' || substr(hx, 1, 2))::INT * 8 AS w,
         256 + ('0x' || substr(hx, 3, 2))::INT * 8 AS h
  FROM h
)
SELECT doc_key,
       CAST(TRUNC(w * LEAST(1.0, 512.0 / GREATEST(w, h))) AS BIGINT)
           AS width,
       CAST(TRUNC(h * LEAST(1.0, 512.0 / GREATEST(w, h))) AS BIGINT)
           AS height
FROM d
""",
        "w1_runlength_islands": _ISLANDS_CTE + """
SELECT user_id, event_type, island_start, island_end, island_len FROM isl
""",
        "w2_largest_island": _ISLANDS_CTE + """
, ranked AS (
  SELECT user_id, island_start, island_end, island_len,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY island_len DESC, island_start ASC) AS rn
  FROM isl
)
SELECT user_id, island_start, island_end, island_len FROM ranked WHERE rn = 1
""",
        "w3_moving_average": """
SELECT user_id, event_id,
       ROUND(CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) OVER w AS DOUBLE)
             / (COUNT(*) OVER w) / 1000.0, 6) AS smoothed
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING)
""",
        "w4_reading_order": """
SELECT l_orderkey,
       string_agg(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag) AS flags_in_order,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
""",
        "sessionize_events": """
WITH x AS (
  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s, ts FROM events
),
y AS (
  SELECT user_id, ts_s,
         CASE WHEN LAG(ts_s) OVER w IS NULL
                   OR ts_s - LAG(ts_s) OVER w > 1800 THEN 1 ELSE 0 END AS brk
  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
z AS (
  SELECT user_id, ts_s,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_s
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM y
)
SELECT user_id, MIN(ts_s) AS session_start, MAX(ts_s) AS session_end,
       COUNT(*) AS n_events
FROM z GROUP BY user_id, sid
""",
        "a4_upper_median": """
WITH r AS (
  SELECT l_returnflag, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag
             ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag, l_quantity AS upper_median_qty
FROM r WHERE rn = CAST(FLOOR(n / 2) AS BIGINT) + 1
""",
        "exact_quantiles": """
WITH r AS (
  SELECT l_returnflag, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag
             ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN l_quantity END) AS q25,
       MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN l_quantity END) AS q50,
       MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN l_quantity END) AS q75
FROM r GROUP BY l_returnflag
""",
        "value_histogram": """
SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bucket, COUNT(*) AS n
FROM events GROUP BY CAST(FLOOR(value / 10) AS BIGINT)
""",
        "topk_per_group": """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
             AS rank_in_group
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents, rank_in_group
FROM r WHERE rank_in_group <= 3
""",
        "j1_resume_antijoin": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
        "p_filter_project": """
SELECT doc_id, source, n_chars FROM documents
WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400
""",
        "agg_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "broadcast_dim_join": """
SELECT r_name,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
        "dedup_exact": """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
)
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_members
FROM corpus GROUP BY md5(text) HAVING COUNT(*) >= 2
""",
        # uncapped arm + hot-shingle-capped arm (df > 3 dropped on both
        # sides — the candidate-blowup guard) of the same operator, tagged
        # by max_df
        "dedup_ngram_jaccard": shingles_cte + """
, sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 3),
shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizesc AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
interc AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
           AS jaccard,
       CAST(0 AS BIGINT) AS max_df
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.12
UNION ALL
SELECT doc_a, doc_b,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6)
           AS jaccard,
       CAST(3 AS BIGINT) AS max_df
FROM interc
JOIN sizesc sa ON sa.doc_id = doc_a
JOIN sizesc sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.12
""",
        # both signature generators joined on doc_id (minhash over shingled
        # docs — len >= 3 tokens — inner-joined with the word simhash)
        "dedup_signatures": sig_cte + f""",
wtoks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
wh AS (SELECT doc_id, {_H60.format(x='tok')} AS h FROM wtoks),
bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM wh, (SELECT unnest(generate_series(0, 55)) AS bit) b
  GROUP BY doc_id, b.bit
),
sims AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT sig.*, sims.simhash FROM sig JOIN sims USING (doc_id)
""",
        "dedup_minhash_lsh": sig_cte + f""",
banded AS ({' UNION ALL '.join(band_keys)}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(({eq_terms}) / 16.0, 6) AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
WHERE ({eq_terms}) / 16.0 >= 0.125
""",
        # the two closure algorithms must produce the identical labeling:
        # one closure, both algo tags
        "dedup_components": components_oracle.replace(
            """SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
FROM reach GROUP BY src""",
            """, comps AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
  FROM reach GROUP BY src
)
SELECT doc_id, component_id, 'min_label' AS algo FROM comps
UNION ALL
SELECT doc_id, component_id, 'star' AS algo FROM comps"""),
        # the two survivor policies from the same pair set: corpus minus
        # non-representative cluster members (component min survives) and
        # keep-smallest-of-pair (docs never the larger id of a pair)
        "dedup_survivors": components_oracle.replace(
            """SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
FROM reach GROUP BY src""",
            """, comps AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
  FROM reach GROUP BY src
),
losers AS (SELECT DISTINCT doc_b FROM pairs)
SELECT d.doc_id, 'component_min' AS policy
FROM documents d LEFT JOIN comps c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL OR c.component_id = c.doc_id
UNION ALL
SELECT d.doc_id, 'drop_larger' AS policy
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_b
WHERE l.doc_b IS NULL"""),
        # approximate h<=12 arm + pigeonhole-guaranteed h<=3 arm over the
        # same 4-chunk candidate set, tagged by max_h
        "dedup_simhash": simhash_pairs_oracle(12, 4).replace(
            """SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 12""",
            """SELECT doc_a, doc_b,
       CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming,
       CAST(12 AS BIGINT) AS max_h
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 12
UNION ALL
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming,
       CAST(3 AS BIGINT) AS max_h
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3"""),
        # d+1-chunk banding: guaranteed recall at hamming <= 6 via 7 chunks
        "dedup_simhash_h6_c7": simhash_pairs_oracle(6, 7),
        "emb_cosine_topk": cos +
            "SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id ASC LIMIT 10",
        "emb_dup_pairs": """
SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
       ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) /
             (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                    CAST(a.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])))), 3)
           AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) /
            (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(a.embedding AS DOUBLE[]))) *
             sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])))), 3) >= 0.4
""",
        # exact-bucket arm + one-bit multi-probe arm (candidates from the
        # query's bucket plus every one-bit-flipped bucket), tagged by
        # probed
        "emb_lsh_topk": lsh_sig_cte + f"""
, q AS (SELECT lsh_sig AS qsig, e AS qv FROM sig WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         ROUND(list_dot_product(e, qv) /
               (sqrt(list_dot_product(e, e)) *
                sqrt(list_dot_product(qv, qv))), 3) AS cos_sim
  FROM sig, q WHERE vec_id <> 0 AND lsh_sig = qsig
),
qp AS (
  SELECT unnest([lsh_sig,
                 {', '.join(f'xor(lsh_sig, {1 << p})' for p in range(8))}])
             AS qsig,
         e AS qv
  FROM sig WHERE vec_id = 0
),
sp AS (
  SELECT vec_id,
         ROUND(list_dot_product(e, qv) /
               (sqrt(list_dot_product(e, e)) *
                sqrt(list_dot_product(qv, qv))), 3) AS cos_sim
  FROM sig JOIN qp ON sig.lsh_sig = qp.qsig
  WHERE vec_id <> 0
)
SELECT vec_id, cos_sim, CAST(0 AS BIGINT) AS probed FROM
  (SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id ASC LIMIT 5)
UNION ALL
SELECT vec_id, cos_sim, CAST(1 AS BIGINT) AS probed FROM
  (SELECT vec_id, cos_sim FROM sp ORDER BY cos_sim DESC, vec_id ASC LIMIT 5)
""",
        # exact-bucket pairs + one-bit multi-probe pairs (one join side
        # probes every one-bit-flipped signature → recall of hamming<=1
        # signature pairs), tagged by probed
        "emb_dup_pairs_lsh": lsh_sig_cte + f"""
, scored AS (
  SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
         ROUND(list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) *
                sqrt(list_dot_product(b.e, b.e))), 3) AS cos_sim
  FROM sig a JOIN sig b
    ON a.lsh_sig = b.lsh_sig AND a.vec_id < b.vec_id
),
probes AS (
  SELECT vec_id, e,
         unnest([lsh_sig,
                 {', '.join(f'xor(lsh_sig, {1 << p})' for p in range(8))}])
             AS probe
  FROM sig
),
scoredp AS (
  SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
         ROUND(list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) *
                sqrt(list_dot_product(b.e, b.e))), 3) AS cos_sim
  FROM probes a JOIN sig b
    ON b.lsh_sig = a.probe AND a.vec_id < b.vec_id
)
SELECT vid_a, vid_b, cos_sim, CAST(0 AS BIGINT) AS probed
FROM scored WHERE cos_sim >= 0.3
UNION ALL
SELECT DISTINCT vid_a, vid_b, cos_sim, CAST(1 AS BIGINT) AS probed
FROM scoredp WHERE cos_sim >= 0.3
""",
        # learned-cell IVF: the full 3-round Lloyd recursion unrolled (was
        # rows-only through round 2; value-exact from round 3)
        "emb_ivf_learned_topk": kmeans_ivf_oracle,
        "emb_ivf_topk": """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
           FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT vec_id,
         ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
               (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(qv, qv))), 3) AS cos_sim
  FROM embeddings, q WHERE vec_id <> 0 AND label = qlabel
)
SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
""",
        "dedup_keep_first": """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)
)
SELECT doc_id FROM keepers
""",
        # the salted two-phase count and sum must both equal the plain
        # GROUP BY
        "salted_hot_keys": """
SELECT user_id, COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT)
           AS value_milli
FROM events GROUP BY user_id
""",
        "lang_id": f"""
WITH markers(cand_lang, word) AS (VALUES {markers}),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
hits AS (
  SELECT doc_id, cand_lang, COUNT(*) AS hits
  FROM toks JOIN markers USING (word) GROUP BY doc_id, cand_lang
),
best AS (
  SELECT doc_id, cand_lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand_lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id, COALESCE(b.cand_lang, 'und') AS pred_lang,
       COALESCE(b.hits, 0) AS marker_hits
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON d.doc_id = b.doc_id
""",
        # token counts + quality components + stopword ratio in one select
        # (same expressions the three standalone oracles used)
        "text_stats": r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS n_ws_tokens,
       len(regexp_extract_all(text, '[\p{L}]+|[0-9]+|[^\s\p{L}0-9]'))
           AS n_bpe_tokens,
       length(text) AS n_chars_computed,
       ROUND(length(regexp_replace(text, '[^A-Za-zÆØÅæøå]', '', 'g'))
             / GREATEST(length(text), 1), 6) AS alpha_ratio,
       ROUND(LEAST(length(text) / 200.0, 1.0)
             * (length(regexp_replace(text, '[^A-Za-zÆØÅæøå]', '', 'g'))
                / GREATEST(length(text), 1))
             * (1.0 - LEAST((length(regexp_replace(text, '[^.,;:!?|]', '', 'g'))
                             / GREATEST(length(text), 1)) * 5, 1.0)), 6)
           AS quality,
       ROUND(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                             x -> list_contains([SWEN], x)))
             / GREATEST(len(regexp_split_to_array(trim(lower(text)), '\s+')),
                        1), 6) AS en_stopword_ratio
FROM documents
""".replace("SWEN", sw_en),
        # Stub decode is sha256(payload)-derived; payload here is the UTF-8
        # encoding of documents.text, so DuckDB's sha256(text) (which hashes
        # the UTF-8 bytes) reproduces every value. The magic-byte CASE omits
        # PNG/JPEG/0x89/0xFF magics: those bytes cannot begin a valid UTF-8
        # encoding of a string, so the Python sniff can never return them for
        # this payload; the reachable magics (all ASCII/NUL/decodable) are
        # replicated in sniff order.
        "multimodal_features": """
WITH h AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_key, text, sha256(text) AS hx
  FROM documents
)
SELECT doc_key,
  CASE
    WHEN starts_with(text, 'II*' || chr(0)) THEN 'image/tiff'
    WHEN starts_with(text, 'MM' || chr(0) || '*') THEN 'image/tiff'
    WHEN starts_with(text, '%PDF') THEN 'application/pdf'
    WHEN starts_with(text, 'RIFF') THEN 'audio/wav'
    WHEN starts_with(text, chr(26) || 'E' || chr(2019)) THEN 'video/webm'
    ELSE 'application/octet-stream'
  END AS media_type,
  strlen(text) AS n_bytes,
  CAST(256 + ('0x' || substr(hx, 1, 2))::INT * 8 AS BIGINT) AS width,
  CAST(256 + ('0x' || substr(hx, 3, 2))::INT * 8 AS BIGINT) AS height,
  CAST(1 + ('0x' || substr(hx, 5, 2))::INT % 4 AS BIGINT) AS n_frames,
  CAST(len(list_filter(range(0, 16),
           i -> ('0x' || substr(hx, 1 + 4 * i, 4))::INT >= 32768))
       AS BIGINT) AS n_pos_features
FROM h
""",
        # LEFT JOIN back to documents so docs shorter than k=8 chars keep a
        # (doc_id, NULL) row, matching Spark's array_min(empty) = NULL.
        "fingerprints": f"""
WITH per AS (
  SELECT doc_id, MIN(h) AS fp FROM (
    SELECT doc_id, unnest(
      list_transform(range(1, length(text) - 6),
                     i -> {_H60.format(x='substr(text, i, 8)')})
    ) AS h FROM documents
  ) GROUP BY doc_id
)
SELECT d.doc_id, per.fp AS fp
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
""",
        # confusion-lexicon induction: whitespace tokens, edge punctuation
        # stripped (the normalizer's _PUNCT class), lowercase alphabetic
        # ≥3 chars, top-50 by (count desc, token asc); EXTRAWS = the same
        # unicode-space class members the Spark side splits on
        "lexicon_top_tokens": r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(text, '[\sEXTRAWS]+')) AS tok
  FROM documents
), cores AS (
  SELECT regexp_replace(regexp_replace(lower(tok),
           '^[.,;:!?«»"''()\[\]{}\-–—]+', ''),
           '[.,;:!?«»"''()\[\]{}\-–—]+$', '') AS token
  FROM toks
), freq AS (
  SELECT token, COUNT(*) AS cnt FROM cores
  WHERE regexp_matches(token, '^[a-zæøå]+$') AND length(token) >= 3
  GROUP BY token
)
SELECT token, cnt FROM freq ORDER BY cnt DESC, token ASC LIMIT 50
""".replace("EXTRAWS", lx._EXTRA_WS),
        # identical seeded text, identical patterns (shared Java/RE2
        # syntax); DuckDB regexp_* need the explicit 'g' flag. Audit
        # counts + the masked text in one row.
        "pattern_audit": r"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0 THEN 'SEEDA'
                      WHEN doc_id % 5 = 0 THEN 'SEEDB'
                      ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CAST(length(regexp_extract_all(text, 'EMAILRE')) AS BIGINT)
         AS n_emails,
       CAST(length(regexp_extract_all(text, 'URLRE')) AS BIGINT) AS n_urls,
       CAST(length(regexp_extract_all(text, 'PHONERE')) AS BIGINT)
         AS n_phones,
       ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
             / GREATEST(length(text), 1), 6) AS digit_ratio,
       regexp_replace(regexp_replace(text, 'URLRE', '[URL]', 'g'),
                      'EMAILRE', '[EMAIL]', 'g') AS scrubbed
FROM seeded
""".replace("SEEDA", _SEED_A).replace("SEEDB", _SEED_B)
   .replace("EMAILRE", q.EMAIL_RE).replace("URLRE", q.URL_RE)
   .replace("PHONERE", q.PHONE_RE),
        # integer-exact familiarity: char bigrams via range+list_transform
        # (DuckDB 1.0 has no lateral generate_series); docs shorter than
        # 2 chars have no bigrams and are absent on both sides
        "bigram_familiarity": """
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(t)),
                               i -> substring(t, i, 2))) AS bigram
  FROM d WHERE length(t) >= 2
),
cnts AS (SELECT bigram, COUNT(*) AS cnt FROM bi GROUP BY bigram),
common AS (SELECT bigram FROM cnts WHERE cnt >= 200)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN c.bigram IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_common,
       ROUND(SUM(CASE WHEN c.bigram IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS familiarity
FROM bi b LEFT JOIN common c ON b.bigram = c.bigram
GROUP BY b.doc_id
""",
        # stratified sample (hash-rate filter) composed with the
        # hash-bucket split — same portable-hash arithmetic as
        # operators/corpus.py, different salts decorrelate the decisions
        "corpus_split_sample": f"""
WITH b AS (
  SELECT doc_id, lang,
         {_H60.format(x=chr(39) + 'sample-v1:' + chr(39)
                      + ' || CAST(doc_id AS VARCHAR)')} % 1000000 AS sbucket,
         {_H60.format(x=chr(39) + 'split-v1:' + chr(39)
                      + ' || CAST(doc_id AS VARCHAR)')} % 1000000 AS bucket
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bucket < 900000 THEN 'train'
            WHEN bucket < 950000 THEN 'val'
            ELSE 'test' END AS split
FROM b
WHERE sbucket < CASE WHEN lang = 'en' THEN 500000 ELSE 200000 END
""",
        # block-style packing: pack_id = chunk index of the document's
        # first token when the group is concatenated in doc_id order.
        # Unsalted arm (pack_bucket = -1) + the sub_shards=4 de-skew arm
        # (hash-routed pack_bucket, window per (source, bucket)).
        "pack_sequences": (r"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
             AS n_tokens
  FROM documents
),
tb AS (
  SELECT doc_id, source, n_tokens, HASHEXPR % 4 AS pack_bucket FROM t
)
SELECT doc_id, source, CAST(-1 AS BIGINT) AS pack_bucket,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
            AS BIGINT) AS pack_id
FROM t
UNION ALL
SELECT doc_id, source, CAST(pack_bucket AS BIGINT) AS pack_bucket,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
                PARTITION BY source, pack_bucket ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
            AS BIGINT) AS pack_id
FROM tb
""").replace("HASHEXPR",
             _H60.format(x=chr(39) + 'pack-v1:' + chr(39)
                         + ' || CAST(doc_id AS VARCHAR)')),
        "corpus_prep": f"""
WITH markers(cand_lang, word) AS (VALUES {markers}),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
kept AS (
  SELECT c.doc_id, c.text FROM corpus c
  JOIN keepers k ON c.doc_id = k.doc_id
),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM kept
),
hits AS (
  SELECT doc_id, cand_lang, COUNT(*) AS hits
  FROM toks JOIN markers USING (word) GROUP BY doc_id, cand_lang
),
best AS (
  SELECT doc_id, cand_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand_lang ASC) AS rn
  FROM hits
),
scored AS (
  SELECT k.doc_id,
         COALESCE(b.cand_lang, 'und') AS pred_lang,
         ROUND(LEAST(length(k.text) / 200.0, 1.0)
               * (length(regexp_replace(k.text, '[^A-Za-zÆØÅæøå]', '', 'g'))
                  / GREATEST(length(k.text), 1))
               * (1.0 - LEAST((length(regexp_replace(k.text, '[^.,;:!?|]',
                                                     '', 'g'))
                               / GREATEST(length(k.text), 1)) * 5, 1.0)), 6)
             AS quality,
         CAST(CASE WHEN length(trim(k.text)) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(k.text), '\\s+')) END
              AS BIGINT) AS n_ws_tokens
  FROM kept k LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
    ON k.doc_id = b.doc_id
)
SELECT doc_id, pred_lang, quality, n_ws_tokens FROM scored
WHERE quality >= 0.6 AND pred_lang IN ('en')
""",
    }

"""Reference-execution harness: run the *reference implementation's own
functions* side-by-side with this engine's output, for verification.

This module never copies reference code — it imports and EXECUTES the
reference repo (default ``/root/reference``, override with the
``NHAO_REFERENCE_PATH`` env var) to derive golden values at check time:

- text goldens via ``engines.tesseract_engine._clean_divider_noise`` /
  ``_reflow_text`` (the byte contract, SURVEY.md §5.2.1);
- layout goldens via ``engines._columns._split_columns`` through minimal
  PIL-protocol shims (``_Pixels``/``_Image``) over our numpy arrays.

It backs both the pytest parity suites and the *self-verifying contract
queries* (``extract_verified`` / ``raster_verified`` in
``__spark_entry__.py``): those queries compare the Spark pipeline's output
against the executed reference row-by-row inside the UDF and emit a single
``(n_checked, n_mismatch)`` row whose DuckDB oracle is a constant — so any
byte or geometry drift turns into a value-hash FAIL at the driver's
correctness gate instead of passing a rows-only check.
"""

from __future__ import annotations

import os
import sys

REFERENCE_PATH = os.environ.get("NHAO_REFERENCE_PATH", "/root/reference")


def ensure_reference_on_path() -> None:
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def reference_textops():
    """The reference's pure text functions (executed, never copied)."""
    ensure_reference_on_path()
    from engines.tesseract_engine import _clean_divider_noise, _reflow_text
    return _clean_divider_noise, _reflow_text


def reference_columns():
    """The reference's layout module (executed, never copied)."""
    ensure_reference_on_path()
    from engines import _columns
    return _columns


class Pixels:
    """numpy (H, W) array behind PIL's ``pixels[x, y]`` access protocol.
    ``tolist()`` rows make the reference's pure-Python pixel loops fast."""

    def __init__(self, arr):
        self._rows = arr.tolist()

    def __getitem__(self, xy):
        x, y = xy
        return self._rows[y][x]


class Image:
    """Just enough of PIL.Image for the reference's
    ``_detect_title_region``/``_split_columns``: ``convert("L")`` → self,
    ``size``, ``load()``, ``crop()`` records its box."""

    def __init__(self, arr, box=None):
        self._arr = arr
        self.box = box

    def convert(self, mode):
        assert mode == "L"
        return self

    @property
    def size(self):
        return (self._arr.shape[1], self._arr.shape[0])

    def load(self):
        return Pixels(self._arr)

    def crop(self, box):
        x0, y0, x1, y1 = (int(v) for v in box)
        return Image(self._arr[y0:y1, x0:x1], box=(x0, y0, x1, y1))


def golden_text(planted_header, planted_columns) -> tuple[str, str]:
    """(combined, transcribed) goldens for one page's planted sections,
    derived by executing the reference text functions — the same derivation
    the byte-identity pytest uses (``tests/test_pipeline_spark.py``)."""
    ref_clean, ref_reflow = reference_textops()
    raw_cols = list(planted_columns) if len(planted_columns) else [""]
    sections = []
    if planted_header is not None:
        sections.append(ref_clean(planted_header))
    sections += [ref_clean(c) for c in raw_cols]
    combined = "\n\n".join(sections) + "\n"
    reflowed = [ref_reflow(s) for s in sections]
    transcribed = "\n\n".join(s for s in reflowed if s) + "\n"
    return combined, transcribed


def golden_geometry(arr) -> tuple[tuple | None, list[tuple]]:
    """(title_box, column_boxes) goldens for one grayscale page, derived by
    executing the reference's ``_split_columns`` over the PIL shims."""
    ref = reference_columns()
    title, cols = ref._split_columns(Image(arr))
    return (title.box if title is not None else None), [c.box for c in cols]

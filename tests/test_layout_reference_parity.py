"""L1-L4 geometry parity against the *executed* reference.

``engines/_columns.py`` takes PIL images / ``pixels[x, y]`` access objects;
these shims expose our numpy arrays through that interface so the
reference's own loops run side-by-side with ``stages/layout.py`` — the same
execute-don't-trust strategy ``test_textops.py`` uses for the text stages.
Covers the order-dependent greedy peak clustering, drift corridors, the
trailing-peak and scan-limit edge cases, tie-breaks, and the full
``_split_columns`` crop geometry (SURVEY.md §7's top byte-fidelity
hazards)."""

import numpy as np
import pytest

from norsk_historisk_avis_ocr_spark.refexec import Image as _Image
from norsk_historisk_avis_ocr_spark.refexec import Pixels as _Pixels
from norsk_historisk_avis_ocr_spark.sources.rasters import synth_page_array
from norsk_historisk_avis_ocr_spark.stages.layout import (
    detect_title_region, find_band_dividers, find_gap_boundaries,
    split_columns_geometry,
)

from engines import _columns as ref  # /root/reference on sys.path (conftest)

# Smaller than contract pages: the reference walks pixels in pure Python.
W, H = 940, 680
PAGE_IDS = [f"parity-{i}" for i in range(8)]


@pytest.fixture(scope="module", params=PAGE_IDS)
def page(request):
    return synth_page_array(request.param, width=W, height=H)


def test_band_dividers_match_reference(page):
    ours = find_band_dividers(page)
    theirs = ref._find_band_dividers(_Pixels(page), W, H)
    assert ours == theirs


def test_title_region_matches_reference(page):
    geo = split_columns_geometry(page)
    boundaries = geo["boundaries"]
    box, body_top = detect_title_region(page, boundaries)
    ref_img, ref_body_top = ref._detect_title_region(_Image(page), boundaries)
    assert body_top == ref_body_top
    assert box == (ref_img.box if ref_img is not None else None)


def test_gap_boundaries_match_reference(page):
    # exercise L2 directly over the page's widest phase-1 segment
    dividers = find_band_dividers(page)
    phase1 = [0] + dividers + [W]
    widths = sorted(phase1[i + 1] - phase1[i] for i in range(len(phase1) - 1))
    median_w = widths[len(widths) // 2]
    y0 = int(H * 0.4)
    for i in range(len(phase1) - 1):
        left, right = phase1[i], phase1[i + 1]
        ours = find_gap_boundaries(page, left, right, y0, H,
                                   expected_col_width=median_w,
                                   min_gap_px=15)
        theirs = ref._find_gap_boundaries(_Pixels(page), left, right, y0, H,
                                          expected_col_width=median_w,
                                          min_gap_px=15)
        assert ours == theirs


def test_split_columns_geometry_matches_reference(page):
    geo = split_columns_geometry(page)
    ref_title, ref_cols = ref._split_columns(_Image(page))
    assert [tuple(b) for b in geo["column_boxes"]] == \
        [c.box for c in ref_cols]
    assert geo["title_box"] == (ref_title.box if ref_title is not None
                                else None)


def test_full_contract_size_page_parity():
    """One page at the contract generator's native 1460×1100 (the parity
    fixture pages are smaller for the reference's pure-Python loops) —
    guards against any size-dependent divergence (band count, scan limit,
    fallback width threshold)."""
    img = synth_page_array("page-9")  # contract page that triggers L2
    geo = split_columns_geometry(img)
    ref_title, ref_cols = ref._split_columns(_Image(img))
    assert [tuple(b) for b in geo["column_boxes"]] == [c.box for c in ref_cols]
    assert geo["title_box"] == (ref_title.box if ref_title is not None
                                else None)


# --- hand-built adversarial rasters for the named hazards ----------------

def _blank(h, w):
    return np.full((h, w), 255, dtype=np.uint8)


def _parity_pair(img):
    h, w = img.shape
    ours = find_band_dividers(img)
    theirs = ref._find_band_dividers(_Pixels(img), w, h)
    assert ours == theirs
    return ours


def test_trailing_peak_at_right_edge():
    img = _blank(400, 300)
    img[:, 296:] = 0  # dark run reaching the right edge (open peak)
    xs = _parity_pair(img)
    assert xs and xs[-1] >= 296


def test_greedy_cluster_order_dependence():
    # two dividers 18px apart: each new peak is within drift (15) of a
    # cluster mean that itself moves — assignment order decides membership
    img = _blank(600, 400)
    for b, (xa, xb) in enumerate([(100, 118), (104, 122), (109, 113)]):
        y0, y1 = b * 200, (b + 1) * 200
        img[y0:y1, xa:xa + 2] = 0
        img[y0:y1, xb:xb + 2] = 0
    _parity_pair(img)


def test_blank_run_open_at_scan_limit_not_a_gap():
    # column whose only large blank run reaches the 40% scan limit without
    # a terminating text row — must NOT count as a title gap in either impl
    img = _blank(500, 400)
    img[:, 199:202] = 0  # divider → two columns
    for y in range(0, 60, 4):
        img[y:y + 2, 10:190] = 0      # masthead-ish text
        img[y:y + 2, 210:390] = 0
    # rows 60..200 (scan limit = 200) left blank in both columns
    for y in range(205, 500, 8):
        img[y:y + 3, 10:190] = 0
        img[y:y + 3, 210:390] = 0
    boundaries = [0, 200, 400]
    ours = detect_title_region(img, boundaries)
    theirs = ref._detect_title_region(_Image(img), boundaries)
    assert ours[1] == theirs[1]
    assert ours[0] == (theirs[0].box if theirs[0] is not None else None)
    assert ours[0] is None  # the open run is not a gap


def test_elevated_group_tie_breaks_leftmost():
    # two single-column elevated islands (cols 0 and 2) → leftmost wins
    img = _blank(600, 620)
    img[:, 199:202] = 0
    img[:, 399:402] = 0
    boundaries = [0, 200, 400, 620]
    for x0, x1, elevated in [(5, 195, True), (205, 395, False),
                             (405, 615, True)]:
        if elevated:
            img[0:20, x0:x1] = 0          # title line
            # 50-row gap, then body from y=70
            for y in range(70, 600, 8):
                img[y:y + 3, x0:x1] = 0
        else:
            for y in range(5, 600, 8):
                img[y:y + 3, x0:x1] = 0
    ours_box, ours_top = detect_title_region(img, boundaries)
    ref_img, ref_top = ref._detect_title_region(_Image(img), boundaries)
    assert ours_top == ref_top
    assert ours_box == ref_img.box
    assert ours_box[0] == 0  # leftmost island chosen


def test_no_dividers_wide_page_fallback_subdivision():
    # no ink dividers; width > 730*1.5 → fallback column-width estimate
    # drives gap-coverage subdivision in both implementations
    img = _blank(700, 1500)
    for x0, x1 in [(20, 720), (760, 1480)]:
        for y in range(10, 690, 8):
            img[y:y + 3, x0:x1] = 0
    geo = split_columns_geometry(img)
    ref_title, ref_cols = ref._split_columns(_Image(img))
    assert [tuple(b) for b in geo["column_boxes"]] == \
        [c.box for c in ref_cols]
    assert len(geo["column_boxes"]) >= 2  # subdivision actually fired

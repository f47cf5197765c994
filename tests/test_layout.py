"""Geometry unit tests for the numpy layout stages (SURVEY.md §5.2.2).

Synthetic rasters with planted structure; expected values hand-computed
from the reference's documented semantics (``engines/_columns.py``)."""

import numpy as np

from norsk_historisk_avis_ocr_spark.stages.layout import (
    detect_title_region, find_band_dividers, find_gap_boundaries,
    split_columns_geometry,
)


def blank_page(w=2000, h=1200):
    return np.full((h, w), 255, dtype=np.uint8)


def draw_vline(img, x, w=3, y0=0, y1=None):
    img[y0:(y1 if y1 is not None else img.shape[0]), x:x + w] = 0


def fill_text_rows(img, x0, x1, y0, y1, step=2):
    """Dense body-text pattern: every ``step``-th row dark across the span."""
    img[y0:y1:step, x0:x1] = 0


def test_band_dividers_straight_lines():
    img = blank_page()
    draw_vline(img, 712)
    draw_vline(img, 1440)
    # 3px run [712,715) → center (712+715)//2 = 713
    assert find_band_dividers(img) == [713, 1441]


def test_band_dividers_with_drift_cluster_mean():
    img = blank_page(w=1000, h=1200)  # 6 bands of 200
    for b in range(6):
        draw_vline(img, 700 + 2 * b, w=3, y0=b * 200, y1=(b + 1) * 200)
    # per-band centers 701+2b → mean 706.0 → int → [706]
    assert find_band_dividers(img) == [706]


def test_band_dividers_min_band_coverage():
    img = blank_page(w=1000, h=1200)
    # line present in only 2 of 6 bands → below 50% → rejected
    draw_vline(img, 500, y0=0, y1=400)
    assert find_band_dividers(img) == []


def test_band_divider_run_to_right_edge():
    img = blank_page(w=400, h=200)
    draw_vline(img, 396, w=4)  # run [396,400) reaches edge
    assert find_band_dividers(img) == [(396 + 399) // 2]


def test_gap_boundaries_planted_valleys():
    img = np.zeros((600, 1500), dtype=np.uint8)  # all dark
    img[:, 500:530] = 255  # light valley 1
    img[:, 1000:1030] = 255  # light valley 2
    got = find_gap_boundaries(img, 0, 1500, 0, 600, expected_col_width=500,
                              min_gap_px=15)
    # full-height 30px gaps: smoothed hits 1.0 first at valley_start+7
    assert got == [507, 1007]


def test_gap_boundaries_narrow_gap_rejected():
    img = np.zeros((600, 1500), dtype=np.uint8)
    img[:, 500:510] = 255  # only 10px < min_gap_px=15 → no coverage
    got = find_gap_boundaries(img, 0, 1500, 0, 600, expected_col_width=500,
                              min_gap_px=15)
    assert got == []


def test_gap_boundaries_too_small_segment():
    img = np.zeros((40, 40), dtype=np.uint8)
    assert find_gap_boundaries(img, 0, 40, 0, 40, 20) == []


def _titled_page():
    """3 cols of 300px; cols 0-1 titled (gap rows 10..59, body from 60)."""
    img = blank_page(w=900, h=1000)
    for x0, x1 in [(0, 300), (300, 600)]:
        fill_text_rows(img, x0 + 10, x1 - 10, 0, 10, step=1)   # title text
        fill_text_rows(img, x0 + 10, x1 - 10, 60, 1000, step=2)  # body
    fill_text_rows(img, 610, 890, 0, 1000, step=2)  # col 2 dense from top
    return img


def test_title_region_detection():
    img = _titled_page()
    box, body_top = detect_title_region(img, [0, 300, 600, 900])
    assert body_top == [60, 60, 0]
    assert box == (0, 0, 600, 60)


def test_title_gap_below_minimum_ignored():
    img = blank_page(w=900, h=1000)
    for x0, x1 in [(0, 300), (300, 600), (600, 900)]:
        fill_text_rows(img, x0 + 10, x1 - 10, 0, 10, step=1)
        fill_text_rows(img, x0 + 10, x1 - 10, 45, 1000, step=2)  # gap 35 < 40
    box, body_top = detect_title_region(img, [0, 300, 600, 900])
    assert box is None and body_top == [0, 0, 0]


def test_title_tie_leftmost_group_wins():
    # cols 0 titled, col 1 plain, col 2 titled → two size-1 groups; leftmost
    img = blank_page(w=900, h=1000)
    for x0, x1 in [(0, 300), (600, 900)]:
        fill_text_rows(img, x0 + 10, x1 - 10, 0, 10, step=1)
        fill_text_rows(img, x0 + 10, x1 - 10, 60, 1000, step=2)
    fill_text_rows(img, 310, 590, 0, 1000, step=2)
    box, body_top = detect_title_region(img, [0, 300, 600, 900])
    assert box == (0, 0, 300, 60)
    assert body_top == [60, 0, 0]


def test_title_single_column_short_circuit():
    img = blank_page(w=500, h=500)
    box, body_top = detect_title_region(img, [0, 500])
    assert box is None and body_top == [0]


def test_open_gap_at_scan_limit_not_counted():
    # blank run reaching the 40% scan limit is never terminated → no title
    img = blank_page(w=600, h=1000)
    for x0, x1 in [(0, 300), (300, 600)]:
        fill_text_rows(img, x0 + 10, x1 - 10, 0, 10, step=1)
        fill_text_rows(img, x0 + 10, x1 - 10, 400, 1000, step=2)
    box, body_top = detect_title_region(img, [0, 300, 600])
    assert box is None and body_top == [0, 0]


def test_split_columns_full_page():
    img = blank_page(w=2000, h=1200)
    draw_vline(img, 712)
    draw_vline(img, 1440)
    fill_text_rows(img, 10, 700, 0, 1200)
    fill_text_rows(img, 730, 1430, 0, 1200)
    fill_text_rows(img, 1460, 1990, 0, 1200)
    geo = split_columns_geometry(img)
    assert geo["boundaries"] == [0, 713, 1441, 2000]
    assert geo["column_boxes"] == [
        (0, 0, 733, 1200), (693, 0, 1461, 1200), (1421, 0, 2000, 1200)]


def test_split_columns_single_column_fallback():
    img = blank_page(w=600, h=800)
    fill_text_rows(img, 10, 590, 0, 800)
    geo = split_columns_geometry(img)
    assert geo["boundaries"] == [0, 600]
    assert geo["column_boxes"] == [(0, 0, 600, 800)]
    assert geo["title_box"] is None


def test_split_columns_gap_fallback_no_dividers():
    # wide page, no ink dividers → fallback 730px expectation + gap valleys
    img = blank_page(w=1500, h=1200)
    dark_rows = np.arange(1200) % 3 != 0  # 2/3 dark < 80% band → no peaks
    img[np.ix_(dark_rows, np.r_[0:730, 760:1500])] = 0
    assert find_band_dividers(img) == []
    geo = split_columns_geometry(img)
    # n_expected = round(1500/730) = 2 → one boundary at the valley; the
    # smoothed coverage plateau's first max is valley_start + half_w = 737
    assert geo["boundaries"] == [0, 737, 1500]


def test_narrow_segment_filter():
    img = blank_page(w=1000, h=1200)
    draw_vline(img, 500)
    draw_vline(img, 515)  # 15px apart < 30 → merged away
    geo = split_columns_geometry(img)
    bs = geo["boundaries"]
    assert bs[0] == 0 and bs[-1] == 1000
    assert all(b2 - b1 >= 30 for b1, b2 in zip(bs, bs[1:]))

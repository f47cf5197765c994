"""XY-cut layout segmentation on raster pages — numpy, vectorized (L1-L4).

Semantic parity targets in the reference (behavior re-implemented on numpy
arrays, not ported loops):

- :func:`find_band_dividers`    ≡ ``engines/_columns.py:121-209`` (L1)
- :func:`find_gap_boundaries`   ≡ ``engines/_columns.py:212-291`` (L2)
- :func:`detect_title_region`   ≡ ``engines/_columns.py:4-118``  (L4)
- :func:`split_columns_geometry`≡ ``engines/_columns.py:421-524`` (L3)

The reference walks pixel-access objects with O(W·H) Python loops; here every
profile/coverage/blank computation is a numpy reduction, so a page costs a
handful of vectorized passes. Functions take a ``(H, W) uint8`` grayscale
array and return *geometry* (boundaries, boxes, per-column body tops) — the
Spark layer stores these as Arrow struct arrays (``blocks``), never images.

Determinism notes (byte-contract hazards called out in SURVEY.md §7):
- peak→cluster assignment is greedy and order-dependent; the loop is kept
  sequential per page (pages are the unit of parallelism, not pixels);
- the median is the reference's *upper median* (element ``len//2`` of the
  sorted widths), not a percentile;
- argmax tie-breaks take the first (leftmost) maximum;
- a blank run still open at the scan limit does not count as a title gap.
"""

from __future__ import annotations

import numpy as np

DARK_THRESHOLD = 200
BAND_HEIGHT = 200
DRIFT_PX = 15
MIN_BAND_FRAC = 0.50
MIN_SEGMENT_PX = 30
OVERLAP_PX = 20
LARGE_GAP_MIN = 40
TITLE_SCAN_FRAC = 0.40
BLANK_FRAC = 0.01
MIN_TITLE_FRAC = 0.05
FALLBACK_COL_WIDTH = 730


def _run_bounds(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start (inclusive) and end (exclusive) indices of True runs in a 1-D
    boolean mask."""
    padded = np.concatenate(([False], mask, [False]))
    d = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return starts, ends


def find_band_dividers(img: np.ndarray, threshold: int = DARK_THRESHOLD,
                       band_height: int = BAND_HEIGHT, drift_px: int = DRIFT_PX,
                       min_band_frac: float = MIN_BAND_FRAC) -> list[int]:
    """L1: ink divider x-positions via horizontal-band vertical projections.

    Per band, a peak is a maximal run of x where the dark-pixel count reaches
    80% of the band height; peaks cluster across bands within ±drift of the
    running cluster mean; clusters present in ≥ half the bands survive.
    """
    height, width = img.shape
    n_bands = max(1, height // band_height)
    band_peaks: list[list[int]] = []
    dark = img < threshold
    for b in range(n_bands):
        y0 = b * band_height
        y1 = min((b + 1) * band_height, height)
        band_h = y1 - y0
        if band_h < 20:
            continue
        v_profile = dark[y0:y1].sum(axis=0)
        over = v_profile >= band_h * 0.8
        starts, ends = _run_bounds(over)
        peaks = []
        for s, e in zip(starts, ends):
            if e == width and over[width - 1]:
                peaks.append((s + width - 1) // 2)
            else:
                peaks.append((s + e) // 2)
        band_peaks.append(peaks)

    if not band_peaks:
        return []

    # Greedy nearest-mean clustering; order dependence is part of the
    # geometry contract, so this stays a sequential loop (≤ dozens of peaks).
    clusters: list[list[tuple[int, int]]] = []
    sums: list[float] = []
    for b_idx, peaks in enumerate(band_peaks):
        for px in peaks:
            best_ci = -1
            best_dist = drift_px + 1
            for ci, cluster in enumerate(clusters):
                mean_x = sums[ci] / len(cluster)
                dist = abs(px - mean_x)
                if dist <= drift_px and dist < best_dist:
                    best_dist = dist
                    best_ci = ci
            if best_ci >= 0:
                clusters[best_ci].append((b_idx, px))
                sums[best_ci] += px
            else:
                clusters.append([(b_idx, px)])
                sums.append(float(px))

    min_bands = max(1, int(len(band_peaks) * min_band_frac))
    divider_xs = []
    for cluster, total in zip(clusters, sums):
        if len({b for b, _ in cluster}) >= min_bands:
            divider_xs.append(int(total / len(cluster)))
    divider_xs.sort()
    return divider_xs


def find_gap_boundaries(img: np.ndarray, x_start: int, x_end: int,
                        y_start: int, y_end: int, expected_col_width: int,
                        threshold: int = DARK_THRESHOLD, min_gap_px: int = 8,
                        min_coverage: float = 0.55) -> list[int]:
    """L2: subdivide a wide segment at whitespace-valley maxima.

    Gap coverage per x = fraction of rows where x sits inside a run of
    ≥ ``min_gap_px`` consecutive light pixels; smoothed with a 15px box
    filter; one boundary searched per expected column edge within ±30% of
    the expected width, accepted at coverage ≥ ``min_coverage``.
    """
    seg_width = x_end - x_start
    height = y_end - y_start
    if seg_width < 50 or height < 50:
        return []

    light = img[y_start:y_end, x_start:x_end] >= threshold
    idx = np.arange(seg_width)
    # index of nearest dark pixel at/left of each position (-1 if none)
    left_dark = np.maximum.accumulate(np.where(~light, idx[None, :], -1), axis=1)
    # index of nearest dark pixel at/right of each position (seg_width if none)
    rev = np.where(~light[:, ::-1], idx[None, :], -1)
    right_dark = seg_width - 1 - np.maximum.accumulate(rev, axis=1)[:, ::-1]
    run_len = right_dark - left_dark - 1
    in_gap = light & (run_len >= min_gap_px)
    coverage = in_gap.sum(axis=0).astype(np.float64)

    half_w = 7
    csum = np.concatenate(([0.0], np.cumsum(coverage)))
    lo = np.maximum(0, idx - half_w)
    hi = np.minimum(seg_width, idx + half_w + 1)
    smoothed = (csum[hi] - csum[lo]) / (hi - lo) / height

    n_expected = round(seg_width / expected_col_width)
    if n_expected < 2:
        return []

    search_radius = int(expected_col_width * 0.3)
    boundaries = []
    for b in range(1, n_expected):
        expected_rx = int(b * seg_width / n_expected)
        s_lo = max(50, expected_rx - search_radius)
        s_hi = min(seg_width - 50, expected_rx + search_radius)
        if s_lo >= s_hi:
            continue
        window = smoothed[s_lo:s_hi + 1]
        best_rx = s_lo + int(np.argmax(window))  # first max wins
        if window.max() >= min_coverage:
            boundaries.append(x_start + best_rx)
    return boundaries


def detect_title_region(img: np.ndarray, boundaries: list[int],
                        threshold: int = DARK_THRESHOLD):
    """L4: masthead/title region spanning contiguous elevated columns.

    Per column, body starts after the last *terminated* run of ≥ 40 blank
    rows inside the top 40% of the page; columns elevated above 5% of page
    height group into contiguous islands; the largest island (leftmost on
    ties) is the title region.

    Returns ``(title_box_or_none, body_top_per_column)`` where the box is
    ``(x0, y0, x1, y1)``.
    """
    height, width = img.shape
    n_cols = len(boundaries) - 1
    if n_cols < 2:
        return None, [0] * max(n_cols, 1)

    scan_limit = int(height * TITLE_SCAN_FRAC)
    dark = img[:scan_limit] < threshold

    body_start_y: list[int] = []
    for c in range(n_cols):
        x0, x1 = boundaries[c], boundaries[c + 1]
        col_w = x1 - x0
        if col_w < MIN_SEGMENT_PX:
            body_start_y.append(0)
            continue
        counts = dark[:, x0:x1].sum(axis=1)
        blank = counts < col_w * BLANK_FRAC
        starts, ends = _run_bounds(blank)
        last_end = 0
        for s, e in zip(starts, ends):
            if e >= scan_limit:
                continue  # run not terminated by a non-blank row in range
            if e - s >= LARGE_GAP_MIN:
                last_end = e
        body_start_y.append(int(last_end))

    min_title = int(height * MIN_TITLE_FRAC)
    elevated = [i for i in range(n_cols) if body_start_y[i] > min_title]
    if not elevated:
        return None, [0] * n_cols

    groups: list[list[int]] = [[elevated[0]]]
    for i in elevated[1:]:
        if i == groups[-1][-1] + 1:
            groups[-1].append(i)
        else:
            groups.append([i])
    title_cols = max(groups, key=len)  # ties → leftmost (max is stable)

    title_bottom = max(body_start_y[c] for c in title_cols)
    box = (boundaries[title_cols[0]], 0, boundaries[title_cols[-1] + 1], title_bottom)

    body_top = [0] * n_cols
    for c in title_cols:
        body_top[c] = body_start_y[c]
    return box, body_top


def split_columns_geometry(img: np.ndarray, overlap_px: int = OVERLAP_PX) -> dict:
    """L3: full three-phase segmentation → layout geometry for one page.

    Returns ``{"boundaries": [...], "body_top": [...], "title_box": box|None,
    "column_boxes": [(x0, y0, x1, y1), ...]}`` — the page-as-is fallback
    yields a single full-page column box.
    """
    height, width = img.shape

    divider_xs = find_band_dividers(img)
    phase1 = [0] + divider_xs + [width]

    seg_widths = sorted(phase1[i + 1] - phase1[i] for i in range(len(phase1) - 1))
    median_width = seg_widths[len(seg_widths) // 2] if seg_widths else width
    if not divider_xs and width > FALLBACK_COL_WIDTH * 1.5:
        median_width = FALLBACK_COL_WIDTH

    gap_y_start = int(height * 0.4)
    all_boundaries = set(phase1)
    for i in range(len(phase1) - 1):
        seg_l, seg_r = phase1[i], phase1[i + 1]
        if seg_r - seg_l > median_width * 1.5:
            all_boundaries.update(find_gap_boundaries(
                img, seg_l, seg_r, gap_y_start, height,
                expected_col_width=median_width, min_gap_px=15))

    merged = sorted(all_boundaries)
    final = [merged[0]]
    for i in range(len(merged) - 1):
        if merged[i + 1] - merged[i] < MIN_SEGMENT_PX:
            continue
        final.append(merged[i + 1])

    title_box, body_top = detect_title_region(img, final)

    boxes = []
    n_cols = len(final) - 1
    for i in range(n_cols):
        x0 = max(0, final[i] - overlap_px)
        x1 = min(width, final[i + 1] + overlap_px)
        top = body_top[i] if i < len(body_top) else 0
        boxes.append((x0, top, x1, height))

    if not boxes:
        title_box, body_top, boxes = None, [0], [(0, 0, width, height)]

    return {"boundaries": final, "body_top": body_top,
            "title_box": title_box, "column_boxes": boxes}

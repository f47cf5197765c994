"""Vision-API image preparation (X3): sharpen/contrast prep + the
size-budget JPEG encode loop, offline.

The reference prepares each page scan for its vision-model call by
sharpening, boosting contrast 1.3×, then JPEG-encoding under the API's
5 MB decoded-bytes budget — dropping quality by 10 per attempt while the
current quality exceeds 50 (so the ladder is 95, 85, …, 55, 45 — the
45 rung IS tried) and only then downscaling ×0.8 and resetting quality
(``engines/claude_vision_engine.py:98-127``). The network call itself
(X2) is out of scope by design (SURVEY §2.4 — no network in this
engine), but the *prep/encode loop* is pure local compute and is
implemented here for real against the in-tree JPEG encoder:

- :func:`sharpen` — 3×3 unsharp kernel (PIL ``ImageFilter.SHARPEN``'s
  public kernel: center 32, neighbors −2, divisor 16), edge-padded.
- :func:`adjust_contrast` — PIL ``ImageEnhance.Contrast`` math: interpolate
  each pixel against the rounded grayscale mean, clipped to [0, 255].
- :func:`resize_bilinear` — deterministic bilinear resampler (the analog
  of ``Image.resize``; exact PIL filter parity is not claimed — this prep
  feeds a lossy encoder and a vision model, not the byte contract).
- :func:`encode_image_under_limit` — the budget loop with the reference's
  exact schedule: quality 95, −10 steps while > 50, then ×0.8 downscale +
  quality reset, until the ENCODED bytes fit (the API checks decoded JPEG
  bytes, not the base64 string — same comparison here).
"""

from __future__ import annotations

import base64

import numpy as np

MAX_IMAGE_BYTES = 5 * 1024 * 1024  # the vision API's decoded-bytes budget


def sharpen(gray: np.ndarray) -> np.ndarray:
    """3×3 sharpen: out = (32·c − 2·Σ neighbors) / 16, edge-padded,
    rounded and clipped like an 8-bit filter pass."""
    g = gray.astype(np.float64)
    p = np.pad(g, 1, mode="edge")
    acc = np.zeros_like(g)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            w = 32.0 if (dy, dx) == (1, 1) else -2.0
            acc += w * p[dy:dy + g.shape[0], dx:dx + g.shape[1]]
    return np.clip(np.round(acc / 16.0), 0, 255).astype(np.uint8)


def adjust_contrast(gray: np.ndarray, factor: float = 1.3) -> np.ndarray:
    """out = mean + factor·(px − mean), mean = rounded grayscale mean —
    the PIL ImageEnhance.Contrast interpolation."""
    mean = int(gray.mean() + 0.5)
    out = mean + factor * (gray.astype(np.float64) - mean)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_bilinear(gray: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Deterministic bilinear resample to (new_h, new_w)."""
    h, w = gray.shape
    new_w = max(1, int(new_w))
    new_h = max(1, int(new_h))
    # sample at pixel centers (align like standard image resamplers)
    xs = (np.arange(new_w) + 0.5) * (w / new_w) - 0.5
    ys = (np.arange(new_h) + 0.5) * (h / new_h) - 0.5
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(xs - x0, 0.0, 1.0)
    fy = np.clip(ys - y0, 0.0, 1.0)
    g = gray.astype(np.float64)
    top = g[np.ix_(y0, x0)] * (1 - fx) + g[np.ix_(y0, x1)] * fx
    bot = g[np.ix_(y1, x0)] * (1 - fx) + g[np.ix_(y1, x1)] * fx
    out = top * (1 - fy)[:, None] + bot * fy[:, None]
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def prepare_image(gray: np.ndarray, contrast: float = 1.3) -> np.ndarray:
    """The reference's OCR prep: sharpen, then contrast boost."""
    return adjust_contrast(sharpen(gray), contrast)


def encode_image_under_limit(gray: np.ndarray,
                             max_bytes: int = MAX_IMAGE_BYTES,
                             prep: bool = True) -> dict:
    """JPEG-encode under ``max_bytes`` with the reference's schedule:
    quality 95; while too big AND quality > 50, drop quality by 10 (the
    last rung tried is 45); then downscale ×0.8 and reset quality to 95.
    Returns payload metadata + the base64 string the vision call would
    ship. Terminal quality is therefore always in {95, 85, 75, 65, 55,
    45}."""
    from .jpeg import encode_jpeg_gray

    img = prepare_image(gray) if prep else gray
    quality = 95
    n_attempts = 0
    while True:
        data = encode_jpeg_gray(img, quality=quality)
        n_attempts += 1
        if len(data) <= max_bytes:
            return {
                "payload_b64": base64.standard_b64encode(data).decode(),
                "media_type": "image/jpeg",
                "n_bytes": len(data),
                "width": int(img.shape[1]),
                "height": int(img.shape[0]),
                "quality": quality,
                "n_attempts": n_attempts,
            }
        if quality > 50:
            quality -= 10
            continue
        h, w = img.shape
        if w <= 8 or h <= 8:
            raise ValueError("cannot fit image under byte budget")
        img = resize_bilinear(img, int(w * 0.8), int(h * 0.8))
        quality = 95

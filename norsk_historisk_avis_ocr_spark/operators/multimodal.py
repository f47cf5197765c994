"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages — exactly the
pattern the html pipeline uses. ``decode_media`` yields REAL metadata
for every sniffed class: PNG/JPEG/TIFF pixel decode (``stages/png.py`` /
``jpeg.py`` / ``tiff.py``), PCM WAV samples + duration
(``stages/audio.py``), WebM/EBML container dims + duration
(``stages/webm.py``). Only compressed frame CONTENT (VP8/mp3 — codecs
the container doesn't have) is stubbed with deterministic digest
features, behind a clearly-marked switch, while all the Spark-side
plumbing — schema, batching, partitioning, UDF signatures, feature
vectors — is real and tested. Swapping a stub branch for a real decoder
changes one function.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_FEATURE_DIM = 16

MEDIA_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("media_type", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("duration_ms", LongType(), True),  # audio payloads only
    StructField("features", ArrayType(FloatType()), True),
])

# Magic-byte sniffing (real; mirrors the reference's extension dispatch,
# ``tesseract_engine.py:133-147``).
_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"%PDF", "application/pdf"),
    (b"RIFF", "audio/wav"),
    (b"\x1aE\xdf\xa3", "video/webm"),
]


def sniff_media_type(data: bytes) -> str:
    for magic, mt in _MAGIC:
        if data.startswith(magic):
            return mt
    return "application/octet-stream"


def _gray_features(gray) -> dict:
    """Shared real-image features: true dims + unit-normalized 16-bin
    grayscale histogram (deterministic)."""
    import numpy as np
    hist = np.bincount((gray.ravel() >> 4), minlength=16).astype(np.float64)
    norm = float(np.sqrt((hist * hist).sum())) or 1.0
    return {
        "width": int(gray.shape[1]), "height": int(gray.shape[0]),
        "n_frames": 1, "duration_ms": None,
        "features": [float(v / norm) for v in hist],
    }


_IMAGE_MAGICS = (b"\x89PNG", b"\xff\xd8\xff", b"II*\x00", b"MM\x00*",
                 b"%PDF-")


def _stub_features(data: bytes) -> list[float]:
    """Deterministic digest-derived unit vector — the stand-in feature for
    payloads with no decodable content (and for video frame content).
    Feature i ← big-endian 16-bit slice of sha256(data) at bytes
    [2i, 2i+2): exactly covers the 32-byte digest, every component
    informative, each an exact integer / 65535 − 0.5 so the SQL oracles
    reproduce it. SINGLE copy — the multimodal oracles mirror this
    formula."""
    digest = hashlib.sha256(data).digest()
    raw = [int.from_bytes(digest[2 * i:2 * i + 2], "big") / 65535.0 - 0.5
           for i in range(MEDIA_FEATURE_DIM)]
    norm = sum(v * v for v in raw) ** 0.5 or 1.0
    return [float(v / norm) for v in raw]


def decode_media(data: bytes, features: bool = True) -> dict:
    """Media decode: REAL metadata for every sniffed class — PNG/JPEG/TIFF
    pixel decode (``raster.decode_payload_gray``), PCM WAV samples +
    duration (``stages/audio.py``), WebM/EBML container dims + duration
    (``stages/webm.py``); deterministic digest stub for everything else
    (and for compressed frame CONTENT, which needs codecs the container
    doesn't have). A malformed payload falls through to the stub rather
    than failing the task (quarantine-by-degradation).

    ``features=False`` skips the feature-vector computation for
    metadata-only consumers (frame sampling, resize): WAV then reads only
    the header instead of decoding the full PCM payload; ``features`` is
    None in the result.
    """
    if data.startswith(_IMAGE_MAGICS):
        try:
            from .raster import decode_payload_gray
            return _gray_features(decode_payload_gray(data))
        except (ValueError, struct.error, zlib.error, IndexError):
            # corrupt/truncated/unsupported image (bad IDAT → zlib.error,
            # short header → struct.error, progressive JPEG / LZW TIFF /
            # length mismatch → ValueError): degrade to the stub
            pass
    elif data.startswith(b"RIFF"):
        try:
            from ..stages.audio import (
                amplitude_histogram, decode_wav, wav_metadata,
            )
            if features:
                wav = decode_wav(data)
                feats = amplitude_histogram(wav["samples"])
            else:
                wav = wav_metadata(data)  # O(header), no PCM read
                feats = None
            return {
                # image dims don't apply to audio; n_frames is the REAL
                # PCM frame count, duration drives the 1→N sampler
                "width": None, "height": None,
                "n_frames": wav["n_frames"],
                "duration_ms": wav["duration_ms"],
                "features": feats,
            }
        except (ValueError, struct.error, IndexError):
            # non-PCM/compressed/truncated RIFF: degrade to the stub
            pass
    elif data.startswith(b"\x1aE\xdf\xa3"):
        try:
            from ..stages.webm import parse_webm_metadata
            meta = parse_webm_metadata(data)
            if meta["width"] is not None or meta["duration_ms"] is not None:
                # REAL container metadata; frame CONTENT decode needs
                # VP8/VP9 codecs — the digest stub stands in for features
                return {
                    "width": meta["width"], "height": meta["height"],
                    "n_frames": None,
                    "duration_ms": meta["duration_ms"],
                    "features": _stub_features(data) if features else None,
                }
        except (ValueError, struct.error, IndexError):
            # malformed EBML: degrade to the stub
            pass
    digest = hashlib.sha256(data).digest()
    return {
        "width": 256 + digest[0] * 8,
        "height": 256 + digest[1] * 8,
        "n_frames": 1 + digest[2] % 4,
        "duration_ms": None,
        "features": _stub_features(data) if features else None,
    }


RESIZE_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("resized", StringType(), True),  # digest of the fake raster
])


def resize_media(df: DataFrame, max_side: int = 512, url_col: str = "url",
                 bytes_col: str = "html") -> DataFrame:
    """Resize plumbing: aspect-preserving clamp of the longer side to
    ``max_side`` — the geometry math is real (it is what a thumbnailing
    stage keys partitioning and cost models on); the raster op itself is
    stubbed like :func:`decode_media` (deterministic digest stands in for
    the resized pixels)."""
    def fn(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for u, data in zip(pdf[url_col], pdf[bytes_col]):
                data = bytes(data) if data is not None else b""
                meta = decode_media(data, features=False)
                w, h = meta["width"], meta["height"]
                if w is None or h is None:  # audio: no raster to resize
                    rows.append({"url": u, "width": None, "height": None,
                                 "resized": None})
                    continue
                scale = min(1.0, max_side / max(w, h))
                rows.append({
                    "url": u,
                    "width": int(w * scale),
                    "height": int(h * scale),
                    "resized": hashlib.sha256(
                        data + f"{scale:.6f}".encode()).hexdigest()[:16],
                })
            yield pd.DataFrame(rows)

    return df.select(F.col(url_col), F.col(bytes_col)) \
        .mapInPandas(fn, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("t_offset_ms", IntegerType(), False),
    StructField("frame", StringType(), True),  # digest of the fake frame
])


def frame_samples(df: DataFrame, every_ms: int = 1000,
                  url_col: str = "url", bytes_col: str = "html") -> DataFrame:
    """Frame/window sampling plumbing: one input row → N frame rows
    (1→N ``mapInPandas`` expansion — the shape real ffmpeg sampling uses).
    For REAL-decoded audio (PCM WAV) the sample count comes from the true
    duration — one window per ``every_ms``; for video the decode is
    stubbed like :func:`decode_media` (deterministic fake frame count);
    per-frame digests stand in for the frame payloads either way."""
    def fn(batches):
        import pandas as pd
        for pdf in batches:
            out = {"url": [], "frame_idx": [], "t_offset_ms": [], "frame": []}
            for u, data in zip(pdf[url_col], pdf[bytes_col]):
                data = bytes(data) if data is not None else b""
                meta = decode_media(data, features=False)
                if meta.get("duration_ms") is not None:
                    # real duration → one sample window per every_ms
                    n = max(1, int(meta["duration_ms"]) // every_ms + 1)
                else:
                    # container metadata without duration → one keyframe
                    n = meta["n_frames"] if meta["n_frames"] is not None \
                        else 1
                for i in range(n):
                    out["url"].append(u)
                    out["frame_idx"].append(i)
                    out["t_offset_ms"].append(i * every_ms)
                    out["frame"].append(
                        hashlib.sha256(data + i.to_bytes(4, "big"))
                        .hexdigest()[:16])
            yield pd.DataFrame(out)

    return df.select(F.col(url_col), F.col(bytes_col)) \
        .mapInPandas(fn, schema=FRAME_SCHEMA)


VISION_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("payload_b64", StringType(), True),
    StructField("media_type", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("quality", IntegerType(), True),
    StructField("n_attempts", IntegerType(), True),
    StructField("prep_error", StringType(), True),
])


def vision_payloads(df: DataFrame, url_col: str = "url",
                    bytes_col: str = "png",
                    max_bytes: int | None = None) -> DataFrame:
    """X3 as a DataFrame operator: decode each page payload (PNG/JPEG),
    run the reference's sharpen+contrast prep, and JPEG-encode under the
    vision API's byte budget with its quality/downscale schedule
    (``stages/visionprep.py``, mirroring
    ``claude_vision_engine.py:98-127``). The network call itself (X2)
    stays out of scope; this materializes exactly what that call would
    ship. Map-only; undecodable payloads yield a prep_error row."""
    from ..stages.visionprep import MAX_IMAGE_BYTES
    budget = max_bytes if max_bytes is not None else MAX_IMAGE_BYTES

    def fn(batches):
        import pandas as pd

        from ..stages.visionprep import encode_image_under_limit
        from .raster import decode_payload_gray

        for pdf in batches:
            rows = []
            for u, data in zip(pdf[url_col], pdf[bytes_col]):
                data = bytes(data) if data is not None else b""
                try:
                    gray = decode_payload_gray(data)
                    out = encode_image_under_limit(gray, max_bytes=budget)
                    rows.append({"url": u, **out, "prep_error": None})
                except (ValueError, struct.error, zlib.error,
                        IndexError) as exc:
                    rows.append({
                        "url": u, "payload_b64": None, "media_type": None,
                        "n_bytes": None, "width": None, "height": None,
                        "quality": None, "n_attempts": None,
                        "prep_error": f"{type(exc).__name__}: {exc}",
                    })
            yield pd.DataFrame(rows)

    return df.select(F.col(url_col), F.col(bytes_col)) \
        .mapInPandas(fn, schema=VISION_SCHEMA)


def media_features(df: DataFrame, url_col: str = "url",
                   bytes_col: str = "html") -> DataFrame:
    """binary column → typed media metadata + feature vector, batched."""
    def fn(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for u, data in zip(pdf[url_col], pdf[bytes_col]):
                data = bytes(data) if data is not None else b""
                meta = decode_media(data)
                rows.append({
                    "url": u,
                    "media_type": sniff_media_type(data),
                    "n_bytes": len(data),
                    **meta,
                })
            yield pd.DataFrame(rows)

    return df.select(F.col(url_col), F.col(bytes_col)) \
        .mapInPandas(fn, schema=MEDIA_SCHEMA)

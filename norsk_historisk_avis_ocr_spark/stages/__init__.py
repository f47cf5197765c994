"""Pure-Python/numpy stage library — the byte-identity contract layer.

Everything here is deterministic, Spark-free, and unit-testable. The Spark
layer (:mod:`..functions`, :mod:`..operators`) only wraps these functions in
Arrow-batched pandas UDFs.
"""

from .textops import (
    clean_divider_noise,
    reflow_text,
    combine_sections,
    transcribe_sections,
    section_spans,
    readable_diff,
)
from .normalize import OrthographyNormalizer, default_normalizer
from .htmlparse import parse_blocks, classify_blocks, extract_sections
from . import layout

__all__ = [
    "clean_divider_noise",
    "reflow_text",
    "combine_sections",
    "transcribe_sections",
    "section_spans",
    "readable_diff",
    "OrthographyNormalizer",
    "default_normalizer",
    "parse_blocks",
    "classify_blocks",
    "extract_sections",
    "layout",
]

"""Vectorized (Arrow-batched) UDFs and scalar function library."""

from .udfs import RESULT_SCHEMA, extract_map_fn, make_normalize_udf
from . import textqual, dedup

__all__ = ["RESULT_SCHEMA", "extract_map_fn", "make_normalize_udf",
           "textqual", "dedup"]

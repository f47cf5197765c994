import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
TESTDATA = "/root/testdata"

for p in (REPO, REFERENCE):
    if p not in sys.path:
        sys.path.insert(0, p)


@pytest.fixture(scope="session")
def spark():
    from norsk_historisk_avis_ocr_spark.plans import build_session
    s = build_session("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def reference_textops():
    """The reference's pure text functions, *executed* (never copied) to
    derive byte goldens — SURVEY.md §5.2.1."""
    from engines.tesseract_engine import _clean_divider_noise, _reflow_text
    from engines.tesseract_claude_engine import _readable_diff
    return _clean_divider_noise, _reflow_text, _readable_diff


@pytest.fixture(scope="session")
def documents_rows():
    import pyarrow.parquet as pq
    return pq.read_table(
        os.path.join(TESTDATA, "sf0.001", "documents.parquet")).to_pylist()

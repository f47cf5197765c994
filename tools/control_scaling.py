"""Spark-free scaling control: the exact extraction function under plain
multiprocessing. Separates hardware saturation from engine overhead —
compare its N→4N efficiency with tools/bench_scaling.py's.

Usage: python tools/control_scaling.py
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq  # noqa: E402

from norsk_historisk_avis_ocr_spark.sources.pages import build_page  # noqa: E402

PAGES = None
EXTRACT = None
NORM = None


def _init():
    global PAGES, EXTRACT, NORM
    from norsk_historisk_avis_ocr_spark.functions.udfs import extract_one
    from norsk_historisk_avis_ocr_spark.stages.normalize import (
        default_normalizer,
    )
    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet").to_pylist()
    PAGES = [build_page(d["doc_id"], d["text"], d["lang"]) for d in docs]
    EXTRACT = extract_one
    NORM = default_normalizer()


def _work(reps: int) -> int:
    for _ in range(reps):
        for p in PAGES:
            EXTRACT(p["url"], p["html"], NORM)
    return len(PAGES) * reps


def main():
    reps = 8
    rates = {}
    for n in [1, 8, 32]:
        with mp.Pool(n, initializer=_init) as pool:
            t0 = time.time()
            total = sum(pool.map(_work, [reps] * n))
            e = time.time() - t0
        rates[n] = total / e
        print(f"procs={n:2d} docs={total} wall={e:.2f}s "
              f"rate={total / e:,.0f} docs/s")
    print(f"efficiency 8->32: {(rates[32] / rates[8]) / 4:.3f}")


if __name__ == "__main__":
    main()

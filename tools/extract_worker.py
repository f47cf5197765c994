"""One timed extraction run at a given core count (scaling evidence worker).

Usage: python tools/extract_worker.py <cores> <pages_parquet_dir>
Prints one JSON line: {"cores": N, "docs": D, "extract_sec": S,
"docs_per_sec": R}.

Run as a subprocess so each measurement gets a fresh JVM with its own
local[N] master. The pages table must be materialized first (use
tools/bench_scaling.py, which does both) — production input is a stored
table, and timing the synthesizer UDF chained into extraction would
measure a sandbox artifact (two Python workers per task slot).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from norsk_historisk_avis_ocr_spark.operators import extract_pages  # noqa: E402
from norsk_historisk_avis_ocr_spark.plans import build_session  # noqa: E402


def main():
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]

    spark = build_session(f"bench-extract-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # one input split per file (the materialized table IS the intended
    # task granularity; default openCost would pack ~4 MB files together
    # and collapse the wave count — see the module docstring in
    # bench_scaling.py)
    spark.conf.set("spark.sql.files.openCostInBytes",
                   str(128 * 1024 * 1024))
    pages = spark.read.parquet(pages_path)
    n = pages.count()

    res = extract_pages(pages)
    res.write.format("noop").mode("overwrite").save()  # warm worker pool

    times = []
    for _ in range(3):
        t0 = time.time()
        res.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    best = min(times)

    print(json.dumps({
        "cores": cores, "docs": n,
        "extract_sec": round(best, 2),
        "all_runs_sec": [round(x, 2) for x in times],
        "docs_per_sec": round(n / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

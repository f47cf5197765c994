"""Per-leg isolation benchmark (noop sink, guide §1.4) — bench.py stays
frozen; this harness reproduces its table shapes and times individual legs
or sub-parts, min-of-N.

Usage: python tools/bench_extra.py [leg ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), NHAO_BENCH_RUNS (default 3).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from norsk_historisk_avis_ocr_spark.operators import dedup as dd  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import extract_pages  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import quality as q  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import (  # noqa: E402
    similarity as sim,
)
from norsk_historisk_avis_ocr_spark.operators import windows as w  # noqa: E402
from norsk_historisk_avis_ocr_spark.plans import build_session  # noqa: E402
from norsk_historisk_avis_ocr_spark.sources import pages_df  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("NHAO_BENCH_RUNS", "3"))
    wanted = sys.argv[1:]

    spark = build_session("bench_extra", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024 * 1024))

    tmp = tempfile.mkdtemp(prefix="nhao_bx_")
    _tables: dict[str, str] = {}

    def t(name):
        if name not in _tables:
            path = os.path.join(tmp, f"t_{name}")
            spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")) \
                .repartition(cpus).write.parquet(path)
            _tables[name] = path
        return spark.read.parquet(_tables[name])

    def pages():
        path = os.path.join(tmp, "pages")
        if not os.path.exists(path):
            pages_df(spark, sf_dir, replicate=int(
                os.environ.get("NHAO_BENCH_REPLICATE", "24")),
                partitions=cpus * 4).write.parquet(path)
        return spark.read.parquet(path)

    legs = {
        "extract_pipeline": lambda: extract_pages(pages()),
        "extract_projected": lambda: extract_pages(
            pages(), output_columns=["final", "spans"]),
        "dedup_minhash_lsh": lambda: dd.minhash_lsh_pairs(
            t("documents"), est_threshold=0.125),
        "minhash_sig_only": lambda: dd.minhash_signatures(t("documents")),
        "minhash_lsh_nockpt": lambda: dd.minhash_lsh_pairs(
            t("documents"), est_threshold=0.125, reuse_signatures=False),
        "simhash_values": lambda: dd.simhash_values(t("documents")),
        "w1_islands": lambda: w.runlength_islands(t("events")),
        "w4_reading_order": lambda: w.reading_order_concat(t("lineitem")),
        "sessionize": lambda: w.sessionize(t("events")),
        "agg_pricing": lambda: t("lineitem")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                       .cast("long")).alias("sum_cents"),
                 F.count("*").alias("n")),
        "broadcast_join": lambda: t("orders")
            .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(t("nation")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name").agg(F.count("*").alias("n")),
        "emb_cosine_topk": lambda: sim.cosine_topk(t("embeddings"), 0),
        "lang_id": lambda: q.language_id(t("documents")),
        "fingerprints": lambda: q.fingerprints(t("documents")),
    }
    results = {}
    try:
        for name, fn in legs.items():
            if wanted and name not in wanted:
                continue
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            # one DataFrame, one warm run, then timed runs — exactly
            # bench.py's methodology (lazy localCheckpoints in a leg are
            # materialized by the warm run there too)
            df = fn()
            samples = []
            for r in range(runs + 1):  # +1 warm
                t0 = time.time()
                _noop(df)
                dt = time.time() - t0
                if r > 0:
                    samples.append(round(dt, 3))
            results[name] = {"min": min(samples), "samples": samples}
            print(f"{name}: min={min(samples)} {samples}", flush=True)
        print(json.dumps(results))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

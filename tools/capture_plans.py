"""Dump .explain('formatted') for bench-leg / contract query plans.

Usage: python tools/capture_plans.py <outdir> [name ...]

Writes <outdir>/<name>.txt for each requested plan (default: all).
Bench-leg shapes mirror bench.py exactly (same operator calls).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from norsk_historisk_avis_ocr_spark.operators import dedup as dd  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import quality as q  # noqa: E402
from norsk_historisk_avis_ocr_spark.operators import (  # noqa: E402
    similarity as sim,
)
from norsk_historisk_avis_ocr_spark.operators import windows as w  # noqa: E402
from norsk_historisk_avis_ocr_spark.plans import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    outdir = sys.argv[1]
    wanted = set(sys.argv[2:])
    os.makedirs(outdir, exist_ok=True)
    spark = build_session("plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    def t(name):
        return spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))

    from norsk_historisk_avis_ocr_spark.operators import extract_pages
    from norsk_historisk_avis_ocr_spark.sources import pages_df

    builders = {
        "extract_pipeline": lambda: extract_pages(
            pages_df(spark, SF_DIR, replicate=2, partitions=4)),
        "extract_projected": lambda: extract_pages(
            pages_df(spark, SF_DIR, replicate=2, partitions=4),
            output_columns=["final", "spans"]),
        "bigram_familiarity": lambda: q.bigram_familiarity(t("documents")),
        "dedup_minhash_lsh": lambda: dd.minhash_lsh_pairs(
            t("documents"), est_threshold=0.125),
        "dedup_signatures": lambda: dd.minhash_signatures(t("documents")),
        "simhash_values": lambda: dd.simhash_values(t("documents")),
        "dedup_simhash_pairs": lambda: dd.simhash_dup_pairs(t("documents")),
        "dedup_ngram_jaccard": lambda: dd.ngram_jaccard_pairs(
            t("documents"), max_shingle_df=None),
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
    try:
        for name, fn in builders.items():
            if wanted and name not in wanted:
                continue
            df = fn()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            n_ex = plan.count("Exchange")
            print(f"{name}: {n_ex} Exchange, {len(plan)} bytes")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

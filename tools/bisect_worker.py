"""Config-bisect helper: one timed gen+extract run with a chosen conf set.

Usage: python tools/bisect_worker.py <cores> <variant>
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

from norsk_historisk_avis_ocr_spark.operators import extract_pages
from norsk_historisk_avis_ocr_spark.sources import pages_df

VARIANTS = {
    "plain": {},
    "arrow256": {"spark.sql.execution.arrow.maxRecordsPerBatch": "256"},
    "aqe": {"spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true"},
    "mem8g": {"spark.driver.memory": "8g"},
    "shuffle": {},  # shuffle partitions = cores, set below
    "full": None,  # use build_session
}

cores = int(sys.argv[1])
variant = sys.argv[2]

if variant == "full":
    from norsk_historisk_avis_ocr_spark.plans import build_session
    spark = build_session("bisect", master=f"local[{cores}]",
                          shuffle_partitions=cores)
else:
    b = SparkSession.builder.appName("bisect").master(f"local[{cores}]") \
        .config("spark.ui.enabled", "false")
    if variant == "shuffle":
        b = b.config("spark.sql.shuffle.partitions", str(cores))
    for k, v in VARIANTS[variant].items():
        b = b.config(k, v)
    spark = b.getOrCreate()

pages = pages_df(spark, "/root/testdata/sf0.1", replicate=2,
                 partitions=cores * 4)
pages.count()
t0 = time.time()
extract_pages(pages).write.format("noop").mode("overwrite").save()
e = time.time() - t0
print(json.dumps({"variant": variant, "cores": cores, "sec": round(e, 2)}))
spark.stop()

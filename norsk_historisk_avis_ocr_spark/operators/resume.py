"""Checkpoint-resume (J1/S2) and per-partition lineage metrics.

The reference resumes by probing for ``combined.txt`` per file
(``ocr.py:45-47,151-181``). At table scale that existence probe is a
**left-anti join** of the input against the committed results keys — a real
relational operator here. The done-set is usually much smaller than the
input on a resumed run's *remaining* work, but can be huge in absolute
terms; the join therefore stays a shuffle join unless the caller knows the
done-set is small and asks for a broadcast.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def resume_filter(pages: DataFrame, done_urls: DataFrame,
                  broadcast_done: bool = False) -> DataFrame:
    """Rows of ``pages`` not yet committed: ``pages ⟕̸ done ON url``."""
    done = done_urls.select("url").distinct()
    if broadcast_done:
        done = F.broadcast(done)
    return pages.join(done, "url", "left_anti")


def partition_lineage(results: DataFrame) -> DataFrame:
    """Per-partition lineage + metrics rows (north rule): one row per task
    partition with url count, bytes in, and block totals — appended to the
    lineage table at commit so a killed run can be audited and resumed."""
    return results.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("n_urls"),
        F.sum("metrics.html_bytes").alias("bytes_in"),
        F.sum("metrics.n_blocks").alias("n_blocks"),
        F.sum(F.when(F.col("metrics.has_masthead"), 1).otherwise(0))
         .alias("n_mastheads"),
    )


def run_with_resume_bucketed(spark: SparkSession, pages_table: str,
                             results_table: str, n_buckets: int = 64,
                             extract_kwargs: dict | None = None) -> int:
    """Resume over *bucketed catalog tables*: with both the pages snapshot
    and the committed results bucketed by ``url`` on the same bucket count,
    the per-batch anti-join reads matching buckets side by side — NO
    shuffle of the 10^12-row pages table per resume (the dominant
    non-map-stage cost of the path-based variant at scale; asserted
    shuffle-free in tests/test_plans.py).

    The bucketed append itself needs no shuffle either (each task streams
    rows into per-bucket files); the cost is file count — tasks × buckets
    per batch — which compaction or a pre-``repartition(n_buckets, url)``
    handles when batches are small.

    Returns the number of newly committed rows.
    """
    from pyspark import StorageLevel

    from .extract import extract_pages, split_quarantine

    pages = spark.table(pages_table)
    if spark.catalog.tableExists(results_table):
        done = spark.table(results_table).select("url")
    else:
        done = spark.createDataFrame([], "url string")
    todo = resume_filter(pages, done)
    good, _bad = split_quarantine(todo)
    results = extract_pages(good, **(extract_kwargs or {}))
    results = results.persist(StorageLevel.DISK_ONLY)
    try:
        n = results.count()
        results.write.mode("append") \
            .bucketBy(n_buckets, "url").sortBy("url") \
            .format("parquet").saveAsTable(results_table)
    finally:
        results.unpersist()
    return n


def run_with_resume(spark: SparkSession, pages: DataFrame, out_path: str,
                    lineage_path: str | None = None,
                    extract_kwargs: dict | None = None) -> int:
    """One resumable batch: anti-join done urls, extract, commit, lineage.

    Returns the number of newly committed rows. Idempotent: re-running after
    a kill processes only un-committed urls (parquet job commits are atomic;
    with Iceberg this is a snapshot append).
    """
    from pyspark import StorageLevel

    from ..sources.sinks import read_done_urls, write_lineage, write_results
    from .extract import extract_pages, split_quarantine

    done = read_done_urls(spark, out_path)
    todo = resume_filter(pages, done)
    good, bad = split_quarantine(todo)
    results = extract_pages(good, **(extract_kwargs or {}))
    # One extraction pass total: persist the batch to local disk (not
    # memory — rows carry multi-KB text columns) so the batch count, the
    # per-partition lineage, and the commit write all read the materialized
    # batch. The committed output table is never re-read (the round-1
    # shape rescanned it twice per batch — O(corpus) at 10^12 rows).
    #
    # Ordering matters: the batch plan references out_path (via the
    # anti-join's done-scan), and appending to a path recaches every
    # cached plan that reads it — so count/lineage are taken from the
    # cache BEFORE the append. Lineage rows are one-per-task-partition
    # (tiny), collected and re-created driver-side so they can be written
    # AFTER the results commit without touching the invalidated cache.
    results = results.persist(StorageLevel.DISK_ONLY)
    try:
        n = results.count()
        lineage_rows = (
            partition_lineage(results).collect()
            if n and lineage_path else None)
        write_results(results, out_path)
        if lineage_rows:
            lineage = spark.createDataFrame(lineage_rows) \
                .withColumn("committed_at", F.lit(int(time.time())))
            write_lineage(lineage, lineage_path)
    finally:
        results.unpersist()
    return n

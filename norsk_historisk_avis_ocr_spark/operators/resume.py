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


def run_with_resume(spark: SparkSession, pages: DataFrame, out_path: str,
                    lineage_path: str | None = None,
                    extract_kwargs: dict | None = None) -> int:
    """One resumable batch: anti-join done urls, extract, commit, lineage.

    Returns the number of newly committed rows. Idempotent: re-running after
    a kill processes only un-committed urls (parquet job commits are atomic;
    with Iceberg this is a snapshot append).
    """
    from ..sources.sinks import read_done_urls, write_lineage, write_results
    from .extract import extract_pages, split_quarantine

    done = read_done_urls(spark, out_path)
    n_before = done.count()  # parquet metadata count — no scan
    todo = resume_filter(pages, done)
    good, bad = split_quarantine(todo)
    results = extract_pages(good, **(extract_kwargs or {}))
    # single pass: write directly (no persist/count pre-materialization —
    # results carry several large text columns and caching them doubles
    # memory traffic); batch size comes from committed-count deltas
    write_results(results, out_path)
    n = read_done_urls(spark, out_path).count() - n_before
    if n and lineage_path:
        lineage = partition_lineage(
            spark.read.parquet(out_path).join(done, "url", "left_anti")) \
            .withColumn("committed_at", F.lit(int(time.time())))
        write_lineage(lineage, lineage_path)
    return n

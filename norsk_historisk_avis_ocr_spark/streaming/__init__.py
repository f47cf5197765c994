"""Incremental (Structured Streaming) ingest of a growing pages table.

The reference is a batch pipeline with file-granularity resume
(``ocr.py:45-47``), and the batch path here mirrors that via anti-join +
atomic commits (:mod:`..operators.resume`). A continuously-crawled corpus
also wants the *incremental* shape: new page files land in a directory and
only they are processed. Because the extraction stage is a stateless map
(one ``mapInPandas``), the exact same operator runs unchanged on a
streaming DataFrame — Structured Streaming's file source + sink checkpoint
then provides the done-marker semantics for free (exactly-once per input
file, resumable after a kill), which is the streaming analog of
``run_with_resume``.

No watermarks or stateful operators are needed for extraction itself (the
reference has none — SURVEY.md §2.10); the event-time/sessionization logic
that would back a stateful variant lives as batch window operators in
:mod:`..operators.windows` and would transfer to
``applyInPandasWithState`` if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming scan of a pages directory (parquet file source). File
    sources require an explicit schema — reuses the batch generator's
    ``PAGES_SCHEMA`` (single source of truth: a column added there reaches
    the incremental path too); ``maxFilesPerTrigger`` bounds per-micro-batch
    work on a large backlog."""
    from ..sources.pages import PAGES_SCHEMA
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def run_incremental(spark: SparkSession, in_path: str, out_path: str,
                    checkpoint_path: str,
                    extract_kwargs: dict | None = None,
                    quarantine_path: str | None = None) -> None:
    """Process all pages files not yet seen by this checkpoint, then stop
    (``availableNow`` trigger — the batch-of-the-backlog mode). Re-running
    after new files land processes only the new files; re-running after a
    kill resumes from the checkpoint without duplicating committed output
    (file-source progress + file-sink manifest are both in the
    checkpoint). With ``quarantine_path``, rejected rows (null/oversized
    html) are committed to their own errors table through a sibling
    checkpointed query (S5 semantics, matching the batch path)."""
    from ..operators.extract import extract_pages, split_quarantine

    pages = read_pages_stream(spark, in_path)
    good, bad = split_quarantine(pages)
    results = extract_pages(good, **(extract_kwargs or {}))
    queries = [results.writeStream.format("parquet")
               .option("path", out_path)
               .option("checkpointLocation", checkpoint_path)
               .trigger(availableNow=True)
               .start()]
    if quarantine_path is not None:
        queries.append(bad.writeStream.format("parquet")
                       .option("path", quarantine_path)
                       .option("checkpointLocation",
                               checkpoint_path + "_quarantine")
                       .trigger(availableNow=True)
                       .start())
    for q in queries:
        q.awaitTermination()


def run_incremental_dedup(spark: SparkSession, in_path: str, out_path: str,
                          checkpoint_path: str,
                          watermark_delay: str | None = None) -> None:
    """Streaming exact dedup (keep-first) over a growing pages directory:
    the first page seen with a given text hash is committed, every later
    duplicate — in the same micro-batch, a later batch, or a later RUN —
    is dropped, because the dedup state lives in the checkpoint.

    This is the streaming analog of ``dedup.dedup_keep_first``: a crawl
    that continuously lands page files gets a deduplicated corpus without
    re-scanning committed output (the batch anti-join shape) — the state
    store IS the done-set. Keeper caveat vs the batch operator: across
    batches/runs the earlier-committed page wins, but within one
    micro-batch the keeper among simultaneous duplicates is whichever row
    the tasks reach first (partition order) — streaming dropDuplicates has
    no min-key tie-break. Output is therefore set-deterministic per text,
    not row-deterministic; use ``dedup_keep_first`` when the keeper
    identity matters.

    Null-text pages carry no text identity: they are keyed by url instead
    (``md5(NULL)`` is NULL and dropDuplicates treats NULL keys as equal —
    keying on text alone would silently collapse every null-text page
    into one row forever).

    State shape at 10^12 rows: exact streaming dedup keeps one state row
    per distinct key forever — unbounded. Pass ``watermark_delay`` (e.g.
    ``"7 days"``) to bound it: duplicates are then only suppressed within
    the watermark horizon on ``warc_ts``
    (``dropDuplicatesWithinWatermark``), the standard
    bounded-state/bounded-guarantee trade for infinite streams; near-dup
    and exact batch jobs downstream catch strays beyond the horizon.
    """
    pages = read_pages_stream(spark, in_path) \
        .withColumn("text_md5",
                    F.coalesce(F.md5(F.col("text")),
                               F.concat(F.lit("null-text:"), F.col("url"))))
    if watermark_delay is not None:
        deduped = pages.withWatermark("warc_ts", watermark_delay) \
            .dropDuplicatesWithinWatermark(["text_md5"])
    else:
        deduped = pages.dropDuplicates(["text_md5"])
    q = deduped.drop("text_md5").writeStream.format("parquet") \
        .option("path", out_path) \
        .option("checkpointLocation", checkpoint_path) \
        .trigger(availableNow=True) \
        .start()
    q.awaitTermination()


EVENTS_DDL = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")


def windowed_event_counts(spark: SparkSession, in_path: str,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming event-time windowed aggregation with a late-data
    watermark: per (window, event_type) counts + exact integer value sums.
    The watermark bounds state (windows older than max(ts) − watermark are
    finalized and evicted — at 10^12 events/day that bound is what keeps
    the state store finite); events later than it are dropped by contract.
    """
    ev = spark.readStream.schema(EVENTS_DDL).parquet(in_path) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.withWatermark("ts", watermark) \
        .groupBy(F.window("ts", window).alias("w"), "event_type") \
        .agg(F.count("*").alias("n_events"),
             F.sum(F.round(F.col("value") * 1000).cast("long"))
              .alias("value_milli")) \
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "value_milli")


def stateful_user_totals(spark: SparkSession, in_path: str, out_path: str,
                         checkpoint_path: str) -> None:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-user running event total maintained in the state store across
    micro-batches AND across restarts (the checkpoint carries the state).
    Each batch emits the updated totals for the users it touched, appended
    with the micro-batch id via ``foreachBatch`` (update-mode output; the
    row with the highest batch id per user is the current total).

    This is the pattern a custom incremental aggregator (per-host crawl
    counters, per-source quality accumulators) uses when built-in windowed
    aggregation can't express the state transition.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = spark.readStream.schema(EVENTS_DDL).parquet(in_path)

    def update(key, pdfs, state):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total = state.get[0] if state.exists else 0
        total += n
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]],
                            "n_events_total": [total]})

    updates = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events_total long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(out_path)

    q = updates.writeStream.foreachBatch(sink) \
        .outputMode("update") \
        .option("checkpointLocation", checkpoint_path) \
        .trigger(availableNow=True) \
        .start()
    q.awaitTermination()


def run_windowed_counts(spark: SparkSession, in_path: str, out_path: str,
                        checkpoint_path: str, window: str = "1 hour",
                        watermark: str = "2 hours") -> None:
    """Materialize the windowed counts for the currently-available backlog
    (availableNow; append mode emits only watermark-finalized windows)."""
    agg = windowed_event_counts(spark, in_path, window, watermark)
    q = agg.writeStream.format("parquet") \
        .outputMode("append") \
        .option("path", out_path) \
        .option("checkpointLocation", checkpoint_path) \
        .trigger(availableNow=True) \
        .start()
    q.awaitTermination()

"""Window-shaped operators (SURVEY.md §2.8 W1-W4, A4, A8, sessionization).

The reference's run-length / contiguous-grouping / moving-average logic is
in-UDF per page (one page per row); these operators are the *relational*
formulations of the same patterns over row-per-event tables — the shapes the
driver's DuckDB oracle can check exactly, and the shapes you actually use
when the data is already exploded at cluster scale.

Scale notes: every operator here is a single hash-partitioned window or
aggregation over its natural key (user_id / order key / group key) — one
shuffle each, AQE-coalesced; no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def runlength_islands(events: DataFrame) -> DataFrame:
    """W1 — gaps-and-islands: maximal runs of consecutive ``event_id`` per
    (user_id, event_type). The relational form of the reference's blank-row /
    peak / gap run detection (``engines/_columns.py:53-75,159-174``)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    isl = events.withColumn(
        "island", F.col("event_id") - F.row_number().over(w))
    return isl.groupBy("user_id", "event_type", "island").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count("*").alias("island_len"),
    ).drop("island")


def largest_island_per_user(events: DataFrame) -> DataFrame:
    """W2/A8 — the largest contiguous island per user, leftmost on ties —
    the reference's ``max(groups, key=len)`` contiguous-column grouping
    (``engines/_columns.py:87-98``) as a top-1-per-group window."""
    islands = runlength_islands(events)
    w = Window.partitionBy("user_id").orderBy(
        F.col("island_len").desc(), F.col("island_start").asc())
    return islands.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") == 1) \
        .select("user_id", "island_start", "island_end", "island_len")


def moving_average(events: DataFrame, half_window: int = 7) -> DataFrame:
    """W3 — centered moving average over a ±7 frame, the reference's 15px
    box smoothing (``engines/_columns.py:259-265``) as a window frame."""
    w = Window.partitionBy("user_id").orderBy("event_id") \
        .rowsBetween(-half_window, half_window)
    # Exact-integer accumulation (milli-units) so the result is independent
    # of fp summation order — the cross-engine value-identity trick used for
    # every float-bearing oracle query.
    milli = F.round(F.col("value") * 1000).cast("long")
    return events.select(
        "user_id", "event_id",
        F.round(F.sum(milli).over(w) / F.count(milli).over(w) / 1000.0, 6)
         .alias("smoothed"))


def reading_order_concat(lineitem: DataFrame) -> DataFrame:
    """W4 — deterministic ordered reassembly per group: the reference's
    header→column-1..N combine (``engines/tesseract_engine.py:158-190``) as
    sort-within-group + ordered concat (array_sort of structs is
    shuffle-order-insensitive)."""
    parts = F.array_sort(
        F.collect_list(F.struct("l_linenumber", "l_returnflag")))
    return lineitem.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(parts, lambda s: s["l_returnflag"]), ","
        ).alias("flags_in_order"),
        F.count("*").alias("n_lines"),
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Sessionization: a new session starts when the gap to the previous
    event exceeds ``gap_seconds`` — batch analog of a streaming session
    window (gaps-and-islands over time instead of index)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts may be TIMESTAMP_NTZ (parquet); route through timestamp (session TZ
    # is pinned to UTC in plans/session.py) to get deterministic epoch secs
    ts_s = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag(ts_s).over(w)
    new_sess = F.when(prev.isNull() | ((ts_s - prev) > gap_seconds), 1) \
        .otherwise(0)
    sess = events.withColumn("sess_break", new_sess) \
        .withColumn("session_id", F.sum("sess_break").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return sess.groupBy("user_id", "session_id").agg(
        F.min(ts_s).alias("session_start"),
        F.max(ts_s).alias("session_end"),
        F.count("*").alias("n_events"),
    ).select("user_id", "session_start", "session_end", "n_events")


def exact_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact per-group quantiles (percentile_disc semantics: smallest value
    whose cumulative rank reaches q·n) for q ∈ {0.25, 0.5, 0.75}.

    Same rank-row formulation as :func:`upper_median` so the cross-engine
    oracle is value-exact — built-in approx/interp percentiles differ
    between engines, a rank row does not. At scale this is one window over
    the group (no global sort) + a conditional aggregate.
    """
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber")
    cnt = Window.partitionBy("l_returnflag")
    ranked = lineitem.select(
        "l_returnflag", "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cnt).alias("n"))
    agg = [
        F.max(F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")),
                     F.col("l_quantity"))).alias(name)
        for q, name in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75")]
    ]
    return ranked.groupBy("l_returnflag").agg(*agg)


def topk_per_group(orders: DataFrame, k: int = 3) -> DataFrame:
    """O5/A8-family: top-k rows per group with a total deterministic order
    (value desc, key asc) — rank-within-partition, no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return orders.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") <= k) \
        .select("o_custkey", "o_orderkey",
                F.round(F.col("o_totalprice") * 100).cast("long")
                 .alias("price_cents"),
                F.col("rn").cast("long").alias("rank_in_group"))


def upper_median(lineitem: DataFrame) -> DataFrame:
    """A4 — the reference's *upper median*: element ``len//2`` of the sorted
    values (``engines/_columns.py:453-461``), not ``percentile(0.5)``.
    Exactly expressible as the row at rank floor(n/2)+1."""
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity", "l_orderkey",
                                                   "l_linenumber")
    cnt = Window.partitionBy("l_returnflag")
    return lineitem.select(
        "l_returnflag", "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cnt).alias("n"),
    ).filter(F.col("rn") == F.floor(F.col("n") / 2) + 1) \
     .select("l_returnflag", F.col("l_quantity").alias("upper_median_qty"))

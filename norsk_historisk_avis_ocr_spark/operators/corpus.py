"""Corpus assembly operators: deterministic splits, stratified sampling,
and token-budget sequence packing — the steps a training-data pipeline
runs after hygiene (``operators/quality.py``) to turn a cleaned corpus
into train/val shards and fixed-budget context blocks.

Everything here is native Column algebra (whole-stage codegen, no Python)
and keyed on the portable 56-bit md5 hash, so each operator has an exact
DuckDB oracle and is reproducible across engines, reruns, and cluster
sizes — the property that matters for split hygiene (a document must
never migrate between train and test because a job was re-run on
different hardware or partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textqual import portable_hash60, token_count

_SCALE = 1_000_000  # hash-bucket resolution for rates/weights


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from the portable hash of ``salt:key`` —
    deterministic, engine-portable, independent of partitioning. The salt
    decorrelates different decisions taken on the same key (a doc's split
    must not correlate with whether it was sampled)."""
    return portable_hash60(
        F.concat(F.lit(salt + ":"), key.cast("string"))) % F.lit(_SCALE)


def deterministic_split(docs: DataFrame,
                        weights: tuple[tuple[str, float], ...] = (
                            ("train", 0.9), ("val", 0.05), ("test", 0.05)),
                        key_col: str = "doc_id",
                        salt: str = "split-v1") -> DataFrame:
    """Assign every row a split label by hash bucket: cumulative weight
    thresholds over ``_bucket(key)``. Shuffle-free (one projection), stable
    under reruns/repartitioning, and adding rows never moves existing rows
    between splits — the three properties random-number splits lack."""
    total = sum(w for _, w in weights)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1 (got {total})")
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    for name, wgt in weights[:-1]:
        cum += wgt
        cond = bucket < F.lit(int(round(cum * _SCALE)))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", expr)


def stratified_sample(docs: DataFrame, rate: float = 0.2,
                      rates: dict[str, float] | None = None,
                      strata_col: str = "lang",
                      key_col: str = "doc_id",
                      salt: str = "sample-v1") -> DataFrame:
    """Deterministic downsampling: keep a row iff its hash bucket clears
    the (per-stratum) rate threshold — the corpus-mixing primitive (e.g.
    keep 50% of English, 20% of everything else). One filter in the scan,
    no shuffle, no RNG; re-running or resharding yields the same sample."""
    bucket = _bucket(F.col(key_col), salt)
    if rates:
        thr = None
        for stratum, r in sorted(rates.items()):
            cond = F.col(strata_col) == stratum
            t = F.lit(int(round(r * _SCALE)))
            thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        thr = thr.otherwise(F.lit(int(round(rate * _SCALE))))
    else:
        thr = F.lit(int(round(rate * _SCALE)))
    return docs.filter(bucket < thr)


def pack_sequences(docs: DataFrame, budget: int = 512,
                   group_col: str | list[str] = "source",
                   sub_shards: int | None = None,
                   key_col: str = "doc_id",
                   salt: str = "pack-v1") -> DataFrame:
    """Token-budget sequence packing, block-style: within each group,
    documents are concatenated in ``doc_id`` order and chunked into
    ``budget``-token context blocks; a document's ``pack_id`` is the block
    holding its first token (exactly the concat-then-chunk packing
    block-based pretraining loaders use, so the id is pure window algebra:
    ``floor(prefix_token_sum / budget)``).

    Scale shape: one window per group — the shuffle is keyed on
    ``group_col`` (crawl/source shard), so parallelism follows the number
    of shards, not corpus size; a skewed mega-shard should be pre-split
    upstream (the same discipline any per-shard sequential pass needs).

    ``group_col`` may be a list — packing after a train/val/test split
    MUST include the split column (e.g. ``["split", "source"]``) so no
    context block ever spans splits.

    ``sub_shards`` de-skews a mega-shard: each document is hash-routed to
    a deterministic ``pack_bucket`` in [0, sub_shards) and packing runs
    within (group, bucket) — the window shuffle is then keyed on
    ``groups + [pack_bucket]``, so one hot shard can never serialize a
    single task. Cost: pack boundaries differ from the unsalted layout
    (blocks never span buckets), so the block key becomes
    (group, pack_bucket, pack_id) — the output carries ``pack_bucket``
    only in this mode, keeping the default schema (and its oracle)
    byte-stable. Routing uses the portable hash (engine-reproducible,
    partition-independent), not a RNG.
    """
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    d = docs.select(
        "doc_id", *[F.col(g) for g in groups],
        token_count(F.col("text")).cast("long").alias("n_tokens"))
    part_keys = list(groups)
    if sub_shards is not None:
        if sub_shards < 1:
            raise ValueError(f"sub_shards must be >= 1 (got {sub_shards})")
        d = d.withColumn(
            "pack_bucket",
            (portable_hash60(F.concat(F.lit(salt + ":"),
                                      F.col(key_col).cast("string")))
             % F.lit(sub_shards)).cast("long"))
        part_keys.append("pack_bucket")
    win = Window.partitionBy(*part_keys).orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    extra = ["pack_bucket"] if sub_shards is not None else []
    return d.select(
        "doc_id", *groups, *extra, "n_tokens",
        F.floor(start / F.lit(budget)).cast("long").alias("pack_id"))

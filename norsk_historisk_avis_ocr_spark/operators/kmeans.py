"""Deterministic Lloyd k-means over an embedding column — DataFrame-only.

Supplies *learned* coarse cells for the IVF similarity path
(``similarity.ivf_topk`` uses the provided ``label`` column as its cell id;
this computes such cells when none exist). Deterministic: seeds are the k
smallest vec_ids, ties in argmin break toward the smaller centroid id — no
RNG.

Scale shape (the round-1 review flagged the old window-based argmin):
centroids are O(k·dim) — tiny — so each Lloyd round collects them to the
driver and embeds them as array literals, exactly how distributed k-means
implementations broadcast model state. Assignment is then pure per-row
arithmetic (``array_min`` over (distance, cell) structs — no Exchange keyed
on vec_id), and the recompute is one k-group aggregation with map-side
partial aggregation: per iteration, one scan of the (localCheckpoint-ed)
points and one k-row shuffle — nothing proportional to the corpus crosses
the wire.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_half_away(x: float, decimals: int) -> float:
    """Half-away-from-zero decimal rounding — the tie semantics of DuckDB's
    ``round()`` (and SQL generally). Python's built-in ``round`` is
    banker's (half-to-even); a centroid mean landing exactly on a decimal
    tie would diverge cross-engine under it. Measure-zero in double
    arithmetic, but the contract pins the Lloyd recursion value-exact, so
    the formulas must match by construction, not by luck."""
    scale = 10.0 ** decimals
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def _sq_dist(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def kmeans_assign(emb: DataFrame, k: int = 8, iters: int = 5,
                  vec_col: str = "embedding",
                  quantize: int | None = None) -> DataFrame:
    """(vec_id, cell) assignment after ``iters`` Lloyd rounds.

    ``quantize``: round every recomputed centroid component to this many
    decimals before the next assignment round. Seeds are raw input floats
    (bit-identical in any engine), so with quantization the whole iteration
    becomes engine-reproducible: the only cross-engine fp divergence is the
    aggregation order inside ``avg``, which rounding absorbs — this is what
    lets the contract pin the learned-IVF query against a DuckDB oracle
    that re-runs the same unrolled Lloyd recursion. ``None`` keeps exact
    means (single-engine use)."""
    # null embeddings carry no geometry: exclude them up front (they would
    # otherwise shrink the seed set below k and be mis-assigned through
    # NULL-distance struct comparison); they simply have no (vec_id, cell)
    # row in the output
    points = emb.filter(F.col(vec_col).isNotNull()).select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("v"))
    points = points.localCheckpoint(eager=False)

    # dim = majority length over a vote sample of the smallest vec_ids —
    # anchoring to the single lowest-vec_id row would let ONE malformed
    # short vector silently drop the whole corpus as "ragged", and a
    # k-sized vote can tie at k=2; sampling max(k, 16) rows makes a lone
    # bad row the outlier in any non-degenerate corpus. Residual ties
    # break toward the earliest vec_id's length (deterministic).
    vote_rows = points.orderBy("vec_id").limit(max(k, 16)).collect()
    if not vote_rows:  # empty input → empty assignment
        return points.select(
            "vec_id", F.lit(None).cast("bigint").alias("cell")).limit(0)
    counts: dict[int, int] = {}
    first_at: dict[int, int] = {}
    for i, r in enumerate(vote_rows):
        length = len(r.v)
        counts[length] = counts.get(length, 0) + 1
        first_at.setdefault(length, i)
    dim = max(counts, key=lambda length: (counts[length], -first_at[length]))
    # ragged guard: a vector shorter than dim would make v[i] NULL, poison
    # the per-dim avg, and crash float(None) on the driver mid-iteration —
    # rows of the wrong length carry no comparable geometry, so they get no
    # (vec_id, cell) row (same contract as null embeddings above)
    points = points.filter(F.size("v") == dim)
    if len(counts) > 1:
        # rare corrupt-input path: the vote sample was ragged — re-collect
        # so seeds are the k smallest VALID vec_ids
        seed_rows = points.orderBy("vec_id").limit(k).collect()
    else:
        seed_rows = vote_rows[:k]
    cents: list[tuple[int, list[float]]] = [
        (int(r.vec_id), [float(x) for x in r.v]) for r in seed_rows]

    def assign(cent_list):
        # argmin over a centroid literal: struct ordering gives
        # (d2 asc, cell asc) — the deterministic tie-break — shuffle-free
        scored = F.array(*[
            F.struct(
                _sq_dist(F.col("v"),
                         F.array(*[F.lit(x) for x in cv])).alias("d2"),
                F.lit(cell).cast("bigint").alias("cell"))
            for cell, cv in cent_list])
        return points.select(
            "vec_id", "v", F.array_min(scored)["cell"].alias("cell"))

    assigned = assign(cents)
    for _ in range(iters - 1):
        # elementwise centroid mean: dim partial-aggregated avg columns in a
        # single k-group groupBy (k rows collected — the "broadcast back")
        means = assigned.groupBy("cell").agg(
            *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)])
        cents = sorted(
            (int(r["cell"]),
             [_round_half_away(float(r[f"m{i}"]), quantize)
              if quantize is not None
              else float(r[f"m{i}"]) for i in range(dim)])
            for r in means.collect())
        assigned = assign(cents)
    return assigned.select("vec_id", "cell")


def ivf_cells_topk(emb: DataFrame, query_vec_id: int, k_cells: int = 8,
                   top_k: int = 5, iters: int = 3,
                   quantize: int | None = None) -> DataFrame:
    """IVF ANN over learned cells: k-means assignment, then exact cosine
    top-k inside the query's cell only."""
    from .similarity import cosine_scores
    cells = kmeans_assign(emb, k=k_cells, iters=iters, quantize=quantize)
    tagged = emb.join(cells, "vec_id")
    q = tagged.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("cell").alias("qcell"))
    bucket = tagged.join(F.broadcast(q), F.col("cell") == F.col("qcell"))
    return cosine_scores(bucket.drop("label").withColumnRenamed(
        "cell", "label"), query_vec_id) \
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()) \
        .limit(top_k).select("vec_id", "cos_sim")

"""Deterministic Lloyd k-means over an embedding column — DataFrame-only.

Supplies *learned* coarse cells for the IVF similarity path
(``similarity.ivf_topk`` uses the provided ``label`` column as its cell id;
this computes such cells when none exist). Iterative like
``dedup.connected_components``: per round one broadcast of k centroids, one
argmin assignment (window, no cross-row shuffle beyond the groupBy), one
elementwise-mean recompute. Deterministic: seeds are the k smallest
vec_ids, ties in argmin break toward the smaller centroid id — no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def kmeans_assign(emb: DataFrame, k: int = 8, iters: int = 5,
                  vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell) assignment after ``iters`` Lloyd rounds."""
    points = emb.select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("v"))
    points = points.localCheckpoint(eager=False)

    centroids = points.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"))

    assigned = None
    for _ in range(iters):
        scored = points.crossJoin(F.broadcast(centroids)) \
            .withColumn("d2", _sq_dist(F.col("v"), F.col("cv")))
        w = Window.partitionBy("vec_id").orderBy(
            F.col("d2").asc(), F.col("cell").asc())
        assigned = scored.withColumn("rn", F.row_number().over(w)) \
            .filter("rn = 1").select("vec_id", "v", "cell") \
            .localCheckpoint(eager=False)
        # elementwise centroid mean: explode positions, average, reassemble
        dims = assigned.select(
            "cell", F.posexplode("v").alias("pos", "x"))
        means = dims.groupBy("cell", "pos").agg(F.avg("x").alias("m"))
        centroids = means.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("cv"))
    return assigned.select("vec_id", "cell")


def ivf_cells_topk(emb: DataFrame, query_vec_id: int, k_cells: int = 8,
                   top_k: int = 5, iters: int = 3) -> DataFrame:
    """IVF ANN over learned cells: k-means assignment, then exact cosine
    top-k inside the query's cell only."""
    from .similarity import cosine_scores
    cells = kmeans_assign(emb, k=k_cells, iters=iters)
    tagged = emb.join(cells, "vec_id")
    q = tagged.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("cell").alias("qcell"))
    bucket = tagged.join(F.broadcast(q), F.col("cell") == F.col("qcell"))
    return cosine_scores(bucket.drop("label").withColumnRenamed(
        "cell", "label"), query_vec_id) \
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()) \
        .limit(top_k).select("vec_id", "cos_sim")

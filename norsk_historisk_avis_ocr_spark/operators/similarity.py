"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  Dot/norm built from ``zip_with``/``aggregate`` higher-order functions —
  JVM-side, no Python. One pass over the table + a top-k (no full sort:
  ORDER BY + LIMIT compiles to TakeOrderedAndProject).
- :func:`ivf_topk` — the scale path: restrict the scan to the query's
  coarse cell (here the provided ``label`` column stands in for a k-means
  cell id; at 100 TB the table is partitioned by cell so this prunes
  partitions at the scan).
- :func:`lsh_bucket_topk` — random-hyperplane signs (deterministic planes
  derived from the portable hash of (dim, plane)) — candidate bucket =
  matching sign signature; exact re-rank inside the bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0).cast("double"), lambda acc, v: acc + v))


def cosine_scores(emb: DataFrame, query_vec_id: int,
                  vec_col: str = "embedding") -> DataFrame:
    """Cosine similarity of every row against one query row. The query
    vector is a scalar subquery → broadcast literal; the scan stays
    single-pass."""
    q = emb.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col(vec_col).alias("qv"))
    crossed = emb.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q))
    a = F.col(vec_col).cast("array<double>")
    b = F.col("qv").cast("array<double>")
    return crossed.select(
        "vec_id", "label",
        F.round(_dot(a, b) / (_norm(a) * _norm(b)), 3).alias("cos_sim"))


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Exact brute-force top-k by cosine (ties → lower vec_id first)."""
    return cosine_scores(emb, query_vec_id) \
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()) \
        .limit(k).select("vec_id", "cos_sim")


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 5) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell (``label``)."""
    q = emb.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("label").alias("qlabel"))
    cell = emb.join(F.broadcast(q), F.col("label") == F.col("qlabel")) \
        .drop("qlabel")
    return cosine_scores(cell, query_vec_id) \
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()) \
        .limit(k).select("vec_id", "cos_sim")


def plane_sign_rows(n_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplane components, derived from the portable 56-bit md5 hash
    of "p:d" (parity bit). Computed once driver-side — the per-row work is
    then pure arithmetic against a literal, and the same matrix is
    reproducible in any engine (the DuckDB oracles embed it)."""
    import hashlib
    return [[1.0 if int(hashlib.md5(f"{p}:{d}".encode())
                        .hexdigest()[:14], 16) & 1 else -1.0
             for d in range(dim)]
            for p in range(n_planes)]


def hyperplane_signature(emb: DataFrame, n_planes: int = 8,
                         vec_col: str = "embedding",
                         dim: int | None = None) -> DataFrame:
    """Deterministic random-hyperplane LSH signature: plane p's component
    for dimension d is ±1 by parity of a portable hash of (p, d). The
    signature is an n_planes-bit int; equal signatures → candidate bucket.

    The sign matrix is precomputed driver-side into array literals (one
    ``first()`` probe for ``dim`` when not given — O(1) regardless of table
    size), so each row costs n_planes fused multiply-adds, no hashing."""
    if dim is None:
        row = emb.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        # empty / all-null input: any dim works — every row's projection is
        # NULL → sig 0, same as the old per-row formulation
        dim = len(row[0]) if row is not None else 1
    signs = plane_sign_rows(n_planes, dim)
    a = F.col(vec_col).cast("array<double>")
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(s) for s in signs[p]])
        proj = F.aggregate(F.zip_with(a, plane, lambda x, s: x * s),
                           F.lit(0.0).cast("double"), lambda acc, v: acc + v)
        sig = sig + F.when(proj > 0, F.lit(2 ** p).cast("bigint")) \
            .otherwise(F.lit(0).cast("bigint"))
    return emb.withColumn("lsh_sig", sig)


def lsh_bucket_topk(emb: DataFrame, query_vec_id: int, k: int = 5,
                    n_planes: int = 8,
                    multi_probe: bool = False,
                    dim: int | None = None) -> DataFrame:
    """ANN via hyperplane-LSH bucket + exact re-rank inside the bucket.

    ``multi_probe=True`` probes the query's signature plus every one-bit
    flip of it (candidates within hamming ≤ 1 of the query's bucket) —
    the standard recall lever that costs n_planes+1 tiny broadcast keys
    instead of another plane family.

    ``dim``: embedding dimensionality, forwarded to
    :func:`hyperplane_signature` — pass it when known so plan construction
    stays fully lazy (no ``first()`` probe job)."""
    signed = hyperplane_signature(emb, n_planes, dim=dim)
    q = signed.filter(F.col("vec_id") == query_vec_id) \
        .select(F.col("lsh_sig").alias("qsig"))
    if multi_probe:
        probes = F.array(F.col("qsig"),
                         *[F.col("qsig").bitwiseXOR(F.lit(1 << p))
                           for p in range(n_planes)])
        q = q.select(F.explode(probes).alias("qsig"))
    # the probe values are pairwise distinct, so each row joins at most one
    # probe — no dedup needed
    bucket = signed.join(F.broadcast(q), F.col("lsh_sig") == F.col("qsig"))
    return cosine_scores(bucket, query_vec_id) \
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()) \
        .limit(k).select("vec_id", "cos_sim")


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.4,
                        max_rows: int | None = 100_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact (the correctness
    baseline for embedding dedup). All-pairs — use only on a bounded
    candidate set; the scale path is :func:`embedding_dup_pairs_lsh`.

    ``max_rows`` fences the quadratic blowup: the input is counted (bounded
    probe — ``limit(max_rows+1)`` over the key column only, never a full
    scan past the fence) and a candidate set larger than ``max_rows``
    raises instead of silently launching an O(n²) join at corpus scale.
    NOTE: the probe is an eager action at operator-construction time (the
    point of the fence is refusing BEFORE the quadratic plan exists);
    pass ``None`` to keep construction fully lazy when the caller has
    already bounded the set (tests, pre-filtered buckets)."""
    if max_rows is not None:
        n = emb.select("vec_id").limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"embedding_dup_pairs is all-pairs: input exceeds "
                f"max_rows={max_rows}; use embedding_dup_pairs_lsh for "
                f"corpus-scale dedup (or pass max_rows=None deliberately)")
    a = emb.select(F.col("vec_id").alias("vid_a"),
                   F.col("embedding").cast("array<double>").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vid_b"),
                   F.col("embedding").cast("array<double>").alias("eb"))
    pairs = a.join(b, F.col("vid_a") < F.col("vid_b"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return pairs.select(
        "vid_a", "vid_b", F.round(cos, 3).alias("cos_sim")) \
        .filter(F.col("cos_sim") >= threshold)


def embedding_dup_pairs_lsh(emb: DataFrame, threshold: float = 0.4,
                            n_planes: int = 8,
                            multi_probe: bool = False,
                            dim: int | None = None) -> DataFrame:
    """Scale path for embedding dedup: hyperplane-LSH bucket candidates
    (equal signature → probable high cosine), exact verify inside buckets.
    Recall < 1 by construction (bucket misses).

    ``multi_probe=True`` additionally probes every one-bit-flipped
    signature on one join side, so pairs whose signatures differ in a
    single plane (the dominant near-miss for high-cosine pairs) are also
    candidates — recall of hamming ≤ 1 for an (n_planes+1)× candidate-key
    fan-out on one side, still a bucketed equi-join, still never a cross
    join. The classic alternative — more plane families unioned — costs a
    full extra signature pass per family.

    ``dim``: forwarded to :func:`hyperplane_signature`; pass it when known
    to keep plan construction lazy (no ``first()`` probe job)."""
    signed = hyperplane_signature(emb, n_planes, dim=dim)
    a = signed.select(F.col("vec_id").alias("vid_a"),
                      F.col("embedding").cast("array<double>").alias("ea"),
                      F.col("lsh_sig").alias("sig_a"))
    if multi_probe:
        probes = F.array(F.col("sig_a"),
                         *[F.col("sig_a").bitwiseXOR(F.lit(1 << p))
                           for p in range(n_planes)])
        a = a.select("vid_a", "ea",
                     F.explode(probes).alias("sig_a"))
    b = signed.select(F.col("vec_id").alias("vid_b"),
                      F.col("embedding").cast("array<double>").alias("eb"),
                      F.col("lsh_sig").alias("sig_b"))
    pairs = a.join(b, (F.col("sig_a") == F.col("sig_b")) &
                   (F.col("vid_a") < F.col("vid_b")))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    out = pairs.select(
        "vid_a", "vid_b", F.round(cos, 3).alias("cos_sim"))
    if multi_probe:
        out = out.distinct()  # a pair can match via several probes
    return out.filter(F.col("cos_sim") >= threshold)

"""Deterministic k-means (learned IVF cells)."""

from norsk_historisk_avis_ocr_spark.operators.kmeans import (
    ivf_cells_topk, kmeans_assign,
)


def _clustered(spark):
    # two well-separated 3D clusters
    a = [(i, [10.0 + 0.1 * i, 10.0, 10.0]) for i in range(5)]
    b = [(10 + i, [-10.0 - 0.1 * i, -10.0, -10.0]) for i in range(5)]
    return spark.createDataFrame(a + b, "vec_id long, embedding array<float>")


def test_kmeans_separates_clusters(spark):
    df = _clustered(spark)
    got = {r.vec_id: r.cell for r in kmeans_assign(df, k=2, iters=4).collect()}
    cluster_a = {got[i] for i in range(5)}
    cluster_b = {got[10 + i] for i in range(5)}
    assert len(cluster_a) == 1 and len(cluster_b) == 1
    assert cluster_a != cluster_b


def test_kmeans_deterministic(spark):
    df = _clustered(spark)
    a = sorted((r.vec_id, r.cell) for r in kmeans_assign(df, k=2, iters=3).collect())
    b = sorted((r.vec_id, r.cell) for r in kmeans_assign(df, k=2, iters=3).collect())
    assert a == b


def test_kmeans_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_assign(df, k=2, iters=2).count() == 0


def test_kmeans_null_embedding_does_not_eat_a_seed(spark):
    # vec 0 is NULL and among the k smallest ids: it must not shrink the
    # seed set (two clusters must still separate) nor receive a cell
    rows = [(0, None), (1, [0.0, 0.0]), (2, [0.1, 0.0]),
            (3, [10.0, 10.0]), (4, [10.1, 10.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cell for r in kmeans_assign(df, k=2, iters=3).collect()}
    assert 0 not in got
    assert got[1] == got[2] and got[3] == got[4] and got[1] != got[3]


def test_ivf_cells_topk_stays_in_cluster(spark):
    df = _clustered(spark)
    got = ivf_cells_topk(df, query_vec_id=0, k_cells=2, top_k=9).collect()
    ids = {r.vec_id for r in got}
    assert ids <= {1, 2, 3, 4}  # only same-cluster neighbors
    assert len(ids) == 4


def test_round_half_away_matches_sql_tie_semantics():
    """quantize= must round half-away-from-zero (DuckDB round()), not
    banker's: a centroid mean on an exact decimal tie would otherwise
    diverge cross-engine (ADVICE r3)."""
    from norsk_historisk_avis_ocr_spark.operators.kmeans import (
        _round_half_away,
    )
    assert _round_half_away(2.5, 0) == 3.0      # banker's would give 2
    assert _round_half_away(-2.5, 0) == -3.0
    assert _round_half_away(0.1234565, 6) == 0.123457 or \
        abs(0.1234565 * 1e6 - round(0.1234565 * 1e6)) > 1e-6
    assert _round_half_away(1.25, 1) == 1.3     # banker's would give 1.2
    assert _round_half_away(-1.25, 1) == -1.3
    assert _round_half_away(0.0, 3) == 0.0

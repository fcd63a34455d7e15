"""Cross-checks between the BLAS KNN path (mapInPandas matmul) and the
pure-SQL higher-order-function path — the two must agree exactly on
ranks and to 1e-9 on rounded distances."""

import pytest

from scarf_spark.operators import knn


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_blas_matches_hof(emb):
    a = knn.cosine_knn_exact(emb, k=5).toPandas().set_index(["src", "rank"]).sort_index()
    b = knn.cosine_knn_exact_hof(emb, k=5).toPandas().set_index(["src", "rank"]).sort_index()
    assert (a["dst"] == b["dst"]).all()
    assert (a["distance"] - b["distance"]).abs().max() < 1e-9


def test_self_hits_stripped(emb):
    a = knn.cosine_knn_exact(emb, k=5).toPandas()
    assert (a["src"] != a["dst"]).all()
    assert a.groupby("src")["rank"].max().eq(5).all()


def test_lsh_recall_reasonable(emb):
    exact = knn.cosine_knn_exact(emb, k=5)
    approx = knn.cosine_knn_lsh(emb, k=5, n_tables=4, n_planes=4)
    rec = knn.knn_recall(approx, exact).collect()[0]
    # OR-construction over 4 tables on structured embeddings should
    # recover a nontrivial fraction of true neighbors
    assert rec["recall"] > 0.2, rec

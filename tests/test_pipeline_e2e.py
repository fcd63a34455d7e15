"""End-to-end pipeline test — the reference chains its real pipeline
through session-scoped fixtures (filter → hvgs → graph → clustering →
umap → markers, ``scarf/tests/fixtures_datastore.py:57-217``). This is
the same DAG on the synthetic star schema, asserting shape/determinism
invariants at each stage (SURVEY.md §5 tier 1, with determinism checks
standing in for golden files on driver-generated data)."""

import pytest
from pyspark.sql import functions as F

from scarf_spark.catalog import DataStore
from scarf_spark.ml import hvg as hvg_mod
from scarf_spark.ml import reduction
from scarf_spark.ml.cluster import label_propagation
from scarf_spark.operators import filters, knn, markers, normalize, qc


@pytest.fixture(scope="module")
def ds(spark, sf_dir):
    return DataStore(spark, sf_dir)


@pytest.fixture(scope="module")
def n_cells(ds):
    return ds.counts().select("cell_id").distinct().count()


@pytest.fixture(scope="module")
def filtered_cells(ds):
    # QC → filter_cells: I-mask semantics, non-destructive
    cells = ds.cell_table().join(
        qc.cell_qc(ds.counts()), "cell_id", "left_outer"
    )
    flagged = filters.filter_cells(cells, F.col("n_counts") > 0)
    return flagged.where("I").select("cell_id")


@pytest.fixture(scope="module")
def hvgs(ds, n_cells):
    return hvg_mod.mark_hvgs_binned(ds.counts(), n_cells, n_bins=5, top_n=12)


@pytest.fixture(scope="module")
def reduced(ds, filtered_cells, hvgs, n_cells):
    feat_ids = [r["feat_id"] for r in hvgs.select("feat_id").collect()]
    normed = normalize.norm_lib_size(ds.counts(), sf=1000.0, log=True)
    sel = normed.join(filtered_cells, "cell_id", "left_semi")
    vec = reduction.assemble_vectors(sel, feat_ids, value_col="norm_value")
    z = reduction.zscore_vectors(vec)
    loadings, ev = reduction.pca_fit(z, k=4)
    assert ev == sorted(ev, reverse=True)
    return reduction.pca_transform(z, loadings)


@pytest.fixture(scope="module")
def graph(reduced):
    vec = reduced.select(
        "cell_id",
        F.array("pc1", "pc2", "pc3", "pc4").alias("embedding"),
    ).limit(400)
    edges = knn.cosine_knn_exact(vec, k=5, id_col="cell_id")
    return knn.smoothen_dists(edges, k=5)


def test_filter_keeps_only_valid(filtered_cells, n_cells):
    kept = filtered_cells.count()
    assert 0 < kept <= n_cells


def test_hvg_count_and_rank(hvgs):
    rows = hvgs.collect()
    assert len(rows) == 12
    assert sorted(r["hvg_rank"] for r in rows) == list(range(1, 13))


def test_reduction_shape(reduced):
    assert reduced.columns == ["cell_id", "pc1", "pc2", "pc3", "pc4"]
    assert reduced.count() > 0


def test_graph_degree_and_weights(graph):
    per = graph.groupBy("src").agg(
        F.count("*").alias("deg"), F.max("weight").alias("wmax")
    )
    rows = per.collect()
    assert all(r["deg"] <= 5 for r in rows)
    assert all(0 < r["wmax"] <= 1.0 for r in rows)


def test_clustering_and_markers_close_the_loop(ds, graph, n_cells):
    labels = label_propagation(
        graph.select("src", "dst"), n_iter=2
    ).withColumnRenamed("node", "cell_id")
    n_clusters = labels.select("cluster").distinct().count()
    assert 1 <= n_clusters <= labels.count()
    stats = markers.marker_stats(
        ds.counts().join(labels.select("cell_id"), "cell_id", "left_semi"),
        labels.select("cell_id", F.col("cluster").cast("string").alias("grp")),
        n_cells=labels.count(),
        group_col="grp",
    )
    row = stats.limit(1).collect()
    assert row and set(stats.columns) >= {
        "feat_id", "grp", "score", "mean", "fold_change", "u_stat", "z"
    }


def test_pipeline_is_deterministic(reduced):
    a = sorted(map(tuple, reduced.limit(50).collect()))
    b = sorted(map(tuple, reduced.limit(50).collect()))
    assert a == b

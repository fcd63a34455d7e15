"""Tier-a toy fixtures with hand-computed expected outputs, mirroring the
reference's 3-cell toy matrix tests (/root/reference/scarf/tests/
test_readers.py:4-37, test_datastore.py:7-24 — RNA 3×4 =
[[5,0,0,2],[3,3,0,7],[3,3,0,7]])."""

import math

import pytest
from pyspark.sql import functions as F

from scarf_spark.operators import filters, normalize, qc

# COO form of the reference's toy RNA matrix (zeros absent).
TOY = [
    (0, 0, 5.0), (0, 3, 2.0),
    (1, 0, 3.0), (1, 1, 3.0), (1, 3, 7.0),
    (2, 0, 3.0), (2, 1, 3.0), (2, 3, 7.0),
]
N_CELLS, N_FEATS = 3, 4


@pytest.fixture(scope="module")
def counts(spark):
    return spark.createDataFrame(TOY, ["cell_id", "feat_id", "value"]).cache()


def as_dict(df, k, v):
    return {r[k]: r[v] for r in df.collect()}


def test_ncounts(counts):
    assert as_dict(qc.ncounts_per_cell(counts), "cell_id", "n_counts") == {
        0: 7.0, 1: 13.0, 2: 13.0,
    }


def test_nfeatures(counts):
    assert as_dict(qc.nfeatures_per_cell(counts), "cell_id", "n_features") == {
        0: 2, 1: 3, 2: 3,
    }


def test_feat_ncells_dropouts(counts):
    out = {r["feat_id"]: (r["n_cells_expressed"], r["dropouts"], r["I"])
           for r in qc.feat_ncells(counts, n_cells=N_CELLS, min_cells=1).collect()}
    # feat 2 is all-zero → absent from COO entirely
    assert out == {0: (3, 0, True), 1: (2, 1, True), 3: (3, 0, True)}


def test_norm_lib_size(counts):
    out = {(r["cell_id"], r["feat_id"]): r["norm_value"]
           for r in normalize.norm_lib_size(counts, sf=1000.0).collect()}
    assert out[(0, 0)] == round(1000 * 5 / 7, 6)
    assert out[(1, 3)] == round(1000 * 7 / 13, 6)


def test_norm_clr_geo_mean_dense_semantics(counts):
    # geo mean for feat 1: values over ALL cells = [0, 3, 3]
    expected = math.exp((math.log1p(0) + math.log1p(3) + math.log1p(3)) / 3)
    out = as_dict(qc.clr_geo_mean(counts, n_cells=N_CELLS), "feat_id", "geo_mean")
    assert out[1] == round(expected, 6)


def test_tf_idf(counts):
    out = {(r["cell_id"], r["feat_id"]): r["norm_value"]
           for r in normalize.norm_tf_idf(counts, n_cells=N_CELLS).collect()}
    # cell 0, feat 0: tf = 5/7, idf = log2(1 + 3/(3+1))
    assert out[(0, 0)] == round((5 / 7) * math.log2(1 + 3 / 4), 6)


def test_filter_cells_and_semantics(spark):
    cells = spark.createDataFrame(
        [(0, True, 10.0), (1, True, 100.0), (2, False, 50.0)], ["cell_id", "I", "x"]
    )
    out = filters.filter_cells(cells, (F.col("x") > 20) & (F.col("x") < 200))
    flags = as_dict(out, "cell_id", "I")
    # cell 2 stays False even though the predicate passes — I never resurrects
    assert flags == {0: False, 1: True, 2: False}


def test_renormalize_zero_sum_divisor(spark):
    counts = spark.createDataFrame(
        [(0, 0, 5.0), (1, 1, 3.0)], ["cell_id", "feat_id", "value"]
    )
    sel = spark.createDataFrame([(0,)], ["feat_id"])
    out = normalize.renormalize_subset(counts, sel, sf=10.0).collect()
    assert {(r["cell_id"], r["feat_id"]): r["norm_value"] for r in out} == {(0, 0): 10.0}

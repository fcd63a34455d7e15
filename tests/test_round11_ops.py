"""Round-11 regression tests: the pipe_mapping end-to-end composition
(``mapping_datastore.py:31-364`` run_mapping), the exact-integer ACF
quotient, and the shared feature-KNN memo."""

import pytest
from pyspark.sql import functions as F


def test_pipe_mapping_contract(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.queries()["pipe_mapping"](spark, sf_dir)
    rows = out.collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_tgt = emb.where(F.col("vec_id") % 2 == 1).count()
    # one row per target (odd) cell
    assert len(rows) == n_tgt
    assert sorted(r["target_cell_id"] for r in rows) == sorted(
        r["vec_id"] for r in emb.where(F.col("vec_id") % 2 == 1).collect()
    )
    labels = {
        str(r["label"]) for r in emb.select("label").distinct().collect()
    }
    for r in rows:
        # nearest reference neighbor comes from the even (atlas) side
        assert r["nn_ref"] % 2 == 0
        assert r["pred_label"] == "NA" or r["pred_label"] in labels
        assert 0.0 <= r["share"] <= 1.0
        assert r["nn_distance"] >= 0.0
        assert r["nn_score"] >= 0.0


def test_pipe_mapping_alignment_pads_missing_dims(spark):
    # the alignment decision table: ref dims 1..8 vs target 1..6 →
    # 7 and 8 marked filled, the join shape of joins.align_features
    from scarf_spark.operators import joins

    ref_dims = spark.range(1, 9).select(
        F.col("id").alias("ids"), F.lit(0.0).alias("value")
    )
    tgt_dims = spark.range(1, 7).select(
        F.col("id").alias("ids"), F.lit(0.0).alias("value")
    )
    al = joins.align_features(ref_dims, tgt_dims, fill_value=1.0)
    got = {r["ids"]: r["t_value"] for r in al.collect()}
    assert got == {1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0, 5: 0.0, 6: 0.0, 7: 1.0, 8: 1.0}


def test_volume_acf_integer_quotient(spark):
    # lag-1 ACF of series y=[1,2,3] (daily volumes): centered-scaled
    # c_t = n*y_t - S with n=3, S=6 → c = [-3, 0, 3];
    # num(lag1) = (-3*0) + (0*3) = 0; den = 18 → acf_ppm = 0.
    # series [2,1,1,2]: n=4, S=6 → c = [2,-2,-2,2];
    # num(lag1) = -4 -4 + 4*(-1)... = (2*-2)+(-2*-2)+(-2*2) = -4+4-4 = -4
    # den = 16 → trunc(-4e6/16) = -250000 (toward zero, exact).
    from scarf_spark.operators import windows

    rows = []
    eid = 0
    for day, n in enumerate([2, 1, 1, 2]):
        for _ in range(n):
            rows.append((1, eid, day * 86400 + 10))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long"
    ).select(
        F.lit("a").alias("event_type"),
        F.timestamp_seconds("sec").alias("ts"),
    )
    got = {
        r["lag"]: (r["n_pairs"], r["acf_ppm"])
        for r in windows.volume_acf(ev, max_lag=2).collect()
    }
    assert got[1] == (3, -250000)
    # lag 2: c=[2,-2,-2,2] → (2*-2)+(-2*2) = -8 → trunc(-8e6/16) = -500000
    assert got[2] == (2, -500000)


def test_feat_knn_memo_shared(spark, sf_dir):
    import __spark_entry__ as entry

    e1 = entry._feat_knn_edges(spark, sf_dir)
    e2 = entry._feat_knn_edges(spark, sf_dir)
    assert e1 is e2  # mark_feat_knn and mark_feat_modules share one build

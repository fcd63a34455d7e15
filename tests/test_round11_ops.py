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


def test_leiden_micros_matches_core(spark):
    # integer-exact Leiden: the Spark wrapper must reproduce the pure
    # core on a planted two-blob graph, with cluster ids renumbered by
    # smallest member in first-member order
    from scarf_spark.ml.cluster import _leiden_micros_core, leiden_micros

    ew = {}
    import random

    rng = random.Random(11)
    for blob in range(3):
        base = blob * 10
        for i in range(10):
            for _ in range(4):
                j = rng.randrange(10)
                if i == j:
                    continue
                a, b = sorted((base + i, base + j))
                ew[(a, b)] = ew.get((a, b), 0) + rng.randrange(
                    500_000, 1_500_000
                )
    # sparse cross-blob noise
    ew[(3, 14)] = 120_000
    ew[(7, 25)] = 90_000
    edges = spark.createDataFrame(
        [(a, b, w) for (a, b), w in ew.items()], "a long, b long, w_micros long"
    )
    got = {
        (r["node"], r["cluster"])
        for r in leiden_micros(edges, sweeps=2, levels=3).collect()
    }
    labels = _leiden_micros_core(ew, sweeps=2, levels=3)
    mins = {}
    for n, c in labels.items():
        mins[c] = min(mins.get(c, n), n)
    order = {c: i for i, c in enumerate(sorted(set(mins.values())))}
    expect = {(n, order[mins[labels[n]]]) for n in labels}
    assert got == expect
    # the planted blobs must come out as the three communities
    by_cluster = {}
    for n, c in got:
        by_cluster.setdefault(c, set()).add(n)
    assert sorted(map(len, by_cluster.values())) == [10, 10, 10]


def test_leiden_micros_core_is_pure_integer(spark):
    # weights far past 2^53: python ints never round, so the argmax
    # ordering is exact where float modularity would tie incorrectly
    from scarf_spark.ml.cluster import _leiden_micros_core

    big = 2**60
    ew = {(1, 2): big, (2, 3): big + 1, (4, 5): big, (1, 4): 1}
    labels = _leiden_micros_core(ew, sweeps=2, levels=2)
    assert set(labels) == {1, 2, 3, 4, 5}
    # the heavy triangle side groups together, the (4,5) pair separately
    assert labels[1] == labels[2] == labels[3]
    assert labels[4] == labels[5]
    assert labels[1] != labels[4]


def _leiden_replay_sql():
    from __spark_entry__ import _LEIDEN_ST_CTE

    return (
        "WITH RECURSIVE ed AS MATERIALIZED (SELECT * FROM edt), "
        + _LEIDEN_ST_CTE
        + ", mins AS (SELECT lbl, MIN(node) AS mn FROM leiden_lab GROUP BY 1) "
        "SELECT l.node, CAST(DENSE_RANK() OVER (ORDER BY mins.mn) - 1 "
        "AS INT) AS cluster FROM leiden_lab l JOIN mins ON l.lbl = mins.lbl"
    )


def _leiden_expect(ew):
    from scarf_spark.ml.cluster import _leiden_micros_core

    labels = _leiden_micros_core(ew, sweeps=2, levels=3)
    mins = {}
    for n, c in labels.items():
        mins[c] = min(mins.get(c, n), n)
    order = {c: i for i, c in enumerate(sorted(set(mins.values())))}
    return sorted((n, order[mins[labels[n]]]) for n in labels)


def _leiden_replay_check(ew):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE edt (a BIGINT, b BIGINT, w BIGINT)")
    con.executemany(
        "INSERT INTO edt VALUES (?,?,?)", [(a, b, w) for (a, b), w in ew.items()]
    )
    got = sorted(
        (int(a), int(b)) for a, b in con.execute(_leiden_replay_sql()).fetchall()
    )
    assert got == _leiden_expect(ew)


def test_leiden_oracle_replay_matches_core_no_spark():
    # the generated _LEIDEN_ST_CTE list-state recursion must replay the
    # pure core verbatim on a graph that exercises moves, refinement
    # merges, and both level transitions — checked straight in DuckDB
    import random

    rng = random.Random(23)
    ew = {}
    for i in range(30):
        blob = i // 10
        for _ in range(4):
            j = rng.randrange(blob * 10, min(blob * 10 + 10, 30))
            if i == j:
                continue
            a, b = sorted((i, j))
            ew[(a, b)] = ew.get((a, b), 0) + rng.randrange(400_000, 1_600_000)
    ew[(5, 17)] = 150_000
    ew[(12, 28)] = 110_000
    _leiden_replay_check(ew)


def test_leiden_oracle_replay_edge_shapes():
    # the shapes most likely to expose replay drift: all-equal weights
    # (every argmax is a tie-break), disconnected components, and
    # non-contiguous billion-scale node ids
    _leiden_replay_check(
        {(a, b): 777_777 for a in range(8) for b in range(a + 1, 8)}
    )
    _leiden_replay_check(
        {(1, 2): 100, (2, 3): 120, (10, 11): 90, (20, 21): 80, (21, 22): 70}
    )
    _leiden_replay_check(
        {
            (10**9, 2 * 10**9): 700_000,
            (2 * 10**9, 3 * 10**9): 500_000,
            (10**9 + 5, 10**9): 900_000,
        }
    )


def test_leiden_replay_property_random_graphs():
    # property check over random multigraph shapes (hypothesis):
    # the generated SQL replay equals the pure core on EVERY input,
    # and the core itself is edge-insertion-order invariant
    from hypothesis import given, settings, strategies as st

    from scarf_spark.ml.cluster import _leiden_micros_core

    edge = st.tuples(
        st.integers(min_value=0, max_value=17),
        st.integers(min_value=0, max_value=17),
        st.integers(min_value=1, max_value=3_000_000),
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=40))
    def run(raw):
        ew = {}
        for a, b, w in raw:
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            ew[key] = ew.get(key, 0) + w
        if not ew:
            return
        # order invariance: reversed insertion gives identical labels
        rev = dict(reversed(list(ew.items())))
        assert _leiden_micros_core(ew) == _leiden_micros_core(rev)
        _leiden_replay_check(ew)

    run()


def test_kmeans_lloyd_partition_invariant(spark, sf_dir):
    # the Arrow-BLAS rounds accumulate partial sums in partition order;
    # the assignment margins must absorb that (the same claim the
    # cross-engine oracle green rests on) — identical clusters from a
    # 1-partition and a 17-partition layout of the same input
    from scarf_spark.ml.cluster import kmeans_lloyd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("v")
    )
    a = {
        (r["cell_id"], r["cluster"])
        for r in kmeans_lloyd(emb.repartition(1), k=4, n_iter=5).collect()
    }
    b = {
        (r["cell_id"], r["cluster"])
        for r in kmeans_lloyd(emb.repartition(17), k=4, n_iter=5).collect()
    }
    assert a == b


def test_interval_join_salt_invariant(spark):
    # the output salting (AQE can't see a pair-exploding join's output,
    # so the salt splits each bin's pair generation) must never change
    # the pair SET — any salt domain yields the naive join's pairs,
    # each exactly once
    from scarf_spark.operators import joins

    rows = [
        (i, "chr%d" % (i % 2), float((i * 37) % 200), float((i * 37) % 200 + 30))
        for i in range(60)
    ]
    qi = spark.createDataFrame(rows, "id long, chrom string, start double, end double")
    ri = spark.createDataFrame(
        [(i + 1000, c, s + 5.0, e + 5.0, 1.0) for i, c, s, e in rows],
        "id long, chrom string, start double, end double, value double",
    )
    naive = {
        (r["q_id"], r["r_id"])
        for r in joins.interval_overlap_join(qi, ri).collect()
    }
    for salt in (1, 3, 8):
        got = [
            (r["q_id"], r["r_id"])
            for r in joins.interval_overlap_join_binned(
                qi, ri, bin_size=64, salt=salt
            ).collect()
        ]
        assert len(got) == len(set(got))  # report-bin dedup holds per salt
        assert set(got) == naive


def test_dedup_prefix_memo_coherent(spark, sf_dir):
    # the memoized LSH-candidate / verified-Jaccard / components tables
    # must equal a fresh unmemoized build — the cache can only save
    # work, never change rows
    import __spark_entry__ as entry
    from scarf_spark.operators import dedup

    docs = entry._ds(spark, sf_dir).documents
    cand_fresh = {
        (r["a"], r["b"])
        for r in dedup.minhash_candidate_pairs(
            docs, n=3, n_hashes=8, n_bands=4
        ).collect()
    }
    cand_memo = {
        (r["a"], r["b"])
        for r in entry._dedup_candidates(spark, sf_dir).collect()
    }
    assert cand_memo == cand_fresh
    jac_fresh = {
        (r["a"], r["b"], r["jaccard"])
        for r in dedup.ngram_jaccard(
            docs,
            pairs=dedup.minhash_candidate_pairs(docs, n=3, n_hashes=8, n_bands=4),
            n=3,
            df_cap=100,
        ).collect()
    }
    jac_memo = {
        (r["a"], r["b"], r["jaccard"])
        for r in entry._dedup_jac(spark, sf_dir).collect()
    }
    assert jac_memo == jac_fresh
    comp_memo = entry._verified_dedup_comp(spark, sf_dir)
    edges = [
        (a, b) for a, b, j in jac_fresh if j >= 0.5
    ]
    comp_fresh = dedup.min_label_components(
        spark.createDataFrame(edges or [(0, 0)], "a long, b long").where(
            F.lit(bool(edges))
        ),
        docs,
        n_iter=3,
    )
    assert {
        (r["doc_id"], r["cluster"], r["keep"]) for r in comp_memo.collect()
    } == {(r["doc_id"], r["cluster"], r["keep"]) for r in comp_fresh.collect()}
